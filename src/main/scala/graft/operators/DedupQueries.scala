package graft.operators

import org.apache.spark.sql.functions._

import graft.core.Caching.persistOnce
import graft.core.Tables.load
import graft.functions.DedupFunctions._
import graft.functions.TextFunctions._

/** Deduplication surface over `documents` (north_star): exact,
  * MinHash+LSH, SimHash, n-gram Jaccard. */
object DedupQueries {

  // Session-scoped memo (same pattern as PipelineQueries.tokenizedDocs):
  // the pairs frame is shared by the pairs query and the cluster-election
  // query, and Verify/Bench invoke both repeatedly — a per-invocation
  // persist() would pin a new dead cache entry each time. SessionMemo
  // evicts entries when the owning session's context stops.
  private val md5Pairs =
    new graft.core.SessionMemo[String, org.apache.spark.sql.DataFrame]

  /** Predicate selecting the docs that get planted copies — replicated
    * verbatim in the DuckDB oracles (tokens == split-on-space, so the
    * token-count guard is `len(string_split(text, ' ')) >= 5`; ≥5
    * tokens guarantees a non-empty 3-shingle set on both copies). */
  private val plantedPredicate =
    "doc_id % 25 = 0 AND len(string_split(text, ' ')) >= 5"

  /** Offset for planted-copy ids, derived from the corpus itself so
    * planted ids can NEVER collide with real ones at any scale factor
    * (a fixed +9000 silently collides once real doc_ids reach 9000):
    * the next-plus-one multiple of 1000 above max(doc_id).
    * [[plantOffsetSql]] is the same expression for the DuckDB side.
    * Memoized per (session, dir) — the max(doc_id) probe is one tiny
    * stats-only scan, but several queries (and both passes of the
    * bench) would otherwise repeat it inside their timing windows. */
  private val offsets = new graft.core.SessionMemo[String, Long]
  private def plantOffset(s: org.apache.spark.sql.SparkSession, d: String): Long =
    offsets.getOrElseUpdate(s, d) {
      val maxId = load(s, d, "documents")
        .agg(coalesce(max(col("doc_id")), lit(0L))).head().getLong(0)
      (maxId / 1000 + 2) * 1000
    }

  private val plantOffsetSql =
    "((SELECT max(doc_id) FROM documents) // 1000 + 2) * 1000"

  /** Documents plus an exact copy of every 25th doc at doc_id+offset.
    * Identical text ⇒ identical shingle set ⇒ identical MinHash/SimHash
    * signature ⇒ identical band/block keys, so every (source, copy)
    * pair MUST surface from the candidate joins — a recovery set DuckDB
    * derives from `documents` alone, which makes the xxhash64-family
    * dedup queries oracle-checkable end-to-end. */
  private def plantedDocs(s: org.apache.spark.sql.SparkSession,
                          d: String): org.apache.spark.sql.DataFrame = {
    val base = load(s, d, "documents").select(col("doc_id"), col("text"))
    base.unionByName(
      base.filter(col("doc_id") % 25 === 0 && size(tokens(col("text"))) >= 5)
        .select((col("doc_id") + lit(plantOffset(s, d))).as("doc_id"), col("text")))
  }

  /** THE md5-family banding scheme (8 seeded MinHash mins → 4 two-hash
    * band keys) over a `(doc_id, sh)` frame — one definition shared by
    * every query that bands with it ([[md5MinhashPairs]] and the
    * blocking-quality audit), so scheme changes can't silently diverge
    * between the pipeline and its own evaluation. */
  private[operators] def md5BandKeys(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"),
      array((0 until 8).map(seed =>
        array_min(transform(col("sh"), x => md5(concat(lit(s"$seed|"), x))))): _*)
        .as("sig"))
      .select(col("doc_id"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            concat(element_at(col("sig"), 2 * b + 1),
              element_at(col("sig"), 2 * b + 2)).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))

  /** DuckDB CTEs `sig` + `bands` replaying [[md5BandKeys]] over CTE
    * `src(doc_id, <shCol>)` — the oracle half of the shared scheme. */
  private def md5BandsSql(src: String, shCol: String): String = {
    val mins = (0 until 8).map(i =>
      s"    list_min(list_transform($shCol, x -> md5('$i|' || x)))")
      .mkString(",\n|")
    s"""sig AS (
       |  SELECT doc_id, [
       |$mins] AS sig
       |  FROM $src WHERE len($shCol) > 0),
       |bands AS (
       |  SELECT doc_id, b, sig[2*b+1] || sig[2*b+2] AS key
       |  FROM sig, (SELECT unnest(range(4)) AS b))""".stripMargin
  }

  /** Deterministic (md5-family) MinHash-LSH candidate pairs on a doc
    * slice — shared by the pairs query and the cluster-election query,
    * and replicated verbatim in DuckDB via [[md5MinhashPairsSql]]. */
  private def md5MinhashPairs(s: org.apache.spark.sql.SparkSession,
                              d: String): org.apache.spark.sql.DataFrame =
    md5Pairs.getOrElseUpdate(s, d) {
      val docs = load(s, d, "documents").filter(col("doc_id") < 150)
        .select(col("doc_id"), array_distinct(wordShingles(col("text"), 3)).as("sh"))
        .filter(size(col("sh")) > 0)
      val bands = md5BandKeys(docs).persist()
      val pairs = bands.as("l").join(bands.as("r"),
          col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
            col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
        .distinct()
        .persist()
      pairs.count() // materialize, then release the intermediate bands
      bands.unpersist()
      pairs
    } match { // re-assert persistence on memo hits (clearCache healing);
      // MUST materialize when the persist actually fires — estimated
      // stats on the healed entry flip the CC join broadcast→SMJ
      // depending on suite order (round-11 X195 failure)
      case df => graft.core.Caching.persistMaterialized(df)
    }

  /** DuckDB CTE chain producing the same `pairs(a, b)` relation. */
  private val md5MinhashPairsSql: String =
    s"""sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
      |    i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS s
      |  FROM documents WHERE doc_id < 150),
      |${md5BandsSql("sh", "s")},
      |pairs AS (
      |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      |  FROM bands l JOIN bands r
      |    ON l.b = r.b AND l.key = r.key AND l.doc_id < r.doc_id)""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("dedup_exact_groups",
      (s, d) => exactDupGroups(load(s, d, "documents"), "doc_id", "text"),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
             |count(*) AS n_copies
             |FROM documents GROUP BY 1""".stripMargin),
      "exact dedup = hash-groupBy; shuffle keyed by content hash"),

    // Small-n brute-force Jaccard (oracle-checkable); the LSH variant
    // below is the scale path. The corpus slice gets PLANTED near-
    // duplicates (every 5th doc re-appears at doc_id+offset with its
    // last two tokens dropped — a prefix copy, so its shingle set is a
    // subset of the source's and the pair's Jaccard is (t-4)/(t-2)-ish,
    // well above the 0.5 threshold): on random testdata no natural pair
    // crosses the threshold, so without planting both engines find
    // nothing and the compare is vacuous. Both sides brute-force the
    // same planted corpus, so every value — including the Jaccard
    // doubles, exact int/int divisions — is hash-checked.
    Q("dedup_jaccard_pairs",
      (s, d) => {
        val base = load(s, d, "documents").filter(col("doc_id") < 40)
          .select(col("doc_id"), col("text"))
        val w = tokens(col("text"))
        val planted = base
          .filter(col("doc_id") % 5 === 0 && size(w) >= 10)
          .select((col("doc_id") + lit(plantOffset(s, d))).as("doc_id"),
            array_join(slice(w, lit(1), size(w) - 2), " ").as("text"))
        val docs = base.unionByName(planted)
          .select(col("doc_id"), array_distinct(wordShingles(col("text"), 3)).as("sh"))
        docs.as("l").join(docs.as("r"), col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
            (size(array_intersect(col("l.sh"), col("r.sh"))).cast("double") /
              size(array_union(col("l.sh"), col("r.sh")))).as("jaccard"))
          .filter(col("jaccard") > 0.5)
      },
      Some(s"""WITH base AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id < 40),
             |corpus AS (
             |  SELECT doc_id, text FROM base
             |  UNION ALL
             |  SELECT doc_id + $plantOffsetSql, array_to_string(
             |    string_split(text, ' ')[1:len(string_split(text, ' ')) - 2], ' ')
             |  FROM base
             |  WHERE doc_id % 5 = 0 AND len(string_split(text, ' ')) >= 10),
             |sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
             |    i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS s
             |  FROM corpus)
             |SELECT l.doc_id AS a, r.doc_id AS b,
             |  CAST(len(list_filter(l.s, x -> list_contains(r.s, x))) AS DOUBLE)
             |    / len(list_distinct(list_concat(l.s, r.s))) AS jaccard
             |FROM sh l, sh r
             |WHERE l.doc_id < r.doc_id
             |  AND CAST(len(list_filter(l.s, x -> list_contains(r.s, x))) AS DOUBLE)
             |    / len(list_distinct(list_concat(l.s, r.s))) > 0.5""".stripMargin),
      "n-gram Jaccard near-dups, brute-force slice with planted " +
        "prefix-copies (values hash-checked, non-vacuous)"),

    // Asymmetric near-dup: CONTAINMENT |A∩B|/|A| catches a document
    // embedded inside a larger one — the quote/excerpt/concatenation
    // case Jaccard structurally misses (a 9-token fragment of a
    // 60-token doc has Jaccard ≈ 0.12 but containment 1.0). Planted
    // fragments (9 mid-document tokens of every 7th doc, ids from
    // max(doc_id)) make the compare non-vacuous. Candidates come from
    // PREFIX FILTERING (the PPJoin family), not an all-pairs join: for
    // containment > 0.9 a fragment has |A\B| < 0.1|A| shingles missing
    // from any true container, so probing the corpus inverted index
    // with the fragment's floor(|A|/10)+1 globally-RAREST shingles
    // (rank by document frequency, shingle text as tie-break) is
    // guaranteed to hit every container — recall is EXACT, which is
    // why the DuckDB oracle replays the identical candidate pipeline
    // and every emitted value hash-checks. All stages are equi-joins
    // (shingle DF rollup, per-doc rank window, prefix⋈index probe,
    // candidate confirm) — candidates ∝ Σ prefix-shingle DF, never n².
    Q("dedup_containment_pairs",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = load(s, d, "documents").select(col("doc_id"), col("text"))
        val w = tokens(col("text"))
        val planted = base
          .filter(col("doc_id") % 7 === 0 && size(w) >= 15)
          .select((col("doc_id") + lit(plantOffset(s, d))).as("doc_id"),
            array_join(slice(w, lit(4), lit(9)), " ").as("text"))
        val docs = base.unionByName(planted)
          .select(col("doc_id"),
            array_distinct(wordShingles(col("text"), 3)).as("sh"))
          .filter(size(col("sh")) > 0)
        // inverted index: one row per (doc, shingle); shingles are
        // already distinct per doc, so count(*) per shingle = its DF
        val ex = docs.select(col("doc_id"), size(col("sh")).as("n_sh"),
          explode(col("sh")).as("shingle"))
        val dfreq = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
        // EVERY (doc, shingle) entry ranked by the global (df, shingle)
        // order — the same window the prefix already needed, so the
        // container-side positions below are free
        val ranked = ex.join(dfreq, "shingle")
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("doc_id"))
              .orderBy(col("df"), col("shingle"))))
          .select(col("doc_id"), col("n_sh"), col("shingle"), col("rk"))
        // p = n DIV 10 + 1 rarest shingles (integer arithmetic — exact
        // floor(0.1n), bitwise-identical across engines)
        val prefix = ranked.filter(col("rk") <= expr("n_sh DIV 10") + 1)
        // PPJoin POSITIONAL filter (round 13 — the sf1 density-stress
        // fix): both docs' shingle lists sit in the SAME global (df,
        // shingle) order, so a match at positions (i, j) bounds the
        // whole overlap by min(i, j) + min(n_f − i, n_c − j) — at most
        // min(i, j) common shingles can precede the match and at most
        // min of the remainders can follow it. Containment > 0.9
        // needs overlap·10 > 9·n_f; any candidate whose bound can't
        // reach that is dead before the confirm join. Recall stays
        // EXACT: the bound is an upper bound on the true overlap, so
        // every true pair passes it on every one of its matches —
        // ∀-pass, ∃-keep, nothing true is dropped. Integer arithmetic
        // throughout; the oracle replays the identical predicate.
        val cand = prefix.as("l").join(ranked.as("r"),
            col("l.shingle") === col("r.shingle") &&
              col("l.doc_id") =!= col("r.doc_id") &&
              col("l.n_sh") < col("r.n_sh") &&
              (least(col("l.rk"), col("r.rk")) +
                least(col("l.n_sh") - col("l.rk"),
                  col("r.n_sh") - col("r.rk"))) * 10 >
                col("l.n_sh") * 9)
          .select(col("l.doc_id").as("fragment"),
            col("r.doc_id").as("container"))
          .distinct()
        // exact containment, computed ONLY on candidate pairs
        cand
          .join(docs.select(col("doc_id").as("fragment"), col("sh").as("fsh")),
            "fragment")
          .join(docs.select(col("doc_id").as("container"), col("sh").as("csh")),
            "container")
          .select(col("fragment"), col("container"),
            (size(array_intersect(col("fsh"), col("csh"))).cast("double") /
              size(col("fsh"))).as("containment"))
          .filter(col("containment") > 0.9)
      },
      Some(s"""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + $plantOffsetSql, array_to_string(
             |    string_split(text, ' ')[4:12], ' ')
             |  FROM documents
             |  WHERE doc_id % 7 = 0 AND len(string_split(text, ' ')) >= 15),
             |sh AS (
             |  SELECT * FROM (
             |    SELECT doc_id, list_distinct(list_transform(
             |      range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
             |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS s
             |    FROM corpus) WHERE len(s) > 0),
             |ex AS (
             |  SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh),
             |dfreq AS (
             |  SELECT shingle, count(*) AS df FROM ex GROUP BY shingle),
             |ranked AS (
             |  SELECT e.doc_id, e.n_sh, e.shingle,
             |    row_number() OVER (PARTITION BY e.doc_id
             |      ORDER BY d.df, e.shingle) AS rk
             |  FROM ex e JOIN dfreq d ON e.shingle = d.shingle),
             |prefix AS (
             |  SELECT doc_id, n_sh, shingle, rk FROM ranked
             |  WHERE rk <= n_sh // 10 + 1),
             |cand AS (
             |  SELECT DISTINCT l.doc_id AS fragment, r.doc_id AS container
             |  FROM prefix l JOIN ranked r ON l.shingle = r.shingle
             |  WHERE l.doc_id != r.doc_id AND l.n_sh < r.n_sh
             |    AND (least(l.rk, r.rk)
             |      + least(l.n_sh - l.rk, r.n_sh - r.rk)) * 10
             |      > l.n_sh * 9)
             |SELECT fragment, container, containment FROM (
             |  SELECT c.fragment, c.container,
             |    CAST(len(list_filter(f.s, x -> list_contains(g.s, x))) AS DOUBLE)
             |      / len(f.s) AS containment
             |  FROM cand c JOIN sh f ON c.fragment = f.doc_id
             |  JOIN sh g ON c.container = g.doc_id)
             |WHERE containment > 0.9""".stripMargin),
      "asymmetric containment dedup over the FULL corpus: prefix-filter " +
        "candidates (rarest-shingle probes, exact recall at t>0.9) + " +
        "PPJoin positional overlap bound + confirm on candidates only; " +
        "whole pipeline value-checked"),

    // Winnowing fingerprint selection (Schleimer-Wilkerson-Aiken,
    // SIGMOD 2003 — the MOSS plagiarism-detection algorithm): hash
    // every k=5 word-shingle, slide a w=4 window over the hash
    // sequence, keep each window's RIGHTMOST MINIMUM. The selected set
    // is ~2/(w+1) of all shingles yet GUARANTEES a shared fingerprint
    // for any common token run of length ≥ w+k−1 = 8 — the
    // density/guarantee trade-off no fixed-stride sampling offers.
    // Rightmost-min selection is ONE window min over a packed
    // (hash, −pos) long (min hash, ties to the larger position —
    // integer arithmetic, no struct ordering, stays hash-aggregable);
    // matching is an equi-join on the selected hash with a document-
    // frequency cap (df ≤ 32 — the MOSS "ignore overly common" rule)
    // bounding candidate pairs by Σ min(df,32)², never n². Planted
    // 12-token fragments (every 6th doc) exercise the guarantee at
    // every SF; the oracle replays selection, cap and join exactly.
    Q("dedup_winnow_matches",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = load(s, d, "documents").select(col("doc_id"), col("text"))
        val w = tokens(col("text"))
        val planted = base
          .filter(col("doc_id") % 6 === 0 && size(w) >= 20)
          .select((col("doc_id") + lit(plantOffset(s, d))).as("doc_id"),
            array_join(slice(w, lit(5), lit(12)), " ").as("text"))
        val fp = winnowedFingerprints(base.unionByName(planted),
          "doc_id", "text", k = 5, w = 4)
        val kept = persistOnce(fp.withColumn("df",
            count(lit(1)).over(Window.partitionBy(col("h"))))
          .filter(col("df") <= 32))
        kept.as("l").join(kept.as("r"),
            col("l.h") === col("r.h") && col("l.doc_id") < col("r.doc_id"))
          .groupBy(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
          .agg(count(lit(1)).as("n_shared"))
      },
      Some(s"""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + $plantOffsetSql, array_to_string(
             |    string_split(text, ' ')[5:16], ' ')
             |  FROM documents
             |  WHERE doc_id % 6 = 0 AND len(string_split(text, ' ')) >= 20),
             |tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
             |sh AS (
             |  SELECT doc_id,
             |    unnest(range(1, greatest(len(tk) - 4, 0) + 1)) AS pos,
             |    unnest(list_transform(range(1, greatest(len(tk) - 4, 0) + 1),
             |      i -> array_to_string(tk[i:i+4], ' '))) AS g
             |  FROM tk),
             |pk AS (
             |  SELECT doc_id, pos,
             |    CAST(CAST(concat('0x', substr(md5(g), 1, 10)) AS UBIGINT)
             |      AS BIGINT) * 8388608
             |      + (8388607 - least(pos, 8388607)) AS packed
             |  FROM sh),
             |sel AS (
             |  SELECT doc_id, pos,
             |    min(packed) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS s
             |  FROM pk),
             |fp AS (
             |  SELECT DISTINCT doc_id, s // 8388608 AS h
             |  FROM sel WHERE pos >= 4),
             |kept AS (
             |  SELECT doc_id, h FROM (
             |    SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS df
             |    FROM fp) WHERE df <= 32)
             |SELECT l.doc_id AS a, r.doc_id AS b,
             |  CAST(count(*) AS BIGINT) AS n_shared
             |FROM kept l JOIN kept r ON l.h = r.h AND l.doc_id < r.doc_id
             |GROUP BY 1, 2""".stripMargin),
      "winnowing (MOSS) fingerprints: rightmost-window-min selection " +
        "via one packed-long window min, df-capped fingerprint " +
        "equi-join — guaranteed detection of ≥8-token overlaps at " +
        "~2/(w+1) index density"),

    // LSH parameter planner — the tuning step BEFORE any banding run:
    // for a 64-hash budget, every (bands, rows) split has collision
    // probability p(s) = 1 − (1 − s^r)^b (the S-curve); the planner
    // scores each config's false-positive area below the target
    // threshold t₀ = 0.7 and false-negative area above it on a 19-point
    // similarity grid and flags the minimizer — the (b, r) the
    // dedup_minhash_lsh_pairs family should run with. Pure math over a
    // 7×19 literal grid (no data scan at all — the planner is O(1) in
    // corpus size); pow chains are identical IEEE in both engines and
    // the 19-term area sums round at 6 dp (float-kernel rule), so
    // even the chosen flag's tie behavior matches.
    Q("dedup_lsh_planner",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val configs = (0 to 6).map(i => (64 >> i, 1 << i))
        val cfg = s.createDataFrame(configs).toDF("b", "r")
        val scored = cfg
          .select(col("b"), col("r"),
            explode(sequence(lit(1), lit(19))).as("i"))
          .select(col("b"), col("r"),
            (col("i").cast("double") / 20.0).as("sv"))
          .withColumn("p",
            lit(1.0) - pow(lit(1.0) -
              pow(col("sv"), col("r").cast("double")),
              col("b").cast("double")))
          .groupBy(col("b"), col("r"))
          .agg(
            round(sum(when(col("sv") < 0.7, col("p") * 0.05)
              .otherwise(0.0)), 6).as("fp_area"),
            round(sum(when(col("sv") >= 0.7,
              (lit(1.0) - col("p")) * 0.05).otherwise(0.0)), 6)
              .as("fn_area"))
          .withColumn("total", col("fp_area") + col("fn_area"))
        scored.withColumn("chosen",
          row_number().over(Window.orderBy(col("total"), col("b"))) === 1)
      },
      Some("""WITH cfg AS (
             |  SELECT * FROM (VALUES (64, 1), (32, 2), (16, 4), (8, 8),
             |    (4, 16), (2, 32), (1, 64)) t(b, r)),
             |grid AS (
             |  SELECT b, r, CAST(i AS DOUBLE) / 20.0 AS sv
             |  FROM cfg CROSS JOIN (SELECT unnest(range(1, 20)) AS i) g),
             |scored AS (
             |  SELECT b, r, sv,
             |    1.0 - pow(1.0 - pow(sv, CAST(r AS DOUBLE)),
             |      CAST(b AS DOUBLE)) AS p
             |  FROM grid),
             |areas AS (
             |  SELECT CAST(b AS INTEGER) AS b, CAST(r AS INTEGER) AS r,
             |    round(sum(CASE WHEN sv < 0.7 THEN p * 0.05
             |      ELSE 0.0 END), 6) AS fp_area,
             |    round(sum(CASE WHEN sv >= 0.7 THEN (1.0 - p) * 0.05
             |      ELSE 0.0 END), 6) AS fn_area
             |  FROM scored GROUP BY 1, 2)
             |SELECT b, r, fp_area, fn_area,
             |  fp_area + fn_area AS total,
             |  row_number() OVER (ORDER BY fp_area + fn_area, b) = 1
             |    AS chosen
             |FROM areas""".stripMargin),
      "LSH (bands, rows) planner for a 64-hash budget: S-curve FP/FN " +
        "areas against the 0.7 target on a literal grid — O(1) in " +
        "corpus size, the tuning input of the banding dedup family"),

    // Cluster election: candidate pairs -> connected components ->
    // canonical doc (min id in component) — the step that turns pair
    // lists into an actual dedup decision. Spark runs the ITERATIVE
    // hash-to-min propagation (one join+agg per round — the shape that
    // survives arbitrary pair graphs at 100 TB); the oracle computes
    // true reachability with a recursive CTE over the same
    // (deterministic, md5-based) pair set, so the fixpoint itself is
    // hash-checked.
    Q("dedup_cluster_election",
      (s, d) => connectedComponents(md5MinhashPairs(s, d))
        .select(col("node"), col("component")),
      Some(s"""WITH RECURSIVE $md5MinhashPairsSql,
             |edges AS (SELECT a AS src, b AS dst FROM pairs
             |          UNION SELECT b AS src, a AS dst FROM pairs),
             |reach AS (
             |  SELECT src AS node, src AS root FROM edges
             |  UNION
             |  SELECT e.dst AS node, r.root FROM reach r
             |  JOIN edges e ON e.src = r.node)
             |SELECT node, min(root) AS component FROM reach GROUP BY node""".stripMargin),
      "near-dup cluster election: iterative hash-to-min CC vs recursive-CTE oracle"),

    // The dedup DECISION applied: pairs -> components -> canonical
    // representative (min id) -> corpus with non-canonical copies
    // REMOVED. This is the step every pipeline actually ships — the
    // kept corpus, not a pair list. The drop set is O(duplicates) and
    // joins back anti on doc_id (broadcastable at any scale: dup count
    // << corpus); the oracle replays pairs + true reachability + the
    // same anti-join, so the kept set is value-checked end-to-end.
    Q("dedup_apply",
      (s, d) => {
        val cc = connectedComponents(md5MinhashPairs(s, d))
        val drop = cc.filter(col("node") =!= col("component"))
          .select(col("node").as("doc_id"))
        load(s, d, "documents").filter(col("doc_id") < 150)
          .join(drop, Seq("doc_id"), "left_anti")
          .select(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $md5MinhashPairsSql,
             |edges AS (SELECT a AS src, b AS dst FROM pairs
             |          UNION SELECT b AS src, a AS dst FROM pairs),
             |reach AS (
             |  SELECT src AS node, src AS root FROM edges
             |  UNION
             |  SELECT e.dst AS node, r.root FROM reach r
             |  JOIN edges e ON e.src = r.node),
             |cc AS (SELECT node, min(root) AS component FROM reach GROUP BY node)
             |SELECT doc_id FROM documents
             |WHERE doc_id < 150
             |  AND doc_id NOT IN (SELECT node FROM cc WHERE node != component)"""
        .stripMargin),
      "dedup applied: kept corpus after electing one canonical doc per " +
        "near-dup component — the anti-join every pipeline ships"),

    // The LSH algorithm itself, oracle-checked end-to-end: md5 (shared
    // by Spark and DuckDB) replaces xxhash64, minhash = lexicographic
    // min over hex digests, band key = concat of the band's minhashes.
    // k=8/bands=4 on a doc slice — the xxhash64 variant below stays the
    // scale path (one 64-bit hash vs an md5 per shingle per seed).
    Q("dedup_minhash_md5_pairs",
      (s, d) => md5MinhashPairs(s, d),
      Some(s"""WITH $md5MinhashPairsSql
             |SELECT a, b FROM pairs""".stripMargin),
      "MinHash+LSH with md5 hash family — algorithm oracle-checked in DuckDB"),

    // MinHash/SimHash signatures use Spark's xxhash64 — the VALUES are
    // not replicable in DuckDB (md5 is the only shared hash family; the
    // md5 variant above value-checks the algorithm). These queries are
    // instead oracled via PLANTED duplicates: copies of selected docs at
    // doc_id+offset share the source's shingle set exactly, so their
    // signatures/band keys/block keys are identical and the pipeline
    // MUST emit every (source, copy) pair — a set DuckDB derives from
    // `documents` alone. A broken hash/band/block/join stage drops
    // planted pairs and fails the compare.
    Q("dedup_minhash_lsh_pairs",
      (s, d) => {
        // tokens pre-projected: shingling over the column is O(n)/doc
        // (an inline tokens(text) re-tokenizes inside the lambda)
        val docs = plantedDocs(s, d)
          .select(col("doc_id"), tokens(col("text")).as("w"))
          .select(col("doc_id"),
            array_distinct(wordShinglesFromTokens(col("w"), 3)).as("sh"))
          .filter(size(col("sh")) > 0)
        lshCandidatePairs(docs, "doc_id", "sh")
          .filter(col("b") === col("a") + lit(plantOffset(s, d))) // planted-recovery slice
      },
      Some(s"""SELECT doc_id AS a, doc_id + $plantOffsetSql AS b
             |FROM documents WHERE $plantedPredicate""".stripMargin),
      "MinHash+LSH near-dup candidates (shingle→minhash→band→bucket-" +
        "join), planted-duplicate recovery oracle-checked"),

    Q("dedup_simhash_signatures",
      (s, d) => {
        val sigs = plantedDocs(s, d)
          .select(col("doc_id"), col("text"), tokens(col("text")).as("w"))
          .select(col("doc_id"), col("text"),
            array_distinct(wordShinglesFromTokens(col("w"), 3)).as("sh"))
          .filter(size(col("sh")) > 0)
          .select(col("doc_id"), col("text"), simhash(col("sh")).as("sig"))
        // Property summary the oracle can derive from `documents`:
        // exact doc/text counts, plus two signature invariants — equal
        // texts (the planted copies) must map to ONE signature each
        // (distinct (text) == distinct (text, sig)), and signatures
        // must not be degenerate (collisions across the ~500 distinct
        // texts are possible for 64-bit simhash but an all-constant or
        // near-constant signature column is a bug).
        sigs.agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("text")).as("n_texts"),
          (countDistinct(struct(col("text"), col("sig"))) ===
            countDistinct(col("text"))).as("dup_groups_one_sig"),
          (countDistinct(col("sig")).cast("double") >=
            countDistinct(col("text")) * 0.5).as("sig_diversity_ok"))
      },
      Some(s"""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + $plantOffsetSql, text FROM documents
             |  WHERE $plantedPredicate)
             |SELECT count(*) AS n_docs, count(DISTINCT text) AS n_texts,
             |  TRUE AS dup_groups_one_sig, TRUE AS sig_diversity_ok
             |FROM corpus WHERE len(string_split(text, ' ')) >= 3""".stripMargin),
      "64-bit SimHash signatures, per-row single-pass fold (no shuffle); " +
        "property-oracled: planted copies sign identically, non-degenerate"),

    Q("dedup_simhash_near_pairs",
      (s, d) => {
        // Candidate generation blocks on EACH of the four 16-bit
        // signature blocks (pigeonhole: hamming <= 3 pairs must agree on
        // one whole block — guaranteed recall there, probabilistic
        // above), then verifies hamming on candidates. Never all-pairs:
        // the join is keyed by (block, bits), cost ∝ collisions.
        val sigs = graft.core.Caching.persistOnce(simhashSignatures(
          plantedDocs(s, d)
            .select(col("doc_id"), tokens(col("text")).as("w"))
            .select(col("doc_id"),
              array_distinct(wordShinglesFromTokens(col("w"), 3)).as("sh")),
          "doc_id", "sh")) // both self-join sides reuse one signature pass
        val keys = sigs.select(col("doc_id"), col("sig"),
          explode(simhashBlockKeys(col("sig"), 4)).as("bk"))
        keys.as("l").join(keys.as("r"),
            col("l.bk") === col("r.bk") && col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
            hamming64(col("l.sig"), col("r.sig")).cast("long").as("hamming"))
          .filter(col("hamming") <= 12)
          .distinct() // a pair may collide in several blocks
          .filter(col("b") === col("a") + lit(plantOffset(s, d))) // planted-recovery slice
      },
      Some(s"""SELECT doc_id AS a, doc_id + $plantOffsetSql AS b, CAST(0 AS BIGINT) AS hamming
             |FROM documents WHERE $plantedPredicate""".stripMargin),
      "SimHash near-dups: 4x16-bit block join (guaranteed recall for " +
        "hamming<=3) + hamming verify; planted-duplicate recovery oracle-checked"),

    // Fuzzy eval-set decontamination — the NEAR-duplicate sibling of
    // dedup_decontaminate (which needs an exact shared n-gram): a
    // benchmark document that was lightly edited before entering the
    // training corpus still leaks. Pipeline: shingle both corpora →
    // md5-family MinHash signatures → band keys → train⋈eval band
    // equi-join (the eval side is a broadcast — benchmark suites are
    // small by construction; the corpus is NEVER self-joined) →
    // candidate (train, eval) pairs → exact-Jaccard confirm ≥ 0.5 over
    // the candidates only. The md5 hash family is shared with DuckDB,
    // so the ENTIRE pipeline — candidate generation included — replays
    // verbatim in the oracle: every emitted value is hash-checked, not
    // just a planted-recovery slice. The eval set is planted prefix
    // copies (last two tokens dropped) of every 25th doc, so the
    // result is non-vacuous at every scale factor; Jaccard doubles are
    // exact int/int divisions (bitwise identical across engines).
    Q("dedup_fuzzy_decontaminate",
      (s, d) => {
        val base = load(s, d, "documents").select(col("doc_id"), col("text"))
        val w = tokens(col("text"))
        val evalDocs = base.filter(col("doc_id") % 25 === 0 && size(w) >= 10)
          .select((col("doc_id") + lit(plantOffset(s, d))).as("eval_id"),
            array_join(slice(w, lit(1), size(w) - 2), " ").as("text"))
        def shingled(df: org.apache.spark.sql.DataFrame, idCol: String) = df
          .select(col(idCol), array_distinct(wordShingles(col("text"), 3)).as("sh"))
          .filter(size(col("sh")) > 0)
        def banded(df: org.apache.spark.sql.DataFrame, idCol: String) = {
          val sigs = df.select(col(idCol),
            array((0 until 8).map(seed =>
              array_min(transform(col("sh"), x => md5(concat(lit(s"$seed|"), x))))): _*)
              .as("sig"))
          sigs.select(col(idCol),
            explode(array((0 until 4).map(b =>
              struct(lit(b).as("band"),
                concat(element_at(col("sig"), 2 * b + 1),
                  element_at(col("sig"), 2 * b + 2)).as("key"))): _*)).as("bk"))
            .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
        }
        val trainSh = shingled(base, "doc_id")
        val evalSh = shingled(evalDocs, "eval_id")
        val cand = banded(trainSh, "doc_id")
          .join(broadcast(banded(evalSh, "eval_id")), Seq("band", "key"))
          .select(col("doc_id"), col("eval_id")).distinct()
        cand.join(trainSh, "doc_id")
          .join(broadcast(evalSh.withColumnRenamed("sh", "esh")), "eval_id")
          .select(col("doc_id").as("train_id"), col("eval_id"),
            (size(array_intersect(col("sh"), col("esh"))).cast("double") /
              size(array_union(col("sh"), col("esh")))).as("jaccard"))
          .filter(col("jaccard") >= 0.5)
      },
      Some(s"""WITH ev AS (
             |  SELECT doc_id + $plantOffsetSql AS eval_id, array_to_string(
             |    string_split(text, ' ')[1:len(string_split(text, ' ')) - 2], ' ') AS text
             |  FROM documents
             |  WHERE doc_id % 25 = 0 AND len(string_split(text, ' ')) >= 10),
             |tsh AS (SELECT * FROM (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
             |    i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS s
             |  FROM documents) WHERE len(s) > 0),
             |esh AS (SELECT * FROM (
             |  SELECT eval_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
             |    i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS s
             |  FROM ev) WHERE len(s) > 0),
             |tsig AS (
             |  SELECT doc_id, [
             |    list_min(list_transform(s, x -> md5('0|' || x))),
             |    list_min(list_transform(s, x -> md5('1|' || x))),
             |    list_min(list_transform(s, x -> md5('2|' || x))),
             |    list_min(list_transform(s, x -> md5('3|' || x))),
             |    list_min(list_transform(s, x -> md5('4|' || x))),
             |    list_min(list_transform(s, x -> md5('5|' || x))),
             |    list_min(list_transform(s, x -> md5('6|' || x))),
             |    list_min(list_transform(s, x -> md5('7|' || x)))] AS sig FROM tsh),
             |esig AS (
             |  SELECT eval_id, [
             |    list_min(list_transform(s, x -> md5('0|' || x))),
             |    list_min(list_transform(s, x -> md5('1|' || x))),
             |    list_min(list_transform(s, x -> md5('2|' || x))),
             |    list_min(list_transform(s, x -> md5('3|' || x))),
             |    list_min(list_transform(s, x -> md5('4|' || x))),
             |    list_min(list_transform(s, x -> md5('5|' || x))),
             |    list_min(list_transform(s, x -> md5('6|' || x))),
             |    list_min(list_transform(s, x -> md5('7|' || x)))] AS sig FROM esh),
             |tband AS (SELECT doc_id, b, sig[2*b+1] || sig[2*b+2] AS key
             |  FROM tsig, (SELECT unnest(range(4)) AS b)),
             |eband AS (SELECT eval_id, b, sig[2*b+1] || sig[2*b+2] AS key
             |  FROM esig, (SELECT unnest(range(4)) AS b)),
             |cand AS (SELECT DISTINCT t.doc_id, e.eval_id
             |  FROM tband t JOIN eband e ON t.b = e.b AND t.key = e.key)
             |SELECT train_id, eval_id, jaccard FROM (
             |  SELECT c.doc_id AS train_id, c.eval_id,
             |    CAST(len(list_filter(t.s, x -> list_contains(e.s, x))) AS DOUBLE)
             |      / len(list_distinct(list_concat(t.s, e.s))) AS jaccard
             |  FROM cand c JOIN tsh t ON c.doc_id = t.doc_id
             |  JOIN esh e ON c.eval_id = e.eval_id)
             |WHERE jaccard >= 0.5""".stripMargin),
      "fuzzy decontamination: md5-MinHash LSH train⋈eval band join " +
        "(eval side broadcast) + exact-Jaccard confirm — whole pipeline " +
        "value-checked in DuckDB, planted prefix-copy eval set"),

    // Repeated-span detection — the n-gram-grain map of exact substring
    // dedup (Lee et al., "Deduplicating Training Data Makes Language
    // Models Better"): any 10-token span appearing in 2+ DISTINCT
    // documents is memorization fuel even when the documents as wholes
    // are not near-duplicates. One explode + one hash aggregation; at
    // 100 TB the group key would be the span's 8-byte xxhash64 (spans
    // never shuffle as text) — here the span text itself is the key so
    // DuckDB value-checks every emitted (span, n_docs, n_occurrences)
    // row. The planted exact copies guarantee repeated spans exist on
    // random data; a within-doc repeat alone must NOT surface
    // (n_docs counts DISTINCT documents).
    Q("dedup_common_spans",
      (s, d) => plantedDocs(s, d)
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .select(col("doc_id"),
          explode(array_distinct(wordShinglesFromTokens(col("w"), 10))).as("span"))
        .groupBy(col("span"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"))
        .filter(col("n_docs") >= 2),
      Some(s"""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + $plantOffsetSql, text FROM documents
             |  WHERE $plantedPredicate),
             |grams AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(
             |    range(1, greatest(len(string_split(text, ' ')) - 9, 0) + 1),
             |    i -> array_to_string(string_split(text, ' ')[i:i+9], ' ')))) AS span
             |  FROM corpus)
             |SELECT span, count(DISTINCT doc_id) AS n_docs,
             |  count(*) AS n_occurrences
             |FROM grams GROUP BY span
             |HAVING count(DISTINCT doc_id) >= 2""".stripMargin),
      "repeated 10-token spans across distinct documents (substring-" +
        "dedup signal at n-gram grain) — planted copies make it " +
        "non-vacuous, every row value-checked"),

    // Per-document CROSS-document repetition burden: the fraction of a
    // doc's distinct 10-token spans that also appear in at least one
    // OTHER doc — the per-doc quality signal built on the span map
    // above (a doc that is mostly shared spans is boilerplate or a
    // copy even if no single pair crosses a near-dup threshold;
    // text_repetition covers the WITHIN-doc case). Same scale shape as
    // dedup_common_spans: one explode, one span-keyed hash agg, one
    // equi-join back, one doc-keyed agg — never pairwise. share is an
    // exact int/int division (bitwise identical across engines).
    Q("dedup_span_burden",
      (s, d) => {
        val g = plantedDocs(s, d)
          .select(col("doc_id"), tokens(col("text")).as("w"))
          .select(col("doc_id"),
            explode(array_distinct(wordShinglesFromTokens(col("w"), 10)))
              .as("span"))
        val spanDocs = g.groupBy(col("span"))
          .agg(countDistinct(col("doc_id")).as("nd"))
        g.join(spanDocs, "span")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_spans"),
            sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("shared_spans"))
          .select(col("doc_id"), col("n_spans"), col("shared_spans"),
            (col("shared_spans").cast("double") / col("n_spans")).as("share"))
      },
      Some(s"""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + $plantOffsetSql, text FROM documents
             |  WHERE $plantedPredicate),
             |grams AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(
             |    range(1, greatest(len(string_split(text, ' ')) - 9, 0) + 1),
             |    i -> array_to_string(string_split(text, ' ')[i:i+9], ' ')))) AS span
             |  FROM corpus),
             |sd AS (SELECT span, count(DISTINCT doc_id) AS nd FROM grams GROUP BY span)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             |  CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS shared_spans,
             |  CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / count(*) AS share
             |FROM grams g JOIN sd USING (span)
             |GROUP BY doc_id""".stripMargin),
      "per-doc cross-document repetition burden: share of a doc's " +
        "10-token spans appearing in other docs — span-keyed joins, " +
        "never pairwise; exact division value-checked"),

    // Per-document NOVELTY in ingestion order: the share of a doc's
    // distinct 3-grams whose FIRST corpus occurrence (min doc_id) is
    // this doc — the curve curators watch to see a crawl saturate
    // (novelty decays as the corpus grows; a sudden spike flags a new
    // domain, a collapse flags a duplicated batch). Same scale shape
    // as the span-burden query: one explode, one gram-keyed min
    // aggregation, one equi-join back, one doc rollup — never
    // pairwise, and at 100 TB the gram key would be its 8-byte hash.
    // Shares are exact int/int divisions.
    Q("dedup_novelty_curve",
      (s, d) => {
        val g = load(s, d, "documents")
          .select(col("doc_id"), tokens(col("text")).as("w"))
          .select(col("doc_id"),
            explode(array_distinct(wordShinglesFromTokens(col("w"), 3)))
              .as("gram"))
        val first = g.groupBy(col("gram")).agg(min(col("doc_id")).as("fd"))
        g.join(first, "gram")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L))
              .as("n_novel"))
          .withColumn("novelty", col("n_novel") / col("n_grams"))
      },
      Some("""WITH g AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(
             |    range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
             |    i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS gram
             |  FROM documents),
             |f AS (SELECT gram, min(doc_id) AS fd FROM g GROUP BY gram)
             |SELECT doc_id, count(*) AS n_grams,
             |  CAST(sum(CASE WHEN fd = doc_id THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_novel,
             |  CAST(sum(CASE WHEN fd = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             |    / count(*) AS novelty
             |FROM g JOIN f USING (gram)
             |GROUP BY doc_id""".stripMargin),
      "per-doc novelty in ingestion order: share of 3-grams first seen " +
        "in this doc — gram-keyed min + join back, never pairwise; " +
        "the crawl-saturation curve, exact ratios"),

    // Sorted-neighborhood dedup (Hernández–Stolfo SNM): the THIRD
    // classic blocking family next to hash blocks (MinHash/SimHash
    // bands) and cells (semantic clusters) — sort by a discriminating
    // key, compare only records within a fixed window of the sort
    // order. Candidates ∝ n × window (here 3), independent of how
    // many records share a key value — SNM's edge over equality
    // blocking when keys are noisy (typos land adjacent, not equal).
    // The window compare is NOT a range self-join: each record
    // explodes its next-3 rank probes and equi-joins the rank column.
    // The global rank itself is DISTRIBUTED: the sort key's own
    // 2-char prefix range-partitions the table (order-preserving
    // blocks), row_number runs per block under a PARTITIONED window,
    // and prior-block offsets come from a cumulative window over the
    // tiny BLOCK ROLLUP (aggregate grain, ≤ #prefixes rows) — a
    // two-level prefix sum, so no single-partition sort ever sees row
    // grain and the rank values are identical to a global
    // row_number. Edit distance is exact Levenshtein (identical
    // definition both engines), so every candidate pair and distance
    // hash-checks.
    Q("dedup_sorted_neighborhood",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = graft.core.Caching.persistOnce(load(s, d, "part")
          .select(col("p_partkey"), col("p_name"))
          .withColumn("blk", substring(col("p_name"), 1, 2)))
        val blkTot = base.groupBy(col("blk")).agg(count(lit(1)).as("btot"))
        val prior = blkTot
          .withColumn("prior", coalesce(sum(col("btot")).over(
            Window.orderBy(col("blk"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("blk"), col("prior"))
        val ranked = graft.core.Caching.persistOnce(base
          .withColumn("rin", row_number().over(
            Window.partitionBy(col("blk"))
              .orderBy(col("p_name"), col("p_partkey"))))
          .join(broadcast(prior), "blk")
          .select(col("p_partkey"), col("p_name"),
            (col("rin") + col("prior")).as("rk")))
        ranked
          .select(col("p_partkey").as("a"), col("p_name").as("na"),
            explode(expr("sequence(rk + 1, rk + 3)")).as("rk"))
          .join(ranked.select(col("rk"), col("p_partkey").as("b"),
            col("p_name").as("nb")), "rk")
          .select(col("a"), col("b"),
            levenshtein(col("na"), col("nb")).as("dist"))
          .filter(col("dist") <= 4)
      },
      Some("""WITH ranked AS (
             |  SELECT p_partkey, p_name,
             |         row_number() OVER (ORDER BY p_name, p_partkey) AS rk
             |  FROM part),
             |probes AS (SELECT p_partkey AS a, p_name AS na, rk + i AS rk
             |           FROM ranked
             |           CROSS JOIN (SELECT unnest([1, 2, 3]) AS i) ii)
             |SELECT a, p_partkey AS b,
             |  CAST(levenshtein(na, p_name) AS INTEGER) AS dist
             |FROM probes JOIN ranked USING (rk)
             |WHERE levenshtein(na, p_name) <= 4""".stripMargin),
      "sorted-neighborhood candidate generation: rank-probe explode + " +
        "rank equi-join (no range self-join), exact Levenshtein " +
        "confirm — every pair and distance hash-checked"),

    // Transposition-tolerant typo dedup on the custom codegen'd
    // DamerauLevenshtein expression (`functions/EditDistance.scala`):
    // adjacent swaps — the dominant human typo class — cost 1 here vs
    // 2 under plain Levenshtein, so a threshold-1 matcher catches the
    // swapped-letter duplicates lev-1 structurally misses (every
    // output row carries both distances to make that visible).
    // Matching runs over the DISTINCT NAME VOCABULARY (each name keyed
    // by its min part key), the standard entity-resolution shape: the
    // vocabulary is orders of magnitude smaller than the table and —
    // unlike id-level pairing, where every typo would match EVERY copy
    // of its repeat-heavy source name — the output is ∝ vocabulary,
    // not ∝ name multiplicity; resolved names then map back to rows by
    // an ordinary equi-join (not part of this query). Ground truth is
    // PLANTED: every 5th vocabulary entry re-enters with chars 3-4
    // swapped at a max(id)-derived offset, so the match set is
    // non-vacuous at any SF. Candidates come from an equi-join on the
    // (first-2-chars, length, last-char) block key — all three
    // invariant under the planted swap — never an all-pairs compare;
    // block-key choice governs candidate volume at scale (compose
    // with SNM or band blocks for finer control). DuckDB implements
    // the same unrestricted Lowrance-Wagner variant (pinned by
    // EditDistanceSpec's "CA"→"ABC" = 2 case), so every integer
    // distance hash-checks cross-engine.
    Q("dedup_typo_pairs",
      (s, d) => {
        val base = load(s, d, "part")
          .groupBy(col("p_name").as("name"))
          .agg(min(col("p_partkey")).as("id"))
          .select(col("id"), col("name"))
        val off = base.agg(((expr("max(id) div 1000") + 2) * 1000).as("off"))
        val planted = base.crossJoin(broadcast(off))
          .filter(col("id") % 5 === 0 && length(col("name")) >= 5)
          .select((col("id") + col("off")).as("id"),
            concat(substring(col("name"), 1, 2),
              substring(col("name"), 4, 1),
              substring(col("name"), 3, 1),
              expr("substring(name, 5)")).as("name"))
        val corpus = graft.core.Caching.persistOnce(
          base.unionByName(planted).select(col("id"), col("name"),
            substring(col("name"), 1, 2).as("blk"),
            length(col("name")).as("len"),
            expr("substring(name, length(name), 1)").as("lst")))
        corpus.as("l").join(corpus.as("r"),
            col("l.blk") === col("r.blk") && col("l.len") === col("r.len") &&
              col("l.lst") === col("r.lst") && col("l.id") < col("r.id"))
          .select(col("l.id").as("a"), col("r.id").as("b"),
            graft.functions.EditDistance
              .damerauLevenshtein(col("l.name"), col("r.name")).as("dl"),
            levenshtein(col("l.name"), col("r.name")).as("lev"))
          // dl=1 ∧ lev=2 = exactly the transposition-detected pairs —
          // the class this operator exists for; dl=0 pairs are plain
          // exact dupes (dedup_exact_groups' job) and repeat-heavy
          // names would make them quadratic in the output
          .filter(col("dl") === 1 && col("lev") === 2)
      },
      Some("""WITH base AS (SELECT min(p_partkey) AS id, p_name AS name
             |              FROM part GROUP BY p_name),
             |off AS (SELECT ((max(id) // 1000) + 2) * 1000 AS off
             |        FROM base),
             |planted AS (SELECT id + off AS id,
             |    substr(name, 1, 2) || substr(name, 4, 1) ||
             |      substr(name, 3, 1) || substr(name, 5) AS name
             |  FROM base, off WHERE id % 5 = 0 AND length(name) >= 5),
             |corpus AS (SELECT id, name, substr(name, 1, 2) AS blk,
             |    length(name) AS len,
             |    substr(name, length(name), 1) AS lst
             |  FROM (SELECT * FROM base
             |        UNION ALL SELECT * FROM planted) u)
             |SELECT l.id AS a, r.id AS b,
             |  CAST(damerau_levenshtein(l.name, r.name) AS INTEGER) AS dl,
             |  CAST(levenshtein(l.name, r.name) AS INTEGER) AS lev
             |FROM corpus l JOIN corpus r
             |  ON l.blk = r.blk AND l.len = r.len AND l.lst = r.lst
             | AND l.id < r.id
             |WHERE damerau_levenshtein(l.name, r.name) = 1
             |  AND levenshtein(l.name, r.name) = 2""".stripMargin),
      "typo dedup on the codegen'd unrestricted Damerau-Levenshtein: " +
        "planted char-swap duplicates, swap-invariant block equi-join " +
        "candidates, both distances hash-checked cross-engine"),

    // Name linkage on the codegen'd Jaro-Winkler kernel — the
    // PREFIX-WEIGHTED similarity record linkage scores person/product
    // names with: suffix damage (truncation, trailing typos) barely
    // dents the score while early-character damage tanks it, the
    // opposite bias of edit distance and exactly why Winkler built it
    // for census name matching. Planted suffix-truncated variants
    // (last two chars dropped from every third name) are the dupe
    // class Damerau-1 structurally misses (2 deletions) and JW
    // catches. Candidates come from a 4-char-prefix block equi-join
    // (JW ≥ 0.93 pairs share early characters by construction of the
    // metric; the oracle replays the identical blocking, so recall is
    // defined identically cross-engine) — candidates ∝ block sizes,
    // never vocabulary². Over the DISTINCT name vocabulary, not id
    // rows (the dedup_typo_pairs scaling rule). Scores rounded 6 dp —
    // the established cross-implementation float-kernel rule.
    Q("dedup_jw_names",
      (s, d) => {
        val base = load(s, d, "part")
          .groupBy(col("p_name").as("name"))
          .agg(min(col("p_partkey")).as("id"))
          .select(col("id"), col("name"))
        val off = base.agg(((expr("max(id) div 1000") + 2) * 1000).as("off"))
        val planted = base.crossJoin(broadcast(off))
          .filter(col("id") % 3 === 0 && length(col("name")) >= 8)
          .select((col("id") + col("off")).as("id"),
            expr("substring(name, 1, length(name) - 2)").as("name"))
        val corpus = graft.core.Caching.persistOnce(
          base.unionByName(planted).select(col("id"), col("name"),
            substring(col("name"), 1, 4).as("blk")))
        corpus.as("l").join(corpus.as("r"),
            col("l.blk") === col("r.blk") && col("l.id") < col("r.id"))
          .select(col("l.id").as("a"), col("r.id").as("b"),
            round(graft.functions.EditDistance
              .jaroWinklerSim(col("l.name"), col("r.name")), 6).as("jw"))
          .filter(col("jw") >= 0.93)
      },
      Some("""WITH base AS (SELECT min(p_partkey) AS id, p_name AS name
             |              FROM part GROUP BY p_name),
             |off AS (SELECT ((max(id) // 1000) + 2) * 1000 AS off
             |        FROM base),
             |planted AS (SELECT id + off AS id,
             |    substr(name, 1, length(name) - 2) AS name
             |  FROM base, off WHERE id % 3 = 0 AND length(name) >= 8),
             |corpus AS (SELECT id, name, substr(name, 1, 4) AS blk
             |  FROM (SELECT * FROM base
             |        UNION ALL SELECT * FROM planted) u)
             |SELECT l.id AS a, r.id AS b,
             |  round(jaro_winkler_similarity(l.name, r.name), 6) AS jw
             |FROM corpus l JOIN corpus r
             |  ON l.blk = r.blk AND l.id < r.id
             |WHERE round(jaro_winkler_similarity(l.name, r.name), 6)
             |  >= 0.93""".stripMargin),
      "name linkage on the codegen'd Jaro-Winkler kernel: planted " +
        "suffix truncations (the class edit-distance-1 misses), " +
        "prefix-block candidates, scores hash-checked cross-engine"),

    // Survivorship / golden-record merge: the record-linkage step
    // AFTER pair finding and component election — each near-dup
    // cluster collapses to ONE canonical row, column by column, under
    // explicit survivorship rules (min id as the stable key, the
    // source of the LONGEST member as best_source, char rollups).
    // Singletons survive as their own golden record via left join +
    // coalesce, so the output is the full entity table a pipeline
    // would actually publish. One groupBy over the cluster-annotated
    // slice; the max_by priority is a single integer (n_chars·1e7 +
    // doc_id, unique per row) because struct-keyed arg_max is not
    // portable cross-engine and composite integer keys are.
    Q("dedup_golden_record",
      (s, d) => {
        val cc = connectedComponents(md5MinhashPairs(s, d))
        val docs = load(s, d, "documents").filter(col("doc_id") < 150)
          .select(col("doc_id"), col("source"), col("n_chars"))
        docs.join(cc, docs("doc_id") === cc("node"), "left")
          .select(coalesce(col("component"), col("doc_id")).as("cluster"),
            col("doc_id"), col("source"), col("n_chars"))
          .groupBy(col("cluster"))
          .agg(count(lit(1)).as("n_members"),
            min(col("doc_id")).as("canonical_id"),
            max_by(col("source"),
              col("n_chars") * 10000000L + col("doc_id")).as("best_source"),
            max(col("n_chars")).as("max_chars"),
            sum(col("n_chars")).as("total_chars"))
      },
      Some(s"""WITH RECURSIVE $md5MinhashPairsSql,
             |edges AS (SELECT a AS src, b AS dst FROM pairs
             |          UNION SELECT b AS src, a AS dst FROM pairs),
             |reach AS (
             |  SELECT src AS node, src AS root FROM edges
             |  UNION
             |  SELECT e.dst AS node, r.root FROM reach r
             |  JOIN edges e ON e.src = r.node),
             |cc AS (SELECT node, min(root) AS component FROM reach GROUP BY node)
             |SELECT coalesce(component, doc_id) AS cluster,
             |  CAST(count(*) AS BIGINT) AS n_members,
             |  min(doc_id) AS canonical_id,
             |  arg_max(source, n_chars * 10000000 + doc_id) AS best_source,
             |  max(n_chars) AS max_chars,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM documents LEFT JOIN cc ON doc_id = node
             |WHERE doc_id < 150
             |GROUP BY 1""".stripMargin),
      "golden-record survivorship: one canonical merged row per " +
        "near-dup cluster (integer-keyed max_by rules), singletons kept"),

    // Blocking-quality evaluation (the standard entity-resolution
    // audit, Christen 2012): how good is the LSH blocking scheme,
    // measured as PAIR COMPLETENESS (what fraction of true near-dup
    // pairs the bands surface) and REDUCTION RATIO (what fraction of
    // the n² comparison space the bands eliminate)? Ground truth needs
    // exhaustive Jaccard, so the audit runs on a bounded sample slice
    // (+ planted exact copies so truth is non-empty at every SF) —
    // exactly how production ER systems estimate recall: sample,
    // brute-force the sample, extrapolate. The per-pair Jaccard and
    // the band keys replay bitwise in DuckDB, so both metrics are
    // value-checked, not asserted.
    Q("dedup_blocking_quality",
      (s, d) => {
        val off = plantOffset(s, d)
        val slice = plantedDocs(s, d)
          .filter(col("doc_id") < 150 ||
            (col("doc_id") >= off && col("doc_id") < off + 150))
          .select(col("doc_id"),
            array_distinct(wordShingles(col("text"), 3)).as("sh"))
          .filter(size(col("sh")) > 0)
        val docs = persistOnce(slice)
        val truth = persistOnce(docs.as("l")
          .join(docs.as("r"), col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
            (size(array_intersect(col("l.sh"), col("r.sh"))).cast("double") /
              size(array_union(col("l.sh"), col("r.sh")))).as("j"))
          .filter(col("j") >= 0.5)
          .select(col("a"), col("b")))
        val bands = md5BandKeys(docs) // the pipeline's own scheme
        val cand = persistOnce(bands.as("l").join(bands.as("r"),
            col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
              col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
          .distinct())
        val nDocs = docs.agg(count(lit(1)).as("n"))
        val nTruth = truth.agg(count(lit(1)).as("truth_pairs"))
        val nCand = cand.agg(count(lit(1)).as("candidate_pairs"))
        val nCaught = cand.join(truth, Seq("a", "b"))
          .agg(count(lit(1)).as("caught_pairs"))
        nDocs.crossJoin(nTruth).crossJoin(nCand).crossJoin(nCaught)
          .select(col("n").as("n_docs"), col("truth_pairs"),
            col("candidate_pairs"), col("caught_pairs"),
            round(col("caught_pairs") /
              col("truth_pairs").cast("double"), 6).as("pair_completeness"),
            round(lit(1.0) - col("candidate_pairs") /
              (col("n") * (col("n") - 1) / 2).cast("double"), 6)
              .as("reduction_ratio"))
      },
      Some(s"""WITH corpus AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id < 150
             |  UNION ALL
             |  SELECT doc_id + $plantOffsetSql, text FROM documents
             |  WHERE doc_id % 25 = 0 AND doc_id < 150
             |    AND len(string_split(text, ' ')) >= 5),
             |docs AS (
             |  SELECT * FROM (
             |    SELECT doc_id, list_distinct(list_transform(
             |      range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
             |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
             |      AS sh
             |    FROM corpus) WHERE len(sh) > 0),
             |truth AS (
             |  SELECT l.doc_id AS a, r.doc_id AS b
             |  FROM docs l JOIN docs r ON l.doc_id < r.doc_id
             |  WHERE CAST(len(list_filter(l.sh, x -> list_contains(r.sh, x)))
             |      AS DOUBLE)
             |    / len(list_distinct(list_concat(l.sh, r.sh))) >= 0.5),
             |${md5BandsSql("docs", "sh")},
             |cand AS (
             |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
             |  FROM bands l JOIN bands r
             |    ON l.b = r.b AND l.key = r.key AND l.doc_id < r.doc_id),
             |m AS (
             |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM docs) AS n_docs,
             |    (SELECT CAST(count(*) AS BIGINT) FROM truth) AS truth_pairs,
             |    (SELECT CAST(count(*) AS BIGINT) FROM cand)
             |      AS candidate_pairs,
             |    (SELECT CAST(count(*) AS BIGINT) FROM cand
             |     WHERE (a, b) IN (SELECT (a, b) FROM truth)) AS caught_pairs)
             |SELECT n_docs, truth_pairs, candidate_pairs, caught_pairs,
             |  round(caught_pairs / CAST(truth_pairs AS DOUBLE), 6)
             |    AS pair_completeness,
             |  round(1.0 - candidate_pairs
             |    / CAST(n_docs * (n_docs - 1) // 2 AS DOUBLE), 6)
             |    AS reduction_ratio
             |FROM m""".stripMargin),
      "blocking-quality audit on a bounded sample: pair completeness " +
        "and reduction ratio of the LSH bands vs brute-force truth — " +
        "the ER-evaluation pair every dedup deployment tracks"),

    // b-bit MinHash (Li & König, WWW 2010): keep only the LOWEST BIT of
    // each of 63 MinHash values — the signature drops from 63 hashes to
    // ONE packed long (8 bytes/doc at any corpus size), and Jaccard is
    // re-estimated from bit agreement: for b=1, E[agree/63] = J +
    // (1−J)/2, so Ĵ = 2·(agree/63) − 1. This is the storage form for
    // planetary-scale near-dup indexes (63 bits in one signed long — the 64th bit would overflow DuckDB's checked shift; 64× smaller state, XOR+popcount
    // compare). Pairs are the planted prefix-copies (varied true J
    // well above 0.5); per-pair agree counts, the dyadic-exact
    // estimate, and the exact Jaccard are all value-checked — the
    // signature pipeline (64 seeded mins → bit extract → packed long)
    // replays bitwise in DuckDB via data-driven lambdas over range(64).
    Q("dedup_bbit_minhash",
      (s, d) => {
        val off = plantOffset(s, d)
        val base = load(s, d, "documents").filter(col("doc_id") < 150)
          .select(col("doc_id"), col("text"))
        val w = tokens(col("text"))
        val planted = base
          .filter(col("doc_id") % 5 === 0 && size(w) >= 10)
          .select((col("doc_id") + lit(off)).as("doc_id"),
            array_join(slice(w, lit(1), size(w) - 2), " ").as("text"))
        val docs = persistOnce(base.unionByName(planted)
          .select(col("doc_id"),
            array_distinct(wordShingles(col("text"), 3)).as("sh"))
          .filter(size(col("sh")) > 0)
          .withColumn("packed", expr(
            """aggregate(transform(sequence(0, 62), i ->
              |  shiftleft(cast(conv(substring(array_min(transform(sh,
              |    x -> md5(concat(cast(i as string), '|', x)))), 1, 8),
              |    16, 10) as bigint) % 2, i)),
              |  0L, (acc, b) -> acc + b)""".stripMargin)))
        val l = docs.select(col("doc_id").as("a"), col("sh").as("sha"),
          col("packed").as("pa"))
        val r = docs.select(col("doc_id").as("b"), col("sh").as("shb"),
          col("packed").as("pb"))
        l.join(r, col("b") === col("a") + off)
          .select(col("a"), col("b"),
            (lit(63) - bit_count(col("pa").bitwiseXOR(col("pb"))))
              .as("agree_bits"),
            (lit(2.0) * (lit(63) - bit_count(col("pa")
              .bitwiseXOR(col("pb")))) / 63.0 - 1.0).as("est_jaccard"),
            (size(array_intersect(col("sha"), col("shb"))).cast("double") /
              size(array_union(col("sha"), col("shb"))))
              .as("exact_jaccard"))
      },
      Some(s"""WITH base AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id < 150),
             |corpus AS (
             |  SELECT doc_id, text FROM base
             |  UNION ALL
             |  SELECT doc_id + $plantOffsetSql, array_to_string(
             |    string_split(text, ' ')[1:len(string_split(text, ' ')) - 2],
             |    ' ')
             |  FROM base
             |  WHERE doc_id % 5 = 0 AND len(string_split(text, ' ')) >= 10),
             |docs AS (
             |  SELECT * FROM (
             |    SELECT doc_id, list_distinct(list_transform(
             |      range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
             |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
             |      AS sh
             |    FROM corpus) WHERE len(sh) > 0),
             |packed AS (
             |  SELECT doc_id, sh,
             |    list_sum(list_transform(range(0, 63), i ->
             |      (CAST(CAST(concat('0x', substr(list_min(list_transform(sh,
             |        x -> md5(CAST(i AS VARCHAR) || '|' || x))), 1, 8))
             |        AS UBIGINT) AS BIGINT) % 2) << i)) AS packed
             |  FROM docs)
             |SELECT l.doc_id AS a, r.doc_id AS b,
             |  CAST(63 - bit_count(xor(l.packed, r.packed)) AS INTEGER)
             |    AS agree_bits,
             |  2.0 * (63 - bit_count(xor(l.packed, r.packed))) / 63.0 - 1.0
             |    AS est_jaccard,
             |  CAST(len(list_filter(l.sh, x -> list_contains(r.sh, x)))
             |    AS DOUBLE)
             |    / len(list_distinct(list_concat(l.sh, r.sh)))
             |    AS exact_jaccard
             |FROM packed l JOIN packed r
             |  ON r.doc_id = l.doc_id + $plantOffsetSql""".stripMargin),
      "b-bit MinHash: 63 minhashes compressed to ONE packed long per " +
        "doc (8-byte signatures, XOR+popcount compare), Jaccard " +
        "re-estimated from bit agreement next to the exact value"),

    // Fellegi-Sunter probabilistic record linkage (the 1969 model
    // every production ER engine — Splink, dedupe.io, JedAI — still
    // scores with): candidate pairs get a log-likelihood-ratio weight
    // Σ_f ln(m_f/u_f) over agreeing fields + ln((1−m_f)/(1−u_f)) over
    // disagreeing ones. The u-probabilities (chance agreement between
    // NON-matches) come from the data exactly — u_f = Σ_v c_v(c_v−1)
    // / N(N−1) off each field's value rollup, the random-pair
    // agreement probability — while m stays the 0.95 textbook prior
    // (no labels in the fixture; Splink's default EM seed). Fields:
    // name color (first token), type material (last token), price
    // bucket; candidates
    // from the (brand, size) equi-join block — pairs ∝ Σ block², never
    // all-pairs. Weights are fixed-order 3-term chains of single-op
    // doubles rounded at 4dp; agreement bits and ids are exact.
    Q("dedup_fellegi_sunter",
      (s, d) => {
        val p = persistOnce(load(s, d, "part").select(
          col("p_partkey").as("id"), col("p_brand").as("brand"),
          col("p_size").as("sz"),
          element_at(split(col("p_name"), " "), 1).as("clr"),
          element_at(split(col("p_type"), " "), -1).as("mat"),
          floor(col("p_retailprice") / 100).cast("long").as("pb")))
        val n = p.agg(count(lit(1)).as("n"))
        def uOf(c: String, alias: String) =
          p.groupBy(col(c)).agg(count(lit(1)).as("c"))
            .agg(sum(col("c") * (col("c") - 1)).as("a"))
            .crossJoin(n)
            .select((col("a").cast("double") /
              (col("n") * (col("n") - 1))).as(alias))
        val us = uOf("clr", "u_clr").crossJoin(uOf("mat", "u_mat"))
          .crossJoin(uOf("pb", "u_pb"))
        def term(lc: String, rc: String, u: String) =
          when(col(lc) === col(rc), log(lit(0.95) / col(u)))
            .otherwise(log(lit(0.05) / (lit(1.0) - col(u))))
        p.as("l").join(p.as("r"),
            col("l.brand") === col("r.brand") &&
              col("l.sz") === col("r.sz") && col("l.id") < col("r.id"))
          .crossJoin(broadcast(us))
          .select(col("l.id").as("a"), col("r.id").as("b"),
            (col("l.clr") === col("r.clr")).as("agr_color"),
            (col("l.mat") === col("r.mat")).as("agr_mat"),
            (col("l.pb") === col("r.pb")).as("agr_price"),
            round(term("l.clr", "r.clr", "u_clr") +
              term("l.mat", "r.mat", "u_mat") +
              term("l.pb", "r.pb", "u_pb"), 4).as("fs_weight"))
      },
      Some("""WITH p AS (
             |  SELECT p_partkey AS id, p_brand AS brand, p_size AS sz,
             |    string_split(p_name, ' ')[1] AS clr,
             |    string_split(p_type, ' ')[-1] AS mat,
             |    CAST(floor(p_retailprice / 100) AS BIGINT) AS pb
             |  FROM part),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p),
             |uc AS (SELECT CAST(a AS DOUBLE) / (n * (n - 1)) AS u_clr
             |  FROM (SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS a FROM
             |    (SELECT count(*) AS c FROM p GROUP BY clr)), nn),
             |um AS (SELECT CAST(a AS DOUBLE) / (n * (n - 1)) AS u_mat
             |  FROM (SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS a FROM
             |    (SELECT count(*) AS c FROM p GROUP BY mat)), nn),
             |up AS (SELECT CAST(a AS DOUBLE) / (n * (n - 1)) AS u_pb
             |  FROM (SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS a FROM
             |    (SELECT count(*) AS c FROM p GROUP BY pb)), nn)
             |SELECT l.id AS a, r.id AS b,
             |  l.clr = r.clr AS agr_color, l.mat = r.mat AS agr_mat,
             |  l.pb = r.pb AS agr_price,
             |  round(
             |    (CASE WHEN l.clr = r.clr THEN ln(0.95 / u_clr)
             |          ELSE ln(0.05 / (1.0 - u_clr)) END) +
             |    (CASE WHEN l.mat = r.mat THEN ln(0.95 / u_mat)
             |          ELSE ln(0.05 / (1.0 - u_mat)) END) +
             |    (CASE WHEN l.pb = r.pb THEN ln(0.95 / u_pb)
             |          ELSE ln(0.05 / (1.0 - u_pb)) END), 4) AS fs_weight
             |FROM p l JOIN p r
             |  ON l.brand = r.brand AND l.sz = r.sz AND l.id < r.id
             |CROSS JOIN uc CROSS JOIN um CROSS JOIN up""".stripMargin),
      "Fellegi-Sunter linkage scoring over (brand, size) blocks: " +
        "data-exact u-probabilities from value rollups, textbook m " +
        "prior, 3-field log-likelihood-ratio weights at 4dp — the " +
        "probabilistic half of the ER surface next to the distance " +
        "matchers"),

    // Fellegi-Sunter with the DECISION RULE applied — the production
    // shape of the query above. dedup_fellegi_sunter is output-complete
    // (every blocked pair, non-matches included), which is genuinely
    // quadratic in block density; no real ER engine ships that table.
    // The decision contract here is "pairs agreeing on ≥1 of the two
    // NAME-LIKE fields (color / material)" — price stays a
    // scoring-only field, the Splink idiom of blocking on identity
    // evidence and scoring the rest (a field that agrees by chance,
    // like the coarse price bucket here, would otherwise admit every
    // pair and prune nothing); the excluded pairs (73% of the blocked
    // set at sf0.01) are NEVER materialized — candidates come from a
    // MULTI-PASS union of FINER blocking keys ((brand,sz)+color /
    // (brand,sz)+material), the Splink blocking_rules idiom:
    // equi-joins whose pair count is Σ over the finer blocks, not Σ
    // over the coarse (brand,sz) blocks. A pair agreeing on k≥1 name
    // fields is found by exactly k passes and deduped by DISTINCT;
    // weights are then computed once per pair via two id joins back
    // to the profile.
    // The weight arithmetic, u-probabilities, and 4dp rounding are
    // IDENTICAL to dedup_fellegi_sunter (already hash-green at all
    // SFs); decision labels compare the ROUNDED weight on both
    // engines, so the boundary is deterministic.
    Q("dedup_fs_decision",
      (s, d) => {
        val p = persistOnce(load(s, d, "part").select(
          col("p_partkey").as("id"), col("p_brand").as("brand"),
          col("p_size").as("sz"),
          element_at(split(col("p_name"), " "), 1).as("clr"),
          element_at(split(col("p_type"), " "), -1).as("mat"),
          floor(col("p_retailprice") / 100).cast("long").as("pb")))
        val n = p.agg(count(lit(1)).as("n"))
        def uOf(c: String, alias: String) =
          p.groupBy(col(c)).agg(count(lit(1)).as("c"))
            .agg(sum(col("c") * (col("c") - 1)).as("a"))
            .crossJoin(n)
            .select((col("a").cast("double") /
              (col("n") * (col("n") - 1))).as(alias))
        val us = uOf("clr", "u_clr").crossJoin(uOf("mat", "u_mat"))
          .crossJoin(uOf("pb", "u_pb"))
        val cand = Seq("clr", "mat").map { c =>
          p.as("l").join(p.as("r"),
              col("l.brand") === col("r.brand") &&
                col("l.sz") === col("r.sz") &&
                col(s"l.$c") === col(s"r.$c") &&
                col("l.id") < col("r.id"))
            .select(col("l.id").as("a"), col("r.id").as("b"))
        }.reduce(_ unionAll _).distinct()
        val lf = p.select(col("id").as("a"), col("clr").as("lclr"),
          col("mat").as("lmat"), col("pb").as("lpb"))
        val rf = p.select(col("id").as("b"), col("clr").as("rclr"),
          col("mat").as("rmat"), col("pb").as("rpb"))
        def term(lc: String, rc: String, u: String) =
          when(col(lc) === col(rc), log(lit(0.95) / col(u)))
            .otherwise(log(lit(0.05) / (lit(1.0) - col(u))))
        cand.join(lf, "a").join(rf, "b").crossJoin(broadcast(us))
          .select(col("a"), col("b"),
            (col("lclr") === col("rclr")).as("agr_color"),
            (col("lmat") === col("rmat")).as("agr_mat"),
            (col("lpb") === col("rpb")).as("agr_price"),
            round(term("lclr", "rclr", "u_clr") +
              term("lmat", "rmat", "u_mat") +
              term("lpb", "rpb", "u_pb"), 4).as("fs_weight"))
          .withColumn("decision",
            when(col("fs_weight") > 0, lit("match"))
              .otherwise(lit("possible")))
      },
      Some("""WITH p AS (
             |  SELECT p_partkey AS id, p_brand AS brand, p_size AS sz,
             |    string_split(p_name, ' ')[1] AS clr,
             |    string_split(p_type, ' ')[-1] AS mat,
             |    CAST(floor(p_retailprice / 100) AS BIGINT) AS pb
             |  FROM part),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p),
             |uc AS (SELECT CAST(a AS DOUBLE) / (n * (n - 1)) AS u_clr
             |  FROM (SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS a FROM
             |    (SELECT count(*) AS c FROM p GROUP BY clr)), nn),
             |um AS (SELECT CAST(a AS DOUBLE) / (n * (n - 1)) AS u_mat
             |  FROM (SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS a FROM
             |    (SELECT count(*) AS c FROM p GROUP BY mat)), nn),
             |up AS (SELECT CAST(a AS DOUBLE) / (n * (n - 1)) AS u_pb
             |  FROM (SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS a FROM
             |    (SELECT count(*) AS c FROM p GROUP BY pb)), nn),
             |cand AS (
             |  SELECT DISTINCT a, b FROM (
             |    SELECT l.id AS a, r.id AS b FROM p l JOIN p r
             |      ON l.brand = r.brand AND l.sz = r.sz
             |      AND l.clr = r.clr AND l.id < r.id
             |    UNION ALL
             |    SELECT l.id, r.id FROM p l JOIN p r
             |      ON l.brand = r.brand AND l.sz = r.sz
             |      AND l.mat = r.mat AND l.id < r.id))
             |SELECT a, b, agr_color, agr_mat, agr_price, fs_weight,
             |  CASE WHEN fs_weight > 0 THEN 'match'
             |       ELSE 'possible' END AS decision
             |FROM (
             |  SELECT c.a, c.b,
             |    l.clr = r.clr AS agr_color, l.mat = r.mat AS agr_mat,
             |    l.pb = r.pb AS agr_price,
             |    round(
             |      (CASE WHEN l.clr = r.clr THEN ln(0.95 / u_clr)
             |            ELSE ln(0.05 / (1.0 - u_clr)) END) +
             |      (CASE WHEN l.mat = r.mat THEN ln(0.95 / u_mat)
             |            ELSE ln(0.05 / (1.0 - u_mat)) END) +
             |      (CASE WHEN l.pb = r.pb THEN ln(0.95 / u_pb)
             |            ELSE ln(0.05 / (1.0 - u_pb)) END), 4) AS fs_weight
             |  FROM cand c JOIN p l ON c.a = l.id JOIN p r ON c.b = r.id
             |  CROSS JOIN uc CROSS JOIN um CROSS JOIN up)""".stripMargin),
      "Fellegi-Sunter with the decision rule applied: multi-pass " +
        "finer-key blocking on the name-like fields (the Splink " +
        "blocking_rules idiom; price scores but never blocks) so " +
        "no-identity-evidence pairs never materialize — the " +
        "production ER shape next to the output-complete scorer"),

    // EM-ESTIMATED Fellegi-Sunter parameters — the unsupervised half
    // the textbook-prior query above leaves open: learn (m_j, u_j, π)
    // from the agreement-pattern counts themselves (Winkler's EM for
    // record linkage). The state is EIGHT rows (2³ patterns), so every
    // iteration is pure aggregate-grain algebra: an E-step crossJoin
    // of the pattern table with the 1-row parameter set, an M-step
    // 1-row aggregate. Engine-exactness trick: posteriors are
    // integer-scaled to w6 = round(w·10⁶) LONGS before the M-step, so
    // the M-step sums are exact integers in ANY order and each m/u/π
    // is a single division of exact longs — three full EM rounds stay
    // bit-identical across engines with no rounding tolerance. Output:
    // the 8 patterns with their final match posteriors + the learned
    // parameters, all integer-scaled.
    Q("dedup_fs_em",
      (s, d) => {
        val p = persistOnce(load(s, d, "part").select(
          col("p_partkey").as("id"), col("p_brand").as("brand"),
          col("p_size").as("sz"),
          element_at(split(col("p_name"), " "), 1).as("clr"),
          element_at(split(col("p_type"), " "), -1).as("mat"),
          floor(col("p_retailprice") / 100).cast("long").as("pb")))
        val pat = persistOnce(p.as("l").join(p.as("r"),
            col("l.brand") === col("r.brand") &&
              col("l.sz") === col("r.sz") && col("l.id") < col("r.id"))
          .groupBy((col("l.clr") === col("r.clr")).as("b1"),
            (col("l.mat") === col("r.mat")).as("b2"),
            (col("l.pb") === col("r.pb")).as("b3"))
          .agg(count(lit(1)).as("ng")))
        val init = s.range(1).select(
          lit(0.9).as("m1"), lit(0.9).as("m2"), lit(0.9).as("m3"),
          lit(0.1).as("u1"), lit(0.1).as("u2"), lit(0.1).as("u3"),
          lit(0.05).as("pi"))
        def pick(b: String, v: String) =
          when(col(b), col(v)).otherwise(lit(1.0) - col(v))
        def estep(params: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
          pat.crossJoin(broadcast(params))
            .withColumn("pm",
              pick("b1", "m1") * pick("b2", "m2") * pick("b3", "m3"))
            .withColumn("pu",
              pick("b1", "u1") * pick("b2", "u2") * pick("b3", "u3"))
            .withColumn("w6",
              round((col("pi") * col("pm") /
                (col("pi") * col("pm") +
                  (lit(1.0) - col("pi")) * col("pu"))) * 1000000)
                .cast("long"))
        def mstep(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
          def mj(b: String) =
            sum(when(col(b), col("w6") * col("ng")).otherwise(0L))
          def uj(b: String) =
            sum(when(col(b), (lit(1000000L) - col("w6")) * col("ng"))
              .otherwise(0L))
          e.agg(mj("b1").as("sm1"), mj("b2").as("sm2"), mj("b3").as("sm3"),
              uj("b1").as("su1"), uj("b2").as("su2"), uj("b3").as("su3"),
              sum(col("w6") * col("ng")).as("sw"),
              sum(col("ng")).as("nn"))
            .select(
              (col("sm1").cast("double") / col("sw")).as("m1"),
              (col("sm2").cast("double") / col("sw")).as("m2"),
              (col("sm3").cast("double") / col("sw")).as("m3"),
              (col("su1").cast("double") /
                (lit(1000000L) * col("nn") - col("sw"))).as("u1"),
              (col("su2").cast("double") /
                (lit(1000000L) * col("nn") - col("sw"))).as("u2"),
              (col("su3").cast("double") /
                (lit(1000000L) * col("nn") - col("sw"))).as("u3"),
              (col("sw").cast("double") /
                (lit(1000000L) * col("nn")).cast("double")).as("pi"))
        }
        var params = init
        for (_ <- 1 to 3) params = mstep(estep(params))
        estep(params).select(col("b1").as("agr_color"),
          col("b2").as("agr_mat"), col("b3").as("agr_price"),
          col("ng").as("n_pairs"), col("w6"),
          round(col("m1") * 1000000).cast("long").as("m1_6"),
          round(col("m2") * 1000000).cast("long").as("m2_6"),
          round(col("m3") * 1000000).cast("long").as("m3_6"),
          round(col("u1") * 1000000).cast("long").as("u1_6"),
          round(col("u2") * 1000000).cast("long").as("u2_6"),
          round(col("u3") * 1000000).cast("long").as("u3_6"),
          round(col("pi") * 1000000000).cast("long").as("pi9"))
      },
      Some {
        def estepSql(k: Int) =
          s"""e$k AS (
             |  SELECT b1, b2, b3, ng,
             |    CAST(round((pi * pm / (pi * pm + (1.0 - pi) * pu))
             |      * 1000000) AS BIGINT) AS w6
             |  FROM (
             |    SELECT pat.*, pi,
             |      (CASE WHEN b1 THEN m1 ELSE 1.0 - m1 END) *
             |      (CASE WHEN b2 THEN m2 ELSE 1.0 - m2 END) *
             |      (CASE WHEN b3 THEN m3 ELSE 1.0 - m3 END) AS pm,
             |      (CASE WHEN b1 THEN u1 ELSE 1.0 - u1 END) *
             |      (CASE WHEN b2 THEN u2 ELSE 1.0 - u2 END) *
             |      (CASE WHEN b3 THEN u3 ELSE 1.0 - u3 END) AS pu
             |    FROM pat CROSS JOIN it${k - 1}))""".stripMargin
        def mstepSql(k: Int) =
          s"""it$k AS (
             |  SELECT
             |    CAST(sum(CASE WHEN b1 THEN w6 * ng ELSE 0 END) AS DOUBLE)
             |      / sum(w6 * ng) AS m1,
             |    CAST(sum(CASE WHEN b2 THEN w6 * ng ELSE 0 END) AS DOUBLE)
             |      / sum(w6 * ng) AS m2,
             |    CAST(sum(CASE WHEN b3 THEN w6 * ng ELSE 0 END) AS DOUBLE)
             |      / sum(w6 * ng) AS m3,
             |    CAST(sum(CASE WHEN b1 THEN (1000000 - w6) * ng ELSE 0 END)
             |      AS DOUBLE) / (1000000 * sum(ng) - sum(w6 * ng)) AS u1,
             |    CAST(sum(CASE WHEN b2 THEN (1000000 - w6) * ng ELSE 0 END)
             |      AS DOUBLE) / (1000000 * sum(ng) - sum(w6 * ng)) AS u2,
             |    CAST(sum(CASE WHEN b3 THEN (1000000 - w6) * ng ELSE 0 END)
             |      AS DOUBLE) / (1000000 * sum(ng) - sum(w6 * ng)) AS u3,
             |    CAST(sum(w6 * ng) AS DOUBLE)
             |      / CAST(1000000 * sum(ng) AS DOUBLE) AS pi
             |  FROM e$k)""".stripMargin
        s"""WITH p AS (
           |  SELECT p_partkey AS id, p_brand AS brand, p_size AS sz,
           |    string_split(p_name, ' ')[1] AS clr,
           |    string_split(p_type, ' ')[-1] AS mat,
           |    CAST(floor(p_retailprice / 100) AS BIGINT) AS pb
           |  FROM part),
           |pat AS (
           |  SELECT l.clr = r.clr AS b1, l.mat = r.mat AS b2,
           |    l.pb = r.pb AS b3, CAST(count(*) AS BIGINT) AS ng
           |  FROM p l JOIN p r
           |    ON l.brand = r.brand AND l.sz = r.sz AND l.id < r.id
           |  GROUP BY 1, 2, 3),
           |it0 AS (SELECT 0.9 AS m1, 0.9 AS m2, 0.9 AS m3,
           |               0.1 AS u1, 0.1 AS u2, 0.1 AS u3, 0.05 AS pi),
           |${estepSql(1)},
           |${mstepSql(1)},
           |${estepSql(2)},
           |${mstepSql(2)},
           |${estepSql(3)},
           |${mstepSql(3)},
           |${estepSql(4)}
           |SELECT b1 AS agr_color, b2 AS agr_mat, b3 AS agr_price,
           |  ng AS n_pairs, w6,
           |  CAST(round(m1 * 1000000) AS BIGINT) AS m1_6,
           |  CAST(round(m2 * 1000000) AS BIGINT) AS m2_6,
           |  CAST(round(m3 * 1000000) AS BIGINT) AS m3_6,
           |  CAST(round(u1 * 1000000) AS BIGINT) AS u1_6,
           |  CAST(round(u2 * 1000000) AS BIGINT) AS u2_6,
           |  CAST(round(u3 * 1000000) AS BIGINT) AS u3_6,
           |  CAST(round(pi * 1000000000) AS BIGINT) AS pi9
           |FROM e4 CROSS JOIN it3""".stripMargin
      },
      "Winkler EM for Fellegi-Sunter m/u/π over the 8 agreement " +
        "patterns: E-step posteriors integer-scaled to w6 longs so " +
        "M-step sums are order-independent exact integers and each " +
        "parameter is one division of exact longs — three rounds, " +
        "engine-exact, no rounding tolerance"))
}
