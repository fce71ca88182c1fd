package graft.operators

import org.apache.spark.sql.functions._

import graft.core.Caching.persistOnce
import graft.core.Tables.load
import graft.functions.TextFunctions._

/** Text-analysis surface over `documents` (SURVEY §2.10 extensions /
  * north_star): quality scoring, token statistics, fingerprinting,
  * language ID. All per-row Column algebra — linear scans, no shuffle.
  */
object TextQueries {

  /** The 3-round BPE merge table, memoized per (session, dir): the
    * trainer query and the encoder query share it, and Verify/Bench
    * invoke both — without the memo the ~6 corpus passes of training
    * would run twice. Each round: one map-side-combined pair-count
    * aggregation (shuffle bounded by live vocab²), one 1-row winner
    * collect (the algorithm's sequential dependency), one map-only
    * in-array merge fold for the NEXT round's counts. */
  private val bpeMerges =
    new graft.core.SessionMemo[String, Seq[(Int, String, String, Long)]]

  private val BpeRounds = 3

  private[operators] def learnedBpeMerges(
      s: org.apache.spark.sql.SparkSession,
      d: String): Seq[(Int, String, String, Long)] =
    bpeMerges.getOrElseUpdate(s, d) {
      import org.apache.spark.sql.DataFrame
      def pairCounts(syms: DataFrame): DataFrame = syms
        .filter(size(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(w) - 1), " +
            "i -> struct(w[i-1] as a, w[i] as b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
      var syms = load(s, d, "documents").select(tokens(col("text")).as("w"))
      val merges = Seq.newBuilder[(Int, String, String, Long)]
      for (r <- 1 to BpeRounds) {
        val top = pairCounts(syms)
          .orderBy(col("n").desc, col("a"), col("b")).limit(1).head()
        merges += ((r, top.getString(0), top.getString(1), top.getLong(2)))
        syms = syms.select(
          bpeMerge(col("w"), top.getString(0), top.getString(1)).as("w"))
      }
      merges.result()
    }

  def queries: Seq[Q] = Seq(
    Q("text_stats",
      (s, d) => load(s, d, "documents").select(
        col("doc_id"),
        size(tokens(col("text"))).as("n_words"),
        stopwordRatio(col("text")).as("stopword_ratio"),
        punctRatio(col("text")).as("punct_ratio"),
        meanTokenLen(col("text")).as("mean_token_len")),
      Some("""SELECT doc_id,
             |CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
             |len(list_filter(string_split(text, ' '),
             |    w -> w IN ('the','a','an','of','and','or','to','in','is','on')))
             |  / len(string_split(text, ' ')) AS stopword_ratio,
             |CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
             |  / length(text) AS punct_ratio,
             |CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS DOUBLE)
             |  / len(string_split(text, ' ')) AS mean_token_len
             |FROM documents""".stripMargin),
      "token counting + quality signals (length/punct/stopword ratios)"),

    Q("text_quality_score",
      (s, d) => load(s, d, "documents").select(
        col("doc_id"),
        qualityScore(col("text")).as("quality")),
      Some("""SELECT doc_id,
             |(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
             | + least((len(list_filter(string_split(text, ' '),
             |      w -> w IN ('the','a','an','of','and','or','to','in','is','on')))
             |    / len(string_split(text, ' '))) * 5.0, 1.0)
             | + greatest(0.0, 1.0 - (CAST(length(text) -
             |      length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
             |    / length(text)) * 10.0)) / 3.0 AS quality
             |FROM documents""".stripMargin),
      "composite C4/Gopher-style quality score"),

    Q("text_pretoken_count",
      (s, d) => load(s, d, "documents").select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]+"), lit(0)))
          .as("n_pretokens")),
      Some("""SELECT doc_id,
             |CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+')) AS INTEGER) AS n_pretokens
             |FROM documents""".stripMargin),
      "BPE-ish pre-tokenizer token count (regex run segmentation)"),

    Q("text_fingerprint",
      (s, d) => load(s, d, "documents").select(
        col("doc_id"),
        bagOfWordsFingerprint(col("text")).as("fingerprint")),
      Some("""SELECT doc_id,
             |md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS fingerprint
             |FROM documents""".stripMargin),
      "bag-of-words canonical document fingerprint (md5 matches across engines)"),

    Q("text_chunks",
      (s, d) => graft.functions.Chunker.chunk(
        load(s, d, "documents").filter(col("doc_id") < 50),
        "doc_id", "text", size = 32, stride = 16),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS w
             |  FROM documents WHERE doc_id < 50),
             |st AS (
             |  SELECT doc_id, w,
             |    unnest(generate_series(1, greatest(len(w) - 31, 1), 16)) AS start_token
             |  FROM t)
             |SELECT doc_id,
             |  CAST((start_token - 1) // 16 AS INTEGER) AS chunk_id,
             |  CAST(start_token AS INTEGER) AS start_token,
             |  array_to_string(w[start_token:start_token + 31], ' ') AS chunk_text,
             |  CAST(least(32, len(w) - start_token + 1) AS INTEGER) AS n_tokens
             |FROM st""".stripMargin),
      "document chunker: overlapping 32-token windows, stride 16 (1→N generator)"),

    // Composite flagship: the full cleaning pipeline a training-data
    // job runs — quality gate → exact dedup (keep lowest doc_id) →
    // chunking — expressed as one declarative plan (filters push into
    // the scan; dedup is one hash-agg; chunking is a generator).
    Q("pipeline_clean_chunks",
      (s, d) => {
        val docs = load(s, d, "documents")
        val quality = docs.filter(
          graft.functions.TextFunctions.qualityScore(col("text")) > 0.5)
        val keep = quality
          .groupBy(md5(col("text")).as("h"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"))
        val kept = quality.join(keep, Seq("doc_id"), "left_semi")
        graft.functions.Chunker.chunk(kept, "doc_id", "text",
          size = 64, stride = 32)
          .select(col("doc_id"), col("chunk_id"), col("n_tokens"))
      },
      Some("""WITH q AS (
             |  SELECT doc_id, text FROM documents
             |  WHERE (least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
             |   + least((len(list_filter(string_split(text, ' '),
             |        w -> w IN ('the','a','an','of','and','or','to','in','is','on')))
             |      / len(string_split(text, ' '))) * 5.0, 1.0)
             |   + greatest(0.0, 1.0 - (CAST(length(text) -
             |        length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
             |      / length(text)) * 10.0)) / 3.0 > 0.5),
             |keep AS (
             |  SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
             |kept AS (
             |  SELECT q.doc_id, string_split(q.text, ' ') AS w
             |  FROM q SEMI JOIN keep ON q.doc_id = keep.doc_id),
             |st AS (
             |  SELECT doc_id, w,
             |    unnest(generate_series(1, greatest(len(w) - 63, 1), 32)) AS start_token
             |  FROM kept)
             |SELECT doc_id,
             |  CAST((start_token - 1) // 32 AS INTEGER) AS chunk_id,
             |  CAST(least(64, len(w) - start_token + 1) AS INTEGER) AS n_tokens
             |FROM st""".stripMargin),
      "composite training-data pipeline: quality gate → exact dedup → chunk"),

    // The first step of BPE tokenizer training: count adjacent token
    // pairs over the corpus. The pair explode is a generator off the
    // pre-projected token array (no re-tokenize per element), the count
    // is one map-side-combined hash agg keyed by pair, and the top-k
    // ends in TakeOrderedAndProject — at 100 TB the shuffle carries
    // (pair, partial count), bounded by vocabulary², not corpus size.
    Q("text_bpe_pairs",
      (s, d) => load(s, d, "documents")
        .select(tokens(col("text")).as("w"))
        .filter(size(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(w) - 1), " +
            "i -> concat(w[i-1], ' ', w[i]))")).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(100),
      Some("""WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
             |p AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
             |        i -> w[i] || ' ' || w[i+1])) AS pair
             |      FROM t WHERE len(w) >= 2)
             |SELECT pair, count(*) AS n FROM p GROUP BY pair
             |ORDER BY n DESC, pair LIMIT 100""".stripMargin),
      "BPE training step: adjacent-pair frequency count, top-100 merges"),

    // Content-defined chunking: a chunk boundary falls wherever the
    // hash of the trailing 4-token window starts with a zero nibble
    // (P=1/16 → ~16-token expected chunks). Unlike fixed-stride
    // windows, an insertion early in a document shifts only the chunk
    // it lands in — every later boundary re-synchronizes, so chunk
    // hashes stay stable for dedup across near-identical revisions.
    // ZERO-exchange plan: boundary positions, chunk spans, and chunk
    // hashes are all computed INSIDE the per-row token array (filter /
    // transform / slice), then exploded — no per-token window
    // prefix-sum, no shuffle at any corpus size (PlanAuditSpec pins
    // it). md5 is the cross-engine hash family (xxhash64 would be the
    // in-engine pick). The oracle states the same semantics in the
    // window-prefix-sum form DuckDB optimizes well.
    Q("text_cdc_chunks",
      (s, d) => graft.functions.Chunker.contentDefinedChunks(
        load(s, d, "documents"), "doc_id", "text",
        window = 4, nibbles = 1),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |pos AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM t),
             |p AS (SELECT doc_id, i, w[i] AS tok,
             |        CASE WHEN i >= 4 AND substring(md5(array_to_string(w[i-3:i], ' ')), 1, 1) = '0'
             |             THEN 1 ELSE 0 END AS b
             |      FROM pos),
             |c AS (SELECT doc_id, i, tok,
             |        CAST(sum(b) OVER (PARTITION BY doc_id ORDER BY i) - b AS BIGINT) AS chunk_id
             |      FROM p)
             |SELECT doc_id, chunk_id, CAST(min(i) AS INTEGER) AS start_token,
             |  count(*) AS n_tokens,
             |  md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_hash
             |FROM c GROUP BY doc_id, chunk_id""".stripMargin),
      "content-defined chunking: boundaries from a rolling 4-token " +
        "window hash — chunk hashes survive edits for cross-revision dedup"),

    // BPE tokenizer TRAINING, not just the pair-count step: K greedy
    // merge rounds over the corpus, exactly how a distributed BPE/
    // WordPiece trainer runs (Sennrich et al. 2016 at corpus scale).
    // Each round is (1) one map-side-combined pair-count aggregation —
    // the shuffle carries (pair, partial count), bounded by the live
    // symbol vocabulary², never corpus size; (2) a 1-row
    // TakeOrderedAndProject collect of the winning pair (count desc,
    // pair asc tie-break — deterministic); (3) a map-only greedy
    // left-to-right merge fold applied INSIDE each row's symbol array
    // (`aggregate()` — no shuffle, no explode/regroup round trip). The
    // K driver-side 1-row collects are the algorithm's sequential
    // dependency, not a scale hazard. Symbols start as whitespace
    // tokens (word-level BPE = phrase merging); a merged symbol keeps
    // its space so later rounds can extend it. The DuckDB oracle
    // replays the identical 3 rounds (list_reduce fold over
    // single-element lists), so the learned merge table — pairs AND
    // counts — is value-checked end-to-end.
    Q("text_bpe_train",
      (s, d) => {
        import s.implicits._
        learnedBpeMerges(s, d).toDF("round", "a", "b", "n")
      },
      Some("""WITH t0 AS (SELECT string_split(text, ' ') AS w FROM documents),
             |p1 AS (SELECT w[i] AS a, w[i+1] AS b
             |       FROM (SELECT w, unnest(generate_series(1, len(w)-1)) AS i
             |             FROM t0 WHERE len(w) >= 2)),
             |m1 AS (SELECT a, b, count(*) AS n FROM p1 GROUP BY a, b
             |       ORDER BY n DESC, a, b LIMIT 1),
             |t1 AS (SELECT list_reduce(list_transform(w, t -> [t]),
             |         (acc, x) -> CASE WHEN acc[-1] = m1.a AND x[1] = m1.b
             |           THEN list_concat(acc[1:len(acc)-1], [m1.a || ' ' || m1.b])
             |           ELSE list_concat(acc, x) END) AS w
             |       FROM t0, m1),
             |p2 AS (SELECT w[i] AS a, w[i+1] AS b
             |       FROM (SELECT w, unnest(generate_series(1, len(w)-1)) AS i
             |             FROM t1 WHERE len(w) >= 2)),
             |m2 AS (SELECT a, b, count(*) AS n FROM p2 GROUP BY a, b
             |       ORDER BY n DESC, a, b LIMIT 1),
             |t2 AS (SELECT list_reduce(list_transform(w, t -> [t]),
             |         (acc, x) -> CASE WHEN acc[-1] = m2.a AND x[1] = m2.b
             |           THEN list_concat(acc[1:len(acc)-1], [m2.a || ' ' || m2.b])
             |           ELSE list_concat(acc, x) END) AS w
             |       FROM t1, m2),
             |p3 AS (SELECT w[i] AS a, w[i+1] AS b
             |       FROM (SELECT w, unnest(generate_series(1, len(w)-1)) AS i
             |             FROM t2 WHERE len(w) >= 2)),
             |m3 AS (SELECT a, b, count(*) AS n FROM p3 GROUP BY a, b
             |       ORDER BY n DESC, a, b LIMIT 1)
             |SELECT 1 AS round, a, b, n FROM m1
             |UNION ALL SELECT 2, a, b, n FROM m2
             |UNION ALL SELECT 3, a, b, n FROM m3""".stripMargin),
      "BPE tokenizer training: 3 greedy merge rounds — pair-count agg " +
        "+ 1-row winner collect + map-only in-array merge fold per " +
        "round; learned merge table value-checked in DuckDB"),

    // The trained tokenizer APPLIED: encode every document with the
    // learned merge table (in training order — BPE encoding is the
    // same greedy fold replay) and report the per-doc compression.
    // Pure map work: three chained `BpeMergePass` kernels inside one
    // whole-stage-codegen projection, zero exchanges at any corpus
    // size — the shape a tokenize-the-corpus job has at 100 TB. The
    // ratio is an exact int/int division (bitwise identical across
    // engines); the oracle re-learns the same merges and replays the
    // same folds.
    Q("text_bpe_apply",
      (s, d) => {
        val merges = learnedBpeMerges(s, d)
        val base = load(s, d, "documents")
          .select(col("doc_id"), tokens(col("text")).as("w"))
          .withColumn("n_tokens", size(col("w")))
        val encoded = merges.foldLeft(base) { case (df, (_, a, b, _)) =>
          df.withColumn("w", bpeMerge(col("w"), a, b))
        }
        encoded.select(col("doc_id"), col("n_tokens"),
          size(col("w")).as("n_symbols"),
          (col("n_tokens").cast("double") / size(col("w")))
            .as("compression"))
      },
      Some("""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS w
             |            FROM documents),
             |p1 AS (SELECT w[i] AS a, w[i+1] AS b
             |       FROM (SELECT w, unnest(generate_series(1, len(w)-1)) AS i
             |             FROM t0 WHERE len(w) >= 2)),
             |m1 AS (SELECT a, b FROM (SELECT a, b, count(*) AS n FROM p1
             |       GROUP BY a, b ORDER BY n DESC, a, b LIMIT 1)),
             |t1 AS (SELECT doc_id, len(w) AS n_tokens,
             |         list_reduce(list_transform(w, t -> [t]),
             |         (acc, x) -> CASE WHEN acc[-1] = m1.a AND x[1] = m1.b
             |           THEN list_concat(acc[1:len(acc)-1], [m1.a || ' ' || m1.b])
             |           ELSE list_concat(acc, x) END) AS w
             |       FROM t0, m1),
             |p2 AS (SELECT w[i] AS a, w[i+1] AS b
             |       FROM (SELECT w, unnest(generate_series(1, len(w)-1)) AS i
             |             FROM t1 WHERE len(w) >= 2)),
             |m2 AS (SELECT a, b FROM (SELECT a, b, count(*) AS n FROM p2
             |       GROUP BY a, b ORDER BY n DESC, a, b LIMIT 1)),
             |t2 AS (SELECT doc_id, n_tokens,
             |         list_reduce(list_transform(w, t -> [t]),
             |         (acc, x) -> CASE WHEN acc[-1] = m2.a AND x[1] = m2.b
             |           THEN list_concat(acc[1:len(acc)-1], [m2.a || ' ' || m2.b])
             |           ELSE list_concat(acc, x) END) AS w
             |       FROM t1, m2),
             |p3 AS (SELECT w[i] AS a, w[i+1] AS b
             |       FROM (SELECT w, unnest(generate_series(1, len(w)-1)) AS i
             |             FROM t2 WHERE len(w) >= 2)),
             |m3 AS (SELECT a, b FROM (SELECT a, b, count(*) AS n FROM p3
             |       GROUP BY a, b ORDER BY n DESC, a, b LIMIT 1)),
             |t3 AS (SELECT doc_id, n_tokens,
             |         list_reduce(list_transform(w, t -> [t]),
             |         (acc, x) -> CASE WHEN acc[-1] = m3.a AND x[1] = m3.b
             |           THEN list_concat(acc[1:len(acc)-1], [m3.a || ' ' || m3.b])
             |           ELSE list_concat(acc, x) END) AS w
             |       FROM t2, m3)
             |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
             |  CAST(len(w) AS INTEGER) AS n_symbols,
             |  CAST(n_tokens AS DOUBLE) / len(w) AS compression
             |FROM t3""".stripMargin),
      "BPE tokenizer applied: 3 chained codegen'd merge kernels in one " +
        "map-only projection — per-doc compression value-checked"),

    // The marker-count argmax IS SQL-expressible (list_filter + struct
    // sort), so the heuristic is fully oracle-checked: same scores, same
    // (score, lang) tie-break.
    Q("text_langid",
      (s, d) => load(s, d, "documents").select(
        col("doc_id"), col("lang").as("lang_true"),
        langId(col("text")).as("lang_pred")),
      Some("""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents)
             |SELECT doc_id, lang AS lang_true,
             |  (list_sort([
             |    {'score': len(list_filter(ws, w -> list_contains(['the','and','of','with'], w))), 'lang': 'en'},
             |    {'score': len(list_filter(ws, w -> list_contains(['el','la','los','de','con'], w))), 'lang': 'es'},
             |    {'score': len(list_filter(ws, w -> list_contains(['der','die','das','und','mit'], w))), 'lang': 'de'},
             |    {'score': len(list_filter(ws, w -> list_contains(['le','les','des','et','avec'], w))), 'lang': 'fr'},
             |    {'score': len(list_filter(ws, w -> list_contains(['de5','shi4','zai4'], w))), 'lang': 'zh'}
             |  ])[-1]).lang AS lang_pred
             |FROM t""".stripMargin),
      "n-gram-marker language ID heuristic, argmax oracle-checked"),

    // Collocation extraction by pointwise mutual information — the
    // corpus-statistics op behind multi-word-expression vocabularies
    // (wordpiece seeding, stop-phrase lists, NE gazetteers):
    // PMI(x,y) = log2(p(xy) / (p(x)·p(y))) over adjacent-pair and
    // unigram counts, thresholded at c_xy ≥ 5 so rare-pair noise
    // (PMI's known failure mode) never ranks. Scale shape: the corpus
    // is tokenized ONCE into a persisted frame (the text_tfidf_topk
    // precedent) feeding both count aggregations — bigram and unigram
    // counts are map-side-combined and themselves cached (vocab-sized
    // model frames, each consumed by scoring AND its total); the two
    // corpus totals derive from those cached counts (Σ c_xy, Σ c_t —
    // identical to counting the streams, zero extra passes) and ride
    // 1-row broadcasts; scoring joins are keyed on the vocabulary
    // (model keys, never corpus rows); the final top-40 is
    // TakeOrderedAndProject — per-partition top-k, no global sort.
    // Ranking compares unrounded doubles built from identical
    // integer-division IEEE ops in both engines with a (x, y)
    // tie-break, so the cut is deterministic; output PMI is rounded
    // 4 dp for display only.
    Q("text_collocations_pmi",
      (s, d) => {
        val docs = persistOnce(load(s, d, "documents")
          .select(tokens(col("text")).as("w")))
        val bgc = persistOnce(docs.filter(size(col("w")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(w) - 1), " +
              "i -> struct(w[i-1] as x, w[i] as y))")).as("p"))
          .select(col("p.x").as("x"), col("p.y").as("y"))
          .groupBy("x", "y").agg(count(lit(1)).as("c_xy")))
        val uni = persistOnce(docs.select(explode(col("w")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c_t")))
        val pmi = log2((col("c_xy") / col("nb")) /
          ((col("c_x") / col("nt")) * (col("c_y") / col("nt"))))
        bgc.filter(col("c_xy") >= 5)
          .join(uni.select(col("tok").as("x"), col("c_t").as("c_x")), "x")
          .join(uni.select(col("tok").as("y"), col("c_t").as("c_y")), "y")
          .crossJoin(broadcast(bgc.agg(sum(col("c_xy")).as("nb"))))
          .crossJoin(broadcast(uni.agg(sum(col("c_t")).as("nt"))))
          .orderBy(pmi.desc, col("x"), col("y")).limit(40)
          .select(col("x"), col("y"), col("c_xy"), round(pmi, 4).as("pmi4"))
      },
      Some("""WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
             |bg AS (SELECT w[i] AS x, w[i+1] AS y
             |       FROM (SELECT w, unnest(generate_series(1, len(w)-1)) AS i
             |             FROM t WHERE len(w) >= 2)),
             |bgc AS (SELECT x, y, count(*) AS c_xy FROM bg GROUP BY 1, 2),
             |tk AS (SELECT unnest(w) AS tok FROM t),
             |uni AS (SELECT tok, count(*) AS c_t FROM tk GROUP BY 1),
             |nb AS (SELECT CAST(sum(c_xy) AS BIGINT) AS nb FROM bgc),
             |nt AS (SELECT CAST(sum(c_t) AS BIGINT) AS nt FROM uni)
             |SELECT x, y, c_xy,
             |  round(log2((c_xy / nb) /
             |    ((cx.c_t / nt) * (cy.c_t / nt))), 4) AS pmi4
             |FROM bgc JOIN uni cx ON bgc.x = cx.tok
             |         JOIN uni cy ON bgc.y = cy.tok, nb, nt
             |WHERE c_xy >= 5
             |ORDER BY log2((c_xy / nb) / ((cx.c_t / nt) * (cy.c_t / nt)))
             |  DESC, x, y
             |LIMIT 40""".stripMargin),
      "PMI collocations: vocabulary-keyed count joins + broadcast " +
        "corpus totals, top-40 never global-sorts — values and the " +
        "deterministic rank cut hash-checked"),

    // Vocabulary-coverage curve: what share of corpus TOKENS a top-k
    // vocabulary covers, at k ∈ {5, 10, 20} — the tokenizer-design
    // complement of text_zipf_fit (the slope says how fast coverage
    // accrues; this says exactly where the OOV budget lands for
    // concrete vocab sizes). Cutoffs are sized to the synthetic
    // corpus's 31-token vocabulary (real cutoffs would be 100/1k/10k
    // — a cutoff past the vocab emits nothing, which the t1 smoke
    // gate rejects). One token-count aggregation, then
    // rank + cumulative sum over the O(vocab) AGGREGATE (the token
    // stream itself never sorts), emit the three cutoff rows. Rank is
    // total-ordered by (freq desc, token); shares are exact-integer
    // ratios, identical IEEE division — unrounded.
    Q("text_vocab_coverage",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val uni = load(s, d, "documents")
          .select(explode(tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c"))
        val w = Window.orderBy(col("c").desc, col("tok"))
        val cum = Window.orderBy(col("c").desc, col("tok"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        uni
          .withColumn("rk", row_number().over(w))
          .withColumn("cumc", sum(col("c")).over(cum))
          .filter(col("rk").isin(5, 10, 20))
          .crossJoin(broadcast(uni.agg(sum(col("c")).as("nt"))))
          .select(col("rk").as("vocab_size"),
            (col("cumc").cast("double") / col("nt")).as("coverage"),
            (lit(1.0) - col("cumc").cast("double") / col("nt"))
              .as("oov_rate"))
      },
      Some("""WITH uni AS (SELECT tok, count(*) AS c
             |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
             |        FROM documents) t
             |  GROUP BY 1),
             |ranked AS (SELECT c,
             |    row_number() OVER (ORDER BY c DESC, tok) AS rk,
             |    sum(c) OVER (ORDER BY c DESC, tok
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cumc
             |  FROM uni),
             |nt AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM uni)
             |SELECT CAST(rk AS INTEGER) AS vocab_size,
             |  CAST(cumc AS DOUBLE) / nt AS coverage,
             |  1.0 - CAST(cumc AS DOUBLE) / nt AS oov_rate
             |FROM ranked, nt WHERE rk IN (5, 10, 20)""".stripMargin),
      "top-k vocabulary token coverage at concrete cutoffs: rank + " +
        "cumulative sum over the vocab aggregate, exact-integer " +
        "shares unrounded")) :+ shingleProfile :+ autocompleteTopk :+
    rakeKeyphrases :+ goodTuring :+ textrankKeywords :+ heapsLaw :+
    burrowsDelta :+ msttrDiversity :+ compressionQuality

  // Duplication-rate profile by shingle width (1..4-gram): how
  // repetitive the corpus is at each granularity — the curve that
  // tells a dedup pipeline WHICH operator to reach for (high unigram
  // dup = vocabulary concentration, normal; high 4-gram dup =
  // copied PASSAGES, the exact/near-dup operators' territory). The
  // corpus tokenizes once (persisted); each width is an explode +
  // count pair over that frame; output is one row per width with
  // exact total/distinct counts and their ratio. Shuffle ∝ distinct
  // shingles per width.
  private val shingleProfile: Q =
    Q("text_shingle_dup_profile",
      (s, d) => {
        val docs = persistOnce(load(s, d, "documents")
          .select(tokens(col("text")).as("w")))
        (1 to 4).map { n =>
          docs.select(lit(n).as("n"),
            explode(wordShinglesFromTokens(col("w"), n)).as("g"))
        }.reduce(_ unionByName _)
          .groupBy(col("n"))
          .agg(count(lit(1)).as("total"),
            countDistinct(col("g")).as("n_distinct"))
          .select(col("n"), col("total"), col("n_distinct"),
            round(lit(1.0) -
              col("n_distinct").cast("double") / col("total"), 6)
              .as("dup_rate"))
      },
      Some {
        val grams = (1 to 4).map { n =>
          s"""SELECT $n AS n, unnest(list_transform(
             |  range(1, greatest(len(w) - ${n - 1}, 0) + 1),
             |  i -> array_to_string(w[i:i+${n - 1}], ' '))) AS g
             |FROM t""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
           |u AS (
           |$grams)
           |SELECT n, count(*) AS total,
           |  count(DISTINCT g) AS n_distinct,
           |  round(1.0 - CAST(count(DISTINCT g) AS DOUBLE) / count(*), 6)
           |    AS dup_rate
           |FROM u GROUP BY 1""".stripMargin
      },
      "corpus duplication rate per shingle width — the which-dedup-" +
        "operator diagnostic; one tokenize pass, exact counts")

  // Autocomplete / type-ahead index: top-3 completions by frequency
  // for every word prefix up to 4 chars — the search-box suggestion
  // table. The scale discipline is aggregate-then-explode: the
  // corpus collapses to its O(vocab) word-frequency table FIRST and
  // only those rows fan out ×4 into prefixes, so the corpus scan
  // pays one word-keyed exchange and the prefix window ranks a
  // vocab-sized frame (WindowGroupLimit truncates map-side). Ties
  // break lexicographically — a unique total order per prefix.
  private val autocompleteTopk: Q =
    Q("text_autocomplete_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val counts = load(s, d, "part")
          .select(explode(split(col("p_name"), " ")).as("w"))
          .where(length(col("w")) > 0)
          .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        val pref = counts.select(
          explode(expr(
            "transform(sequence(1, least(4, length(w))), " +
              "i -> substring(w, 1, i))")).as("prefix"),
          col("w").as("suggestion"), col("cnt"))
        val byPrefix = Window.partitionBy(col("prefix"))
          .orderBy(col("cnt").desc, col("suggestion"))
        pref.withColumn("rk", row_number().over(byPrefix))
          .where(col("rk") <= 3)
          .select(col("prefix"), col("rk"), col("suggestion"), col("cnt"))
      },
      Some("""WITH words AS (
             |  SELECT unnest(string_split(p_name, ' ')) AS w FROM part),
             |counts AS (
             |  SELECT w, count(*) AS cnt FROM words
             |  WHERE length(w) > 0 GROUP BY 1),
             |pref AS (
             |  SELECT substr(w, 1, i) AS prefix, w AS suggestion, cnt
             |  FROM (SELECT w, cnt,
             |          unnest(range(1, least(4, length(w)) + 1)) AS i
             |        FROM counts) t)
             |SELECT prefix,
             |  CAST(row_number() OVER (PARTITION BY prefix
             |    ORDER BY cnt DESC, suggestion) AS INT) AS rk,
             |  suggestion, cnt
             |FROM pref
             |QUALIFY row_number() OVER (PARTITION BY prefix
             |  ORDER BY cnt DESC, suggestion) <= 3""".stripMargin),
      "type-ahead top-3 per prefix — aggregate to O(vocab) first, " +
        "then explode ×4 and rank; corpus pays one exchange")

  // RAKE keyphrase extraction (Rose et al.) — the unsupervised
  // keyword miner curation pipelines run where TF-IDF's unigram bias
  // fails: candidate phrases are maximal stopword-free token runs,
  // each word scores deg/freq (deg = Σ lengths of phrases containing
  // it — co-occurrence reach; freq = its phrase occurrences), and a
  // phrase scores the sum of its member words. Scale shape: phrase
  // segmentation is ONE per-doc window (cumulative stopword count as
  // the run id — sort bounded by document length); word stats and
  // scoring are vocabulary-bounded aggregates + an equi-join on word;
  // the final top-25 is TakeOrderedAndProject under a unique
  // (rounded score, phrase) order. The ≤6-word candidate cap is the
  // standard RAKE practice and bounds the phrase alphabet. Word
  // scores are exact-int ratios; the per-phrase sum of ≤6 doubles is
  // order-unstable → rounded 4 dp (catalog rule).
  private val rakeKeyphrases: Q =
    Q("text_rake_phrases",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val stop = Seq("the", "a", "and", "of", "to", "in", "is", "on", "for")
        val tok = load(s, d, "documents")
          .select(col("doc_id"),
            posexplode(tokens(col("text"))).as(Seq("pos", "word")))
          .withColumn("is_stop",
            col("word").isInCollection(stop) || length(col("word")) === 0)
        val grouped = tok.withColumn("grp",
            sum(when(col("is_stop"), 1L).otherwise(0L))
              .over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
          .filter(!col("is_stop"))
        val ph = grouped.groupBy(col("doc_id"), col("grp"))
          .agg(expr("array_join(transform(array_sort(" +
              "collect_list(struct(pos, word))), x -> x.word), ' ')")
              .as("phrase"),
            count(lit(1)).as("len"))
          .filter(col("len") <= 6)
        val wstats = ph
          .select(col("len"), explode(split(col("phrase"), " ")).as("w"))
          .groupBy(col("w"))
          .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
        val occ = ph.groupBy(col("phrase"), col("len"))
          .agg(count(lit(1)).as("n_occ"))
        occ.select(col("phrase"), col("len"), col("n_occ"),
            explode(split(col("phrase"), " ")).as("w"))
          .join(wstats, "w")
          .groupBy(col("phrase"), col("len"), col("n_occ"))
          .agg(round(sum(col("deg").cast("double") /
            col("freq").cast("double")), 4).as("score"))
          .orderBy(col("score").desc, col("phrase")).limit(25)
          .select(col("phrase"), col("len").as("n_words"), col("n_occ"),
            col("score"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(list_transform(range(1, len(w) + 1),
             |    i -> {'pos': i, 'word': w[i]})) AS t
             |  FROM (SELECT doc_id, string_split(text, ' ') AS w
             |        FROM documents)),
             |flags AS (
             |  SELECT doc_id, t.pos AS pos, t.word AS word,
             |    CASE WHEN t.word IN ('the','a','and','of','to','in',
             |                         'is','on','for')
             |         OR length(t.word) = 0 THEN 1 ELSE 0 END AS is_stop
             |  FROM tok),
             |grps AS (
             |  SELECT doc_id, pos, word, is_stop,
             |    sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
             |  FROM flags),
             |ph AS (
             |  SELECT doc_id, grp, string_agg(word, ' ' ORDER BY pos)
             |      AS phrase,
             |    count(*) AS len
             |  FROM grps WHERE is_stop = 0 GROUP BY 1, 2
             |  HAVING count(*) <= 6),
             |wstats AS (
             |  SELECT w, count(*) AS freq, CAST(sum(len) AS BIGINT) AS deg
             |  FROM (SELECT len, unnest(string_split(phrase, ' ')) AS w
             |        FROM ph)
             |  GROUP BY 1),
             |occ AS (SELECT phrase, len, count(*) AS n_occ
             |        FROM ph GROUP BY 1, 2),
             |pw AS (SELECT phrase, len, n_occ,
             |         unnest(string_split(phrase, ' ')) AS w
             |       FROM occ)
             |SELECT phrase, len AS n_words, n_occ,
             |  round(sum(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE)), 4)
             |    AS score
             |FROM pw JOIN wstats USING (w)
             |GROUP BY phrase, len, n_occ
             |ORDER BY score DESC, phrase LIMIT 25""".stripMargin),
      "RAKE keyphrases: stopword-run segmentation via one per-doc " +
        "window, vocab-bounded deg/freq stats, top-25 under a unique " +
        "order")

  // Good-Turing frequency re-estimation (the LM-smoothing classic) at
  // 5-gram grain — the MISSING-MASS estimate P₀ = N₁/N is the number a
  // corpus team actually consults: how much probability lives in
  // n-grams the corpus has never seen (coverage planning for LM
  // training data). 5-grams make the frequency-of-frequencies curve
  // non-degenerate on this fixture (r ∈ 1..4 with large N_r; unigrams
  // would collapse onto the 31-token vocab, all N_r = 1). Two rollups:
  // gram counts (map-side combined, shuffle ∝ distinct grams) then the
  // O(distinct r) frequency-of-frequencies; the r* = (r+1)·N_{r+1}/N_r
  // re-estimates and P₀ are single exact integer divisions (unrounded
  // per the catalog contract), null r* where N_{r+1} is absent.
  private val goodTuring: Q =
    Q("text_good_turing",
      (s, d) => {
        val fof = load(s, d, "documents")
          .select(explode(wordShingles(col("text"), 5)).as("g"))
          .groupBy(col("g")).agg(count(lit(1)).as("r"))
          .groupBy(col("r")).agg(count(lit(1)).as("n_r"))
        val tot = fof.agg(sum(col("r") * col("n_r")).as("big_n"),
          sum(when(col("r") === 1, col("n_r")).otherwise(0L)).as("n1"))
        fof
          .join(fof.select((col("r") - 1).as("r"), col("n_r").as("n_next")),
            Seq("r"), "left")
          .crossJoin(broadcast(tot))
          .select(col("r"), col("n_r"),
            ((col("r") + 1) * col("n_next") / col("n_r")).as("r_star"),
            (col("n1").cast("double") / col("big_n")).as("p0"))
      },
      Some("""WITH g AS (
             |  SELECT unnest(list_transform(
             |    range(1, greatest(len(string_split(text, ' ')) - 4, 0) + 1),
             |    i -> array_to_string(string_split(text, ' ')[i:i+4], ' ')))
             |    AS g
             |  FROM documents),
             |counts AS (SELECT g, CAST(count(*) AS BIGINT) AS r
             |           FROM g GROUP BY 1),
             |fof AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r
             |        FROM counts GROUP BY 1),
             |tot AS (SELECT CAST(sum(r * n_r) AS BIGINT) AS big_n,
             |  CAST(sum(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT)
             |    AS n1 FROM fof)
             |SELECT f.r, f.n_r, (f.r + 1) * nx.n_r / f.n_r AS r_star,
             |  CAST(n1 AS DOUBLE) / big_n AS p0
             |FROM fof f LEFT JOIN fof nx ON nx.r = f.r + 1
             |CROSS JOIN tot""".stripMargin),
      "Good-Turing 5-gram re-estimation + missing-mass P0 = N1/N: two " +
        "rollups (grams, then frequency-of-frequencies), exact integer " +
        "divisions — the unseen-n-gram coverage number for LM corpora")

  // TextRank keyword scoring (Mihalcea & Tarau, EMNLP 2004): weighted
  // PageRank over the word co-occurrence graph (adjacent-token edges,
  // undirected, weight = adjacency count). The graph lives at
  // VOCABULARY grain — corpus-size-independent once the one bigram
  // rollup is done — and each of the 4 iterations is one edge-keyed
  // join + a weighted dst aggregate, the graph_pagerank_prior shuffle
  // shape. Ranks are rounded only at the final output (8 dp, far
  // above ulp noise — the PageRank precedent); the oracle replays all
  // four weighted iterations via unrolled CTEs.
  private val textrankKeywords: Q =
    Q("text_textrank_keywords",
      (s, d) => {
        val toks = persistOnce(load(s, d, "documents")
          .select(tokens(col("text")).as("w")))
        val nodes = persistOnce(toks
          .select(explode(col("w")).as("word")).distinct())
        val nRow = nodes.agg(count(lit(1)).as("nn"))
        val und = toks
          .select(explode(expr(
            "transform(sequence(1, size(w) - 1), " +
              "i -> struct(w[i-1] AS a, w[i] AS b))")).as("p"))
          .filter(col("p.a") =!= col("p.b"))
          .select(least(col("p.a"), col("p.b")).as("a"),
            greatest(col("p.a"), col("p.b")).as("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("wt"))
        val ed = persistOnce(und
          .select(col("a").as("u"), col("b").as("v"), col("wt"))
          .unionByName(und.select(col("b").as("u"), col("a").as("v"),
            col("wt"))))
        val wdeg = ed.groupBy(col("u")).agg(sum(col("wt")).as("wd"))
        val edw = persistOnce(ed.join(wdeg, "u"))
        var ranks = nodes.crossJoin(broadcast(nRow))
          .select(col("word"), (lit(1.0) / col("nn")).as("r"))
        for (_ <- 1 to 4) {
          val contrib = ranks.join(edw, col("word") === col("u"))
            .groupBy(col("v"))
            .agg(sum(col("r") * col("wt") / col("wd")).as("c"))
          ranks = nodes.crossJoin(broadcast(nRow))
            .join(contrib, col("word") === col("v"), "left")
            .select(col("word"),
              (lit(0.15) / col("nn") +
                lit(0.85) * coalesce(col("c"), lit(0.0))).as("r"))
        }
        ranks.select(col("word"), round(col("r"), 8).as("rank8"))
      },
      Some {
        val iters = (1 to 4).map { i =>
          s"""r$i AS (
             |  SELECT nodes.word, 0.15 / nn.n + 0.85 * coalesce(t.c, 0.0)
             |    AS r
             |  FROM nodes CROSS JOIN nn LEFT JOIN (
             |    SELECT e.v, sum(p.r * e.wt / e.wd) AS c
             |    FROM r${i - 1} p JOIN edw e ON p.word = e.u GROUP BY 1) t
             |  ON nodes.word = t.v)""".stripMargin
        }.mkString(",\n")
        s"""WITH toks AS (
           |  SELECT string_split(text, ' ') AS w FROM documents),
           |nodes AS (
           |  SELECT DISTINCT unnest(w) AS word FROM toks),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
           |big AS (
           |  SELECT unnest(list_transform(range(1, greatest(len(w) - 1, 0)
           |      + 1), i -> struct_pack(a := w[i], b := w[i + 1]))) AS p
           |  FROM toks),
           |und AS (
           |  SELECT least(p.a, p.b) AS a, greatest(p.a, p.b) AS b,
           |    CAST(count(*) AS BIGINT) AS wt
           |  FROM big WHERE p.a <> p.b GROUP BY 1, 2),
           |ed AS (
           |  SELECT a AS u, b AS v, wt FROM und
           |  UNION ALL SELECT b, a, wt FROM und),
           |wdeg AS (SELECT u, CAST(sum(wt) AS BIGINT) AS wd
           |         FROM ed GROUP BY 1),
           |edw AS (SELECT ed.u, ed.v, ed.wt, wdeg.wd
           |        FROM ed JOIN wdeg USING (u)),
           |r0 AS (
           |  SELECT word, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
           |$iters
           |SELECT word, round(r, 8) AS rank8 FROM r4""".stripMargin
      },
      "TextRank keywords: weighted PageRank on the word co-occurrence " +
        "graph — vocabulary-grain after one bigram rollup, one " +
        "edge-keyed shuffle per iteration, 4 iterations value-checked")

  // Heaps'-law vocabulary growth at 5-gram grain — the corpus-growth
  // planning curve Good-Turing's missing mass is the endpoint of: how
  // many NEW distinct grams each additional slice of corpus
  // contributes (sublinear growth ⇒ diminishing new content ⇒ the
  // marginal value of more same-distribution data). Slices are doc-id
  // deciles computed ARITHMETICALLY from the dense id space (no
  // global rank window); a gram's first appearance is min(doc_id) —
  // one gram-keyed rollup — and both cumulative curves fold over the
  // 10-row decile table. The local Heaps exponent β between adjacent
  // deciles is a ratio of single-op ln differences (unrounded).
  private val heapsLaw: Q =
    Q("text_heaps_law",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = persistOnce(load(s, d, "documents")
          .select(col("doc_id"), size(tokens(col("text"))).as("nt"),
            wordShingles(col("text"), 5).as("g")))
        val nRow = docs.agg(count(lit(1)).as("nd"))
        val toks = docs.crossJoin(broadcast(nRow))
          .groupBy(expr("(doc_id * 10) DIV nd").cast("int").as("decile"))
          .agg(sum(col("nt")).as("tokens"))
        val news = docs.select(col("doc_id"), explode(col("g")).as("gram"))
          .groupBy(col("gram")).agg(min(col("doc_id")).as("first_doc"))
          .crossJoin(broadcast(nRow))
          .groupBy(expr("(first_doc * 10) DIV nd").cast("int").as("decile"))
          .agg(count(lit(1)).as("new_grams"))
        val w = Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, 0)
        toks.join(news, Seq("decile"), "left")
          .withColumn("cum_tokens", sum(col("tokens")).over(w))
          .withColumn("cum_grams",
            sum(coalesce(col("new_grams"), lit(0L))).over(w))
          .withColumn("beta",
            (log(col("cum_grams").cast("double")) -
              log(lag(col("cum_grams"), 1).over(Window.orderBy(col("decile")))
                .cast("double"))) /
              (log(col("cum_tokens").cast("double")) -
                log(lag(col("cum_tokens"), 1)
                  .over(Window.orderBy(col("decile"))).cast("double"))))
          .select(col("decile"), col("cum_tokens"), col("cum_grams"),
            col("beta"))
      },
      Some("""WITH docs AS (
             |  SELECT doc_id, len(string_split(text, ' ')) AS nt,
             |    list_transform(range(1,
             |      greatest(len(string_split(text, ' ')) - 4, 0) + 1),
             |      i -> array_to_string(string_split(text, ' ')[i:i+4], ' '))
             |      AS g
             |  FROM documents),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM docs),
             |toks AS (
             |  SELECT CAST((doc_id * 10) // nd AS INTEGER) AS decile,
             |    CAST(sum(nt) AS BIGINT) AS tokens
             |  FROM docs CROSS JOIN nn GROUP BY 1),
             |news AS (
             |  SELECT CAST((first_doc * 10) // nd AS INTEGER) AS decile,
             |    CAST(count(*) AS BIGINT) AS new_grams
             |  FROM (
             |    SELECT gram, min(doc_id) AS first_doc
             |    FROM (SELECT doc_id, unnest(g) AS gram FROM docs)
             |    GROUP BY 1) f
             |  CROSS JOIN nn GROUP BY 1),
             |j AS (
             |  SELECT t.decile, t.tokens,
             |    coalesce(n.new_grams, 0) AS new_grams
             |  FROM toks t LEFT JOIN news n USING (decile)),
             |c AS (
             |  SELECT decile,
             |    CAST(sum(tokens) OVER (ORDER BY decile) AS BIGINT)
             |      AS cum_tokens,
             |    CAST(sum(new_grams) OVER (ORDER BY decile) AS BIGINT)
             |      AS cum_grams
             |  FROM j)
             |SELECT decile, cum_tokens, cum_grams,
             |  (ln(CAST(cum_grams AS DOUBLE))
             |    - ln(CAST(lag(cum_grams) OVER (ORDER BY decile)
             |        AS DOUBLE)))
             |  / (ln(CAST(cum_tokens AS DOUBLE))
             |    - ln(CAST(lag(cum_tokens) OVER (ORDER BY decile)
             |        AS DOUBLE))) AS beta
             |FROM c""".stripMargin),
      "Heaps-law 5-gram vocabulary growth by doc-id decile: arithmetic " +
        "slicing (no global rank), one gram-keyed first-seen rollup, " +
        "cumulative curves + local beta exponents over 10 rows")

  // Burrows' delta — the stylometric distance behind authorship
    // attribution: how far apart are two SOURCES in their relative use
    // of the corpus's most frequent words? Frequencies quantize to
    // exact integer ppm (c·10⁶ div T — long-safe, 1e12 per square,
    // 20 sources), z-scores use the integer closed form
    // (n·f − Σf)/sqrt(n·Σf² − (Σf)²) over the 16×20 grid (zero-variance
    // words pinned to z=0 on both engines), and the per-pair mean of
    // 16 |z₁−z₂| terms rounds 4dp (cross-word double sum). The grid is
    // built source×word so ZERO counts score properly — a word a
    // source never uses is stylometric signal, not a missing row.
  private lazy val burrowsDelta: Q =
    Q("text_burrows_delta",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val toks = persistOnce(load(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("g")))
        val srcTot = toks.groupBy(col("source")).agg(count(lit(1)).as("t"))
        val top = toks.groupBy(col("g")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("g")).limit(16).select(col("g"))
        val counts = toks.join(broadcast(top), Seq("g"))
          .groupBy(col("source"), col("g")).agg(count(lit(1)).as("c"))
        val grid = srcTot.crossJoin(broadcast(top))
          .join(counts, Seq("source", "g"), "left")
          .select(col("source"), col("g"),
            expr("coalesce(c, 0L) * 1000000 DIV t").as("f"))
        val wg = Window.partitionBy(col("g"))
        val z = grid
          .withColumn("n_src", count(lit(1)).over(wg))
          .withColumn("sf", sum(col("f")).over(wg))
          .withColumn("sff", sum(col("f") * col("f")).over(wg))
          .select(col("source"), col("g"),
            when(col("n_src") * col("sff") - col("sf") * col("sf") === 0,
              lit(0.0))
              .otherwise((col("n_src") * col("f") - col("sf"))
                .cast("double") /
                sqrt((col("n_src") * col("sff") - col("sf") * col("sf"))
                  .cast("double"))).as("z"))
        z.as("a").join(z.as("b"),
            col("a.g") === col("b.g") &&
              col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
          .agg(round(avg(abs(col("a.z") - col("b.z"))), 4).as("delta"))
      },
      Some("""WITH toks AS (
             |  SELECT source, unnest(string_split(text, ' ')) AS g
             |  FROM documents),
             |st AS (SELECT source, CAST(count(*) AS BIGINT) AS t
             |       FROM toks GROUP BY 1),
             |top AS (SELECT g FROM (
             |    SELECT g, count(*) AS n FROM toks GROUP BY 1
             |    ORDER BY n DESC, g LIMIT 16)),
             |cnt AS (
             |  SELECT source, g, CAST(count(*) AS BIGINT) AS c
             |  FROM toks JOIN top USING (g) GROUP BY 1, 2),
             |grid AS (
             |  SELECT st.source, top.g,
             |    coalesce(cnt.c, 0) * 1000000 // st.t AS f
             |  FROM st CROSS JOIN top
             |  LEFT JOIN cnt ON cnt.source = st.source AND cnt.g = top.g),
             |z AS (
             |  SELECT source, g,
             |    CASE WHEN n_src * sff - sf * sf = 0 THEN 0.0
             |      ELSE CAST(n_src * f - sf AS DOUBLE) /
             |        sqrt(CAST(n_src * sff - sf * sf AS DOUBLE)) END AS z
             |  FROM (
             |    SELECT source, g, f,
             |      CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n_src,
             |      CAST(sum(f) OVER (PARTITION BY g) AS BIGINT) AS sf,
             |      CAST(sum(f * f) OVER (PARTITION BY g) AS BIGINT) AS sff
             |    FROM grid))
             |SELECT a.source AS s1, b.source AS s2,
             |  round(avg(abs(a.z - b.z)), 4) AS delta
             |FROM z a JOIN z b ON a.g = b.g AND a.source < b.source
             |GROUP BY 1, 2""".stripMargin),
      "Burrows' delta stylometric distance between sources: integer-" +
        "ppm frequencies, closed-form z-scores over the source×word " +
        "grid, pairwise mean |z| gap")

    // Mean segmental type-token ratio (MSTTR-32) — the lexical-
    // diversity gauge raw TTR can't be (TTR falls with length, so
    // corpus comparisons need fixed-size segments). Tokens explode
    // once, segment = pos div 32 keeps FULL segments only, distinct
    // counting is per (doc, segment) — never a sliding window (rolling
    // DISTINCT doesn't slide). Per-doc MSTTR is the exact single
    // division Σu/(32k); the language rollup ships the pooled ratio
    // exact/unrounded and the doc-mean rounded 4dp (cross-doc double
    // sum).
  private lazy val msttrDiversity: Q =
    Q("text_msttr_diversity",
      (s, d) => {
        val segs = load(s, d, "documents")
          .select(col("doc_id"), col("lang"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), col("lang"), size(col("w")).as("n"),
            posexplode(col("w")).as(Seq("i", "g")))
          .filter(expr("i DIV 32") < expr("n DIV 32"))
          .groupBy(col("doc_id"), col("lang"), expr("i DIV 32").as("seg"))
          .agg(countDistinct(col("g")).as("u"))
        val docs = segs.groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("k"), sum(col("u")).as("usum"))
        docs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("k")).as("n_segments"),
            sum(col("usum")).as("utot"),
            round(avg(col("usum").cast("double") /
              (col("k") * lit(32.0))), 4).as("avg_doc_ttr"))
          .select(col("lang"), col("n_docs"), col("n_segments"),
            (col("utot").cast("double") /
              (col("n_segments") * lit(32.0))).as("pooled_ttr"),
            col("avg_doc_ttr"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, lang, string_split(text, ' ') AS w
             |  FROM documents),
             |pos AS (
             |  SELECT doc_id, lang, len(w) AS n, w,
             |    unnest(generate_series(1, len(w))) AS i
             |  FROM t),
             |seg AS (
             |  SELECT doc_id, lang, (i - 1) // 32 AS seg,
             |    CAST(count(DISTINCT w[i]) AS BIGINT) AS u
             |  FROM pos WHERE (i - 1) // 32 < n // 32
             |  GROUP BY 1, 2, 3),
             |docs AS (
             |  SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS k,
             |    CAST(sum(u) AS BIGINT) AS usum
             |  FROM seg GROUP BY 1, 2)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(k) AS BIGINT) AS n_segments,
             |  CAST(sum(usum) AS DOUBLE) /
             |    (CAST(sum(k) AS BIGINT) * 32.0) AS pooled_ttr,
             |  round(avg(CAST(usum AS DOUBLE) / (k * 32.0)), 4)
             |    AS avg_doc_ttr
             |FROM docs GROUP BY 1""".stripMargin),
      "MSTTR-32 lexical diversity per language: fixed 32-token " +
        "segments from one posexplode, per-segment distinct counts, " +
        "pooled ratio exact")

  // Compression-ratio quality gate — the Gopher/RefinedWeb-class
  // curation signal: machine-generated boilerplate compresses far
  // below natural text, and DEFLATE catches LONG-RANGE duplication
  // token-level repetition metrics miss (a paragraph pasted 16 times
  // has unremarkable per-copy bigram stats but a dramatic ratio).
  // Scored by the custom codegen'd [[graft.functions.DeflateSize]]
  // expression (preference-(b): native Expression, no UDF wall) —
  // pure per-row map, embarrassingly parallel. DEFLATE sizes are
  // JVM-side only, so the oracle checks the FLAGGED SET against
  // planted ground truth: repetitive docs planted at max-derived ids
  // score ≤ 0.11, natural fixture text ≥ 0.39 (measured), and the
  // 0.25 threshold sits in the 3.5× gap — the flag decision is
  // margin-robust, never a byte-count compare.
  // Same collision-safe planted-id offset rule as DedupQueries/
  // SimilarityQueries (next-plus-one multiple of 1000 above
  // max(doc_id)), memoized so the driver-side max probe runs once per
  // (session, dir) instead of on every query build.
  private val plantOffsets = new graft.core.SessionMemo[String, Long]
  private def plantOffset(s: org.apache.spark.sql.SparkSession,
                          d: String): Long =
    plantOffsets.getOrElseUpdate(s, d) {
      val maxId = load(s, d, "documents")
        .agg(coalesce(max(col("doc_id")), lit(0L))).head().getLong(0)
      (maxId / 1000 + 2) * 1000
    }

  private lazy val compressionQuality: Q =
    Q("text_compression_quality",
      (s, d) => {
        val base = load(s, d, "documents").select(col("doc_id"), col("text"))
        val offset = plantOffset(s, d)
        val planted = base
          .filter(col("doc_id") % 25 === 0 &&
            size(split(col("text"), " ")) >= 5)
          .select((col("doc_id") + lit(offset)).as("doc_id"),
            array_join(flatten(array_repeat(
              slice(split(col("text"), " "), 1, 4), 16)), " ").as("text"))
        base.unionByName(planted)
          .withColumn("ratio",
            graft.functions.CompressionSignal.deflateSize(col("text"))
              .cast("double") / octet_length(col("text")))
          .filter(col("ratio") < 0.25)
          .select(col("doc_id"), octet_length(col("text")).as("n_bytes"))
      },
      Some("""SELECT doc_id +
             |    ((SELECT max(doc_id) FROM documents) // 1000 + 2) * 1000
             |    AS doc_id,
             |  CAST(16 * strlen(
             |    array_to_string(string_split(text, ' ')[1:4], ' '))
             |    + 15 AS INTEGER) AS n_bytes
             |FROM documents
             |WHERE doc_id % 25 = 0
             |  AND len(string_split(text, ' ')) >= 5""".stripMargin),
      "compression-ratio quality gate via the codegen'd deflate_size " +
        "expression: planted repetitive docs flagged at a margin-" +
        "robust threshold, natural text untouched")
}
