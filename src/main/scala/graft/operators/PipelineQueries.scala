package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Caching.persistOnce
import graft.core.Tables.load
import graft.functions.TextFunctions._

/** Training-data pipeline operators beyond the reference's own surface
  * (SURVEY §2.10 north_star): corpus statistics (TF-IDF, BM25 retrieval,
  * capped inverted index), deterministic hash-based train/val/test
  * splits and stratified sampling, and a one-pass table profiler.
  *
  * Scale notes (100 TB):
  *   - TF-IDF / BM25 / posting lists are the inverted-index build
  *     pattern: explode → hash-agg keyed by (doc, token) / token —
  *     map-side combine bounds shuffle by #distinct keys, and corpus
  *     constants (N, avg length) ride along as a broadcast one-row
  *     cross join, never a driver collect.
  *   - Posting lists are CAPPED per token (top-20 doc ids) so no
  *     single hot token can blow up a reducer or the output row.
  *   - Hash splits/sampling are embarrassingly parallel per-row
  *     filters — no shuffle, no sampling state, reproducible across
  *     runs and engines (md5 on the key, hex-prefix thresholds).
  *   - The profiler computes every column's stats in ONE scan
  *     (count-distincts share the pass via Spark's Expand), instead of
  *     a scan per column.
  */
object PipelineQueries {

  private val B25_TERMS = Seq("dup", "spark", "join")

  // Session-scoped memo of the tokenized corpus: TF-IDF and BM25 both
  // derive four frames from it, and Verify/Bench invoke them repeatedly
  // — a per-invocation persist() would pin a new dead cache entry each
  // time (same pattern as cdc.Fixture's envelope memo).
  private val tokenized =
    new graft.core.SessionMemo[String, org.apache.spark.sql.DataFrame]

  private def tokenizedDocs(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.core.Caching.persistMaterialized(tokenized.getOrElseUpdate(s, d)(
      load(s, d, "documents")
        .select(col("doc_id"), tokens(col("text")).as("w"))))

  /** BM25 (k1=1.2, b=0.75) top-`n` docs for the fixed [[B25_TERMS]]
    * query — the lexical retrieval arm, shared by `text_bm25_search`
    * and the hybrid fusion query. Per-doc term sums are order-unstable
    * doubles → rounded to 4 dp before the (score, doc_id) ranking. */
  private def bm25Top(s: org.apache.spark.sql.SparkSession, d: String,
                      n: Int): org.apache.spark.sql.DataFrame = {
    val docs = tokenizedDocs(s, d)
    val stats = docs.agg(count(lit(1)).as("n"),
      avg(size(col("w"))).as("avglen"))
    val lens = docs.select(col("doc_id"), size(col("w")).as("len"))
    val tc = docs.select(col("doc_id"), explode(col("w")).as("tok"))
      .filter(col("tok").isin(B25_TERMS: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val dfreq = docs
      .select(col("doc_id"), explode(array_distinct(col("w"))).as("tok"))
      .filter(col("tok").isin(B25_TERMS: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val term = tc.join(lens, "doc_id").join(dfreq, "tok")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          ((col("c") * lit(2.2)) /
            (col("c") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("len") / col("avglen"))))))
          .as("ts"))
    term.groupBy(col("doc_id")).agg(round(sum(col("ts")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(n)
  }

  def queries: Seq[Q] = Seq(
    // TF-IDF: tf = c/len, idf = ln((N+1)/(df+1)); ln output is rounded
    // (4 dp) because transcendental libm results may differ in the last
    // ulp across engines; ordering uses the ROUNDED score + unique
    // (doc_id, tok) tie-break so the top-100 selection is total.
    Q("text_tfidf_topk",
      (s, d) => {
        // tokenize ONCE; the four derived frames (corpus size, doc
        // lengths, term counts, doc frequencies) all read the cached
        // tokenized form — one parquet scan of the corpus, not four
        val docs = tokenizedDocs(s, d)
        val n = docs.agg(count(lit(1)).as("n"))
        val lens = docs.select(col("doc_id"), size(col("w")).as("len"))
        val tc = docs.select(col("doc_id"), explode(col("w")).as("tok"))
          .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
        val dfreq = docs
          .select(col("doc_id"), explode(array_distinct(col("w"))).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("df"))
        tc.join(lens, "doc_id").join(dfreq, "tok").crossJoin(broadcast(n))
          .select(col("doc_id"), col("tok"),
            round((col("c") / col("len")) *
              log((col("n") + lit(1.0)) / (col("df") + lit(1.0))), 4)
              .as("tfidf"))
          .orderBy(col("tfidf").desc, col("doc_id"), col("tok"))
          .limit(100)
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |n AS (SELECT count(*) AS n FROM t),
             |lens AS (SELECT doc_id, len(w) AS len FROM t),
             |tc AS (SELECT doc_id, tok, count(*) AS c
             |       FROM (SELECT doc_id, unnest(w) AS tok FROM t) GROUP BY 1, 2),
             |dfreq AS (SELECT tok, count(*) AS df
             |       FROM (SELECT DISTINCT doc_id, unnest(w) AS tok FROM t) GROUP BY 1)
             |SELECT tc.doc_id, tc.tok,
             |  round((c / len) * ln((n + 1.0) / (df + 1.0)), 4) AS tfidf
             |FROM tc JOIN lens USING (doc_id) JOIN dfreq USING (tok) CROSS JOIN n
             |ORDER BY tfidf DESC, doc_id, tok LIMIT 100""".stripMargin),
      "TF-IDF scoring (inverted-index build): top-100 (doc, term) pairs"),

    // BM25 (k1=1.2, b=0.75) for a fixed 3-term query; both engines
    // evaluate the textually-identical formula and round the per-doc
    // term sum (order-unstable) to 4 dp before ranking.
    Q("text_bm25_search",
      (s, d) => bm25Top(s, d, 20),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |stats AS (SELECT count(*) AS n, avg(len(w)) AS avglen FROM t),
             |lens AS (SELECT doc_id, len(w) AS len FROM t),
             |tc AS (SELECT doc_id, tok, count(*) AS c
             |       FROM (SELECT doc_id, unnest(w) AS tok FROM t)
             |       WHERE tok IN ('dup', 'spark', 'join') GROUP BY 1, 2),
             |dfreq AS (SELECT tok, count(*) AS df
             |       FROM (SELECT DISTINCT doc_id, unnest(w) AS tok FROM t)
             |       WHERE tok IN ('dup', 'spark', 'join') GROUP BY 1),
             |term AS (
             |  SELECT tc.doc_id,
             |    ln(1.0 + (n - df + 0.5) / (df + 0.5)) *
             |      ((c * 2.2) / (c + 1.2 * (0.25 + 0.75 * (len / avglen)))) AS ts
             |  FROM tc JOIN lens USING (doc_id) JOIN dfreq USING (tok) CROSS JOIN stats)
             |SELECT doc_id, round(sum(ts), 4) AS score FROM term GROUP BY doc_id
             |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),
      "BM25 keyword retrieval over the corpus, top-20 docs"),

    // Hybrid retrieval (the RAG serving shape): the BM25 keyword arm
    // and the dense cosine arm each retrieve their top-20, then the
    // lists fuse by reciprocal-rank fusion (k=60) — rank-based, so the
    // incomparable score scales never need calibration. Each arm
    // truncates via TakeOrderedAndProject BEFORE the rank window runs,
    // so the (unpartitioned) window sees ≤20 rows; at 100 TB the cost
    // is two retrieval scans — fusion touches 40 rows. Ranks are ints
    // and 1/(60+rank) is a single division, so the fused score is
    // bitwise-deterministic; rounding is cosmetic.
    Q("text_hybrid_rrf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val lex = bm25Top(s, d, 20)
          .withColumn("lex_rank", row_number().over(
            // constant partition key: same single-partition plan over
            // the <=20 truncated rows, without WindowExec's move-all-
            // data-to-one-partition WARN polluting every bench run
            Window.partitionBy(lit(0)).orderBy(col("score").desc, col("doc_id"))))
          .select(col("doc_id"), col("lex_rank"))
        val qv = load(s, d, "embeddings").filter(col("vec_id") === 0)
          .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
        val vec = load(s, d, "embeddings")
          .select(col("vec_id").as("doc_id"),
            round(graft.functions.SimilarityFunctions.cosine(
              col("embedding"), array(qv.map(lit): _*)), 6).as("vscore"))
          .orderBy(col("vscore").desc, col("doc_id")).limit(20)
          .withColumn("vec_rank", row_number().over(
            Window.partitionBy(lit(0)).orderBy(col("vscore").desc, col("doc_id"))))
          .select(col("doc_id"), col("vec_rank"))
        lex.join(vec, Seq("doc_id"), "full_outer")
          .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
            round(coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0)), 6)
              .as("rrf_score"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |stats AS (SELECT count(*) AS n, avg(len(w)) AS avglen FROM t),
             |lens AS (SELECT doc_id, len(w) AS len FROM t),
             |tc AS (SELECT doc_id, tok, count(*) AS c
             |       FROM (SELECT doc_id, unnest(w) AS tok FROM t)
             |       WHERE tok IN ('dup', 'spark', 'join') GROUP BY 1, 2),
             |dfreq AS (SELECT tok, count(*) AS df
             |       FROM (SELECT DISTINCT doc_id, unnest(w) AS tok FROM t)
             |       WHERE tok IN ('dup', 'spark', 'join') GROUP BY 1),
             |term AS (
             |  SELECT tc.doc_id,
             |    ln(1.0 + (n - df + 0.5) / (df + 0.5)) *
             |      ((c * 2.2) / (c + 1.2 * (0.25 + 0.75 * (len / avglen)))) AS ts
             |  FROM tc JOIN lens USING (doc_id) JOIN dfreq USING (tok) CROSS JOIN stats),
             |bm AS (SELECT doc_id, round(sum(ts), 4) AS score FROM term
             |       GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20),
             |lex AS (SELECT doc_id, CAST(row_number() OVER
             |          (ORDER BY score DESC, doc_id) AS INT) AS lex_rank FROM bm),
             |q AS (SELECT CAST(embedding AS DOUBLE[]) AS v
             |      FROM embeddings WHERE vec_id = 0),
             |cs AS (SELECT vec_id AS doc_id,
             |         round(list_dot_product(CAST(embedding AS DOUBLE[]), q.v)
             |           / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
             |                                    CAST(embedding AS DOUBLE[])))
             |              * sqrt(list_dot_product(q.v, q.v))), 6) AS vscore
             |       FROM embeddings, q ORDER BY vscore DESC, doc_id LIMIT 20),
             |vec AS (SELECT doc_id, CAST(row_number() OVER
             |          (ORDER BY vscore DESC, doc_id) AS INT) AS vec_rank FROM cs)
             |SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
             |  round(coalesce(1.0 / (60 + l.lex_rank), 0)
             |      + coalesce(1.0 / (60 + v.vec_rank), 0), 6) AS rrf_score
             |FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id""".stripMargin),
      "hybrid BM25 + dense retrieval fused by reciprocal-rank fusion " +
        "(k=60) — union of both top-20 arms with per-arm ranks"),

    // Capped inverted index: per token, document frequency + the first
    // 20 doc ids (sorted). The cap bounds reducer memory and output row
    // width however hot the token is.
    Q("text_posting_lists",
      (s, d) => load(s, d, "documents")
        .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("df"),
          array_join(transform(
            slice(sort_array(collect_list(col("doc_id"))), 1, 20),
            _.cast("string")), ",").as("head_ids")),
      Some("""WITH t AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
             |          FROM documents)
             |SELECT tok, count(*) AS df,
             |  array_to_string(list_sort(list(doc_id))[1:20], ',') AS head_ids
             |FROM t GROUP BY tok""".stripMargin),
      "capped posting lists: df + first-20 doc ids per token"),

    // Deterministic train/val/test split: md5 of the salted key, first
    // two hex chars against thresholds (~80/10/10). Reproducible across
    // runs, engines, and cluster sizes; pure per-row filter (no state,
    // no shuffle, no sampling RNG).
    Q("split_train_test",
      (s, d) => load(s, d, "documents").select(col("doc_id"),
        when(substring(md5(concat(col("doc_id").cast("string"), lit(":split"))), 1, 2) < "cc", "train")
          .when(substring(md5(concat(col("doc_id").cast("string"), lit(":split"))), 1, 2) < "e6", "val")
          .otherwise("test").as("split")),
      Some("""SELECT doc_id,
             |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'cc' THEN 'train'
             |       WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'e6' THEN 'val'
             |       ELSE 'test' END AS split
             |FROM documents""".stripMargin),
      "deterministic hash-based train/val/test split (~80/10/10)"),

    // Stratified sampling at per-stratum rates (en 10%, others 50%),
    // again via deterministic key hashing — the scale-safe replacement
    // for sampleBy (no RNG, stable under retries/re-partitioning).
    Q("sample_stratified_hash",
      (s, d) => load(s, d, "documents")
        .filter(substring(md5(concat(col("doc_id").cast("string"), lit(":samp"))), 1, 2) <
          when(col("lang") === "en", "1a").otherwise("80"))
        .select(col("doc_id"), col("lang")),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':samp'), 1, 2) <
             |  CASE WHEN lang = 'en' THEN '1a' ELSE '80' END""".stripMargin),
      "deterministic stratified sample: 10% of en, 50% of other langs"),

    // Neyman optimal allocation for a stratified sample: budget shares
    // ∝ N_h·σ_h — the design that minimizes estimator variance for a
    // fixed total budget, vs proportional allocation's N_h alone
    // (high-variance strata earn extra budget; near-constant strata
    // need almost none). σ_h comes from the exact integer moments
    // (n·Σx² − (Σx)²) over document lengths, so the per-stratum
    // doubles are built from identical integers in both engines; the
    // allocation is left FRACTIONAL (rounded 4 dp) because the
    // normalizing Σ N_h·σ_h is an order-unstable double sum —
    // integerizing is the downstream largest-remainder step. One
    // map-side-combined rollup + a 1-row broadcast normalizer; the
    // corpus never shuffles.
    Q("sample_neyman_allocation",
      (s, d) => {
        val st = load(s, d, "documents")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("nh"), sum(col("n_chars")).as("sx"),
            sum(col("n_chars") * col("n_chars")).as("sx2"))
          .select(col("lang"), col("nh"),
            // sums cast to double BEFORE the products: nh·sx2 and sx²
            // overflow long around sf100 (Σchars ~ 4e9 per stratum)
            sqrt((col("nh").cast("double") * col("sx2") -
              col("sx").cast("double") * col("sx")) /
              (col("nh") * (col("nh") - 1))).as("sd"))
        val w = st.select(col("lang"), col("nh"), col("sd"),
          (col("nh") * col("sd")).as("wt"))
        w.crossJoin(broadcast(w.agg(sum(col("wt")).as("tot"))))
          .select(col("lang"), col("nh"), round(col("sd"), 4).as("sd4"),
            round(lit(1000) * col("wt") / col("tot"), 4).as("alloc4"))
      },
      Some("""WITH st AS (
             |  SELECT lang, count(*) AS nh,
             |         CAST(sum(n_chars) AS BIGINT) AS sx,
             |         CAST(sum(n_chars * n_chars) AS BIGINT) AS sx2
             |  FROM documents GROUP BY 1),
             |sd AS (SELECT lang, nh,
             |         sqrt((CAST(nh AS DOUBLE) * sx2
             |             - CAST(sx AS DOUBLE) * sx)
             |           / (nh * (nh - 1))) AS sd
             |       FROM st),
             |w AS (SELECT lang, nh, sd, nh * sd AS wt FROM sd),
             |tot AS (SELECT sum(wt) AS tot FROM w)
             |SELECT lang, nh, round(sd, 4) AS sd4,
             |  round(1000 * wt / tot, 4) AS alloc4
             |FROM w, tot""".stripMargin),
      "Neyman budget allocation from exact integer moments — variance-" +
        "optimal stratified design, one rollup + broadcast normalizer"),

    // Quality-coverage curve: how much of the corpus (token-wise)
    // survives each quality cut — the curve behind every "keep the
    // top X%" curation decision (a steep curve means quality filtering
    // is cheap; a flat one means it starves the token budget). Docs
    // bin by score QUARTILE via the broadcast-threshold shape (exact
    // percentiles to O(1) rows, map-side CASE — the corpus never
    // sorts or shuffles, unlike an ntile formulation), then the
    // cumulative token share descends from the best bin. Token counts
    // are exact integers; shares are exact-int ratios rounded 6 dp;
    // the cumulative window runs over FOUR rows.
    Q("pipeline_quality_coverage",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val scored = persistOnce(load(s, d, "documents")
          .select(qualityScore(col("text")).as("q"),
            size(tokens(col("text"))).cast("long").as("toks")))
        val thr = scored.agg(
          round(percentile(col("q"), lit(0.25)), 6).as("q1"),
          round(percentile(col("q"), lit(0.5)), 6).as("q2"),
          round(percentile(col("q"), lit(0.75)), 6).as("q3"))
        val b = scored.crossJoin(broadcast(thr))
          .select(when(col("q") <= col("q1"), 1)
            .when(col("q") <= col("q2"), 2)
            .when(col("q") <= col("q3"), 3).otherwise(4).as("bin"),
            col("toks"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("tok"))
        val w = Window.orderBy(col("bin").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        b.crossJoin(broadcast(b.agg(sum(col("tok")).as("tt"))))
          .select(col("bin"), col("n_docs"),
            round(col("tok").cast("double") / col("tt"), 6).as("tok_share"),
            round(sum(col("tok")).over(w).cast("double") / col("tt"), 6)
              .as("cum_share_from_best"))
      },
      Some("""WITH scored AS (
             |  SELECT (least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
             |    + least((len(list_filter(string_split(text, ' '),
             |        w -> w IN ('the','a','an','of','and','or','to','in','is','on')))
             |      / len(string_split(text, ' '))) * 5.0, 1.0)
             |    + greatest(0.0, 1.0 - (CAST(length(text) -
             |        length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
             |        AS DOUBLE) / length(text)) * 10.0)) / 3.0 AS q,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
             |  FROM documents),
             |thr AS (SELECT round(quantile_cont(q, 0.25), 6) AS q1,
             |               round(quantile_cont(q, 0.5), 6) AS q2,
             |               round(quantile_cont(q, 0.75), 6) AS q3
             |        FROM scored),
             |b AS (SELECT CASE WHEN q <= q1 THEN 1 WHEN q <= q2 THEN 2
             |             WHEN q <= q3 THEN 3 ELSE 4 END AS bin,
             |        count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS tok
             |      FROM scored, thr GROUP BY 1),
             |t AS (SELECT CAST(sum(tok) AS BIGINT) AS tt FROM b)
             |SELECT bin, n_docs,
             |  round(CAST(tok AS DOUBLE) / tt, 6) AS tok_share,
             |  round(CAST(sum(tok) OVER (ORDER BY bin DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS DOUBLE) / tt, 6) AS cum_share_from_best
             |FROM b, t""".stripMargin),
      "token-coverage curve by quality quartile: broadcast-threshold " +
        "binning (no corpus sort), exact-integer shares, 4-row " +
        "cumulative window"),

    // Class-balanced downsampling: every stratum cut to the MINORITY
    // class's size — the classifier-training prep that stops a 90/10
    // imbalance from teaching the majority prior. Selection is by
    // md5-hash rank within each stratum (deterministic, stable under
    // retries/re-partitioning — the sample_stratified_hash discipline
    // applied to exact-count balancing): rank ≤ min-class-count keeps
    // a uniform, reproducible subset. The rank is a per-stratum
    // window over (hash, id); at extreme stratum cardinality the same
    // selection degrades to a per-stratum hash THRESHOLD (quantile of
    // the hash space ≈ minCount/count) with only approximate counts —
    // the exact-rank form is the correctness baseline. Output: per
    // stratum, the kept count (all equal) and the kept ids' checksum
    // — scalar columns so the driver compare stays happy.
    Q("sample_balanced_classes",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = load(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            md5(concat(col("doc_id").cast("string"), lit(":bal")))
              .as("h"))
        val minN = docs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n"))
          .agg(min(col("n")).as("min_n"))
        val ranked = docs.withColumn("rk", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))))
        ranked.crossJoin(broadcast(minN))
          .filter(col("rk") <= col("min_n"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("doc_id")).as("id_sum"),
            min(col("doc_id")).as("id_min"), max(col("doc_id")).as("id_max"))
      },
      Some("""WITH docs AS (SELECT doc_id, lang,
             |    md5(CAST(doc_id AS VARCHAR) || ':bal') AS h
             |  FROM documents),
             |mn AS (SELECT min(n) AS min_n FROM (
             |         SELECT lang, count(*) AS n FROM docs GROUP BY 1) g),
             |ranked AS (SELECT doc_id, lang,
             |    row_number() OVER (PARTITION BY lang
             |                       ORDER BY h, doc_id) AS rk
             |  FROM docs)
             |SELECT lang, count(*) AS n_kept,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
             |  min(doc_id) AS id_min, max(doc_id) AS id_max
             |FROM ranked, mn WHERE rk <= min_n
             |GROUP BY 1""".stripMargin),
      "minority-size class balancing by deterministic hash rank — " +
        "per-stratum windows over (hash, id), kept-set checksums " +
        "hash-checked"),

    // One-pass numeric profiler over orders: every column's null count,
    // distinct count, min/max/avg from a single scan (the distincts
    // share it via Expand). avg is rounded (order-unstable double sum).
    Q("profile_orders",
      (s, d) => {
        val o = load(s, d, "orders")
        val cols = Seq("o_orderkey", "o_custkey", "o_totalprice")
        val aggs = count(lit(1)).as("n") +: cols.flatMap(c => Seq(
          count(col(c)).as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c"),
          min(col(c)).cast("double").as(s"mn_$c"),
          max(col(c)).cast("double").as(s"mx_$c"),
          round(avg(col(c)), 4).as(s"av_$c")))
        o.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(cols.map(c => struct(
            lit(c).as("col_name"),
            col("n").as("n"),
            (col("n") - col(s"nn_$c")).as("n_null"),
            col(s"nd_$c").as("n_distinct"),
            col(s"mn_$c").as("min_v"),
            col(s"mx_$c").as("max_v"),
            col(s"av_$c").as("avg_r"))): _*)).as("p"))
          .select(col("p.*"))
      },
      Some("""SELECT 'o_orderkey' AS col_name, count(*) AS n,
             |  count(*) - count(o_orderkey) AS n_null,
             |  count(DISTINCT o_orderkey) AS n_distinct,
             |  CAST(min(o_orderkey) AS DOUBLE) AS min_v,
             |  CAST(max(o_orderkey) AS DOUBLE) AS max_v,
             |  round(avg(o_orderkey), 4) AS avg_r FROM orders
             |UNION ALL
             |SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
             |  count(DISTINCT o_custkey), CAST(min(o_custkey) AS DOUBLE),
             |  CAST(max(o_custkey) AS DOUBLE), round(avg(o_custkey), 4) FROM orders
             |UNION ALL
             |SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
             |  count(DISTINCT o_totalprice), CAST(min(o_totalprice) AS DOUBLE),
             |  CAST(max(o_totalprice) AS DOUBLE), round(avg(o_totalprice), 4) FROM orders""".stripMargin),
      "one-pass table profiler: null/distinct/min/max/avg per column"),

    // Information-theoretic column profiling: Shannon entropy of each
    // column's value distribution — the signal behind key-candidate
    // detection (entropy ≈ log2 n), constant-column pruning (≈ 0),
    // and join-key skew triage, complementing profile_orders' moment
    // stats. One scan: stack() unpivots (col, value) pairs map-side
    // (a Generate, no shuffle), then two combine-enabled rollups —
    // (col, value) counts, col totals. Shuffle ∝ Σ per-column
    // distincts, never rows × cols. The Σ p·log2 p reduction is an
    // order-unstable double sum → rounded 4 dp (catalog rule);
    // normalized entropy divides by log2(n_distinct) on the rounded
    // terms' scale and is rounded too.
    Q("profile_entropy",
      (s, d) => {
        val un = load(s, d, "orders").selectExpr(
          "stack(3, 'o_orderstatus', o_orderstatus, " +
            "'o_orderpriority', o_orderpriority, " +
            "'o_custkey', CAST(o_custkey AS STRING)) AS (col_name, val)")
        // consumed twice (totals + the scored join); O(Σ distincts)
        val counts = persistOnce(un.groupBy("col_name", "val")
          .agg(count(lit(1)).as("c")))
        val tot = counts.groupBy("col_name")
          .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"))
        counts.join(broadcast(tot), "col_name")
          .select(col("col_name"), col("n_distinct"),
            ((col("c") / col("n")) * log2(col("c") / col("n"))).as("term"))
          .groupBy("col_name", "n_distinct")
          .agg(round(-sum(col("term")), 4).as("entropy_bits"))
          .select(col("col_name"), col("n_distinct"), col("entropy_bits"),
            round(col("entropy_bits") / log2(col("n_distinct")), 4)
              .as("entropy_norm"))
      },
      Some("""WITH un AS (
             |  SELECT 'o_orderstatus' AS col_name, o_orderstatus AS val
             |  FROM orders
             |  UNION ALL
             |  SELECT 'o_orderpriority', o_orderpriority FROM orders
             |  UNION ALL
             |  SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders),
             |counts AS (SELECT col_name, val, count(*) AS c
             |           FROM un GROUP BY 1, 2),
             |tot AS (SELECT col_name, CAST(sum(c) AS BIGINT) AS n,
             |               count(*) AS n_distinct
             |        FROM counts GROUP BY 1),
             |ent AS (SELECT counts.col_name, n_distinct,
             |          round(-sum((c / n) * log2(c / n)), 4) AS entropy_bits
             |        FROM counts JOIN tot USING (col_name) GROUP BY 1, 2)
             |SELECT col_name, n_distinct, entropy_bits,
             |  round(entropy_bits / log2(n_distinct), 4) AS entropy_norm
             |FROM ent""".stripMargin),
      "per-column Shannon entropy from one stacked scan — shuffle ∝ " +
        "distinct values; raw and log2(n)-normalized entropy " +
        "hash-checked"),

    // Exact interpolated percentiles per group (Spark `percentile` and
    // DuckDB `quantile_cont` share the p*(n-1) lerp definition); the
    // interpolation is rounded (4 dp) since the lerp's op order is an
    // engine detail.
    Q("agg_percentiles",
      // one percentile buffer per group, not three: the array form
      // collects/sorts each group's values once and interpolates all
      // three quantiles from it — same lerp, same values
      (s, d) => load(s, d, "orders").groupBy(col("o_orderpriority"))
        .agg(expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").as("px"))
        .select(col("o_orderpriority"),
          round(element_at(col("px"), 1), 4).as("p25"),
          round(element_at(col("px"), 2), 4).as("p50"),
          round(element_at(col("px"), 3), 4).as("p75")),
      Some("""SELECT o_orderpriority,
             |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
             |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75
             |FROM orders GROUP BY o_orderpriority""".stripMargin),
      "exact interpolated quartiles per order priority"),

    // Approximate percentiles (KLL-style sketch, rank error ≤ n/acc):
    // property-oracled like agg_approx_distinct — the estimate must lie
    // inside the exact quantile band p ± 0.01, which DuckDB verifies by
    // emitting the exact band endpoints + TRUE. At 100 TB the sketch is
    // mergeable per-partition state; the exact sort-based form is the
    // small-data baseline.
    Q("agg_approx_percentile",
      (s, d) => {
        val li = load(s, d, "lineitem")
        // ONE exact-percentile buffer and ONE sketch: the previous four
        // scalar percentile() aggregates each collected and sorted the
        // full column independently (4 copies of every value in the
        // aggregation buffers), and the two approx_percentile calls
        // built two sketches. The array forms interpolate from one
        // shared buffer/sketch — bitwise-identical values per quantile.
        li.agg(
            expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)")
              .as("ap"),
            expr("percentile(l_extendedprice, array(0.49, 0.51, 0.89, 0.91))")
              .as("px"))
          .select(
            element_at(col("ap"), 1).as("ap50"),
            element_at(col("ap"), 2).as("ap90"),
            element_at(col("px"), 1).as("lo50"),
            element_at(col("px"), 2).as("hi50"),
            element_at(col("px"), 3).as("lo90"),
            element_at(col("px"), 4).as("hi90"))
          .select(
            round(col("lo50"), 2).as("band50_lo"),
            round(col("hi50"), 2).as("band50_hi"),
            round(col("lo90"), 2).as("band90_lo"),
            round(col("hi90"), 2).as("band90_hi"),
            (col("ap50") >= col("lo50") && col("ap50") <= col("hi50"))
              .as("p50_in_band"),
            (col("ap90") >= col("lo90") && col("ap90") <= col("hi90"))
              .as("p90_in_band"))
      },
      Some("""SELECT
             |  round(quantile_cont(l_extendedprice, 0.49), 2) AS band50_lo,
             |  round(quantile_cont(l_extendedprice, 0.51), 2) AS band50_hi,
             |  round(quantile_cont(l_extendedprice, 0.89), 2) AS band90_lo,
             |  round(quantile_cont(l_extendedprice, 0.91), 2) AS band90_hi,
             |  TRUE AS p50_in_band, TRUE AS p90_in_band
             |FROM lineitem""".stripMargin),
      "approx percentiles property-oracled: sketch estimate must land " +
        "inside the exact p±0.01 quantile band"),

    // Deterministic group mode (most frequent value, ties broken by the
    // smallest value): two-stage hash agg — value counts, then
    // argmax-with-tiebreak via min_by over (-count, value). Built-in
    // mode() is tie-nondeterministic across engines; this isn't.
    Q("agg_mode_deterministic",
      (s, d) => load(s, d, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("o_orderstatus"))
        .agg(min_by(col("o_orderpriority"),
          struct((-col("n")).as("nn"), col("o_orderpriority").as("p")))
          .as("mode_priority"),
          max(col("n")).as("mode_n")),
      Some("""WITH c AS (
             |  SELECT o_orderstatus, o_orderpriority AS p, count(*) AS n
             |  FROM orders GROUP BY 1, 2)
             |SELECT o_orderstatus,
             |  (list_sort(list({'nn': -n, 'p': p})))[1].p AS mode_priority,
             |  max(n) AS mode_n
             |FROM c GROUP BY o_orderstatus""".stripMargin),
      "deterministic mode per group (argmax count, smallest-value tie-break)"),

    // Equi-width histogram: global min/max ride along as a broadcast
    // one-row cross join; the bin index is pure exact IEEE arithmetic
    // (sub, div, floor), identical across engines.
    Q("profile_histogram",
      (s, d) => {
        val o = load(s, d, "orders")
        val mm = o.agg(min(col("o_totalprice")).as("mn"),
          max(col("o_totalprice")).as("mx"))
        o.crossJoin(broadcast(mm))
          .select(least(floor((col("o_totalprice") - col("mn")) /
            ((col("mx") - col("mn")) / lit(10.0))), lit(9L)).as("bin"))
          .groupBy(col("bin")).agg(count(lit(1)).as("n"))
      },
      Some("""WITH mm AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
             |            FROM orders)
             |SELECT least(CAST(floor((o_totalprice - mn) / ((mx - mn) / 10.0)) AS BIGINT),
             |             9) AS bin, count(*) AS n
             |FROM orders CROSS JOIN mm GROUP BY 1""".stripMargin),
      "10-bin equi-width histogram of order totals (two-pass: minmax + binning)"),

    // Domain-mixture planning — the static calculation behind a
    // Pile/DoReMi-style training mix: given target mixture weights per
    // domain and the tokens actually available, the largest total
    // budget that respects the mix without oversampling any domain is
    // bound by the scarcest domain (min over available/weight); each
    // domain then samples at rate budget·weight/available (the binding
    // domain at 1.0). Cost: one domain-keyed aggregation over the
    // corpus + arithmetic on a #domains-row frame — the 100 TB corpus
    // is touched once, the plan itself is O(domains). Token sums are
    // exact integer sums; every double op is the same IEEE expression
    // tree in both engines, so values stay unrounded.
    Q("pipeline_domain_mix",
      (s, d) => {
        val weights = typedLit(Map(
          "en" -> 0.4, "zh" -> 0.25, "de" -> 0.15, "es" -> 0.1, "fr" -> 0.1))
        val avail = load(s, d, "documents")
          .groupBy(col("lang"))
          .agg(sum(size(tokens(col("text")))).as("available_tokens"))
          .withColumn("target_weight", element_at(weights, col("lang")))
          .filter(col("target_weight").isNotNull)
        val budget = avail.agg(
          min(col("available_tokens") / col("target_weight")).as("budget_tokens"))
        avail.crossJoin(broadcast(budget))
          .select(col("lang"), col("available_tokens"), col("target_weight"),
            (col("budget_tokens") * col("target_weight") / col("available_tokens"))
              .as("sample_rate"),
            (col("budget_tokens") * col("target_weight")).as("planned_tokens"))
          .orderBy(col("lang"))
      },
      Some("""WITH avail AS (
             |  SELECT lang, sum(len(string_split(text, ' '))) AS available_tokens
             |  FROM documents GROUP BY 1),
             |w AS (SELECT * FROM (VALUES
             |  ('en', CAST(0.4 AS DOUBLE)), ('zh', CAST(0.25 AS DOUBLE)),
             |  ('de', CAST(0.15 AS DOUBLE)), ('es', CAST(0.1 AS DOUBLE)),
             |  ('fr', CAST(0.1 AS DOUBLE))) t(lang, target_weight)),
             |j AS (SELECT avail.lang, CAST(available_tokens AS BIGINT) AS available_tokens,
             |        target_weight
             |      FROM avail JOIN w ON avail.lang = w.lang),
             |b AS (SELECT min(available_tokens / target_weight) AS budget_tokens FROM j)
             |SELECT lang, available_tokens, target_weight,
             |  budget_tokens * target_weight / available_tokens AS sample_rate,
             |  budget_tokens * target_weight AS planned_tokens
             |FROM j, b ORDER BY lang""".stripMargin),
      "domain-mixture planner: scarcest domain binds the token budget, " +
        "per-domain sampling rates respect the target mix — one corpus " +
        "scan, O(domains) arithmetic"),

    // TOKEN-BUDGET split — carve train/val by CUMULATIVE TOKENS (not
    // doc counts: doc-count splits skew token mass when lengths vary)
    // in a deterministic pseudo-random order (md5 of the doc id), cut
    // at 90% of the total. Scale shape: the global running sum is the
    // TWO-PHASE SWEEP (16 md5-prefix buckets: per-bucket partitioned
    // windows + an O(16) carry prefix broadcast back), never a global
    // row sort — the window_sweep_concurrency discipline. The cut
    // compares exact integers (10·cum ≤ 9·total), so the boundary doc
    // is engine-exact.
    Q("pipeline_token_budget_split",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = load(s, d, "documents")
          .select(col("doc_id"),
            size(tokens(col("text"))).cast("long").as("toks"),
            md5(col("doc_id").cast("string")).as("h"))
          .withColumn("bucket", substring(col("h"), 1, 1))
        val local = docs.withColumn("local_cum",
          sum(col("toks")).over(Window.partitionBy(col("bucket"))
            .orderBy(col("h"), col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val bucketTotals = docs.groupBy(col("bucket"))
          .agg(sum(col("toks")).as("btoks"))
        val prefixes = bucketTotals
          .withColumn("prefix",
            coalesce(sum(col("btoks")).over(
              org.apache.spark.sql.expressions.Window
                .orderBy(col("bucket"))
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("bucket"), col("prefix"))
        val total = docs.agg(sum(col("toks")).as("total"))
        local.join(broadcast(prefixes), "bucket")
          .crossJoin(broadcast(total))
          .select(col("doc_id"), col("toks"),
            when((col("prefix") + col("local_cum")) * 10 <=
              col("total") * 9, "train").otherwise("val").as("split"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
             |    md5(CAST(doc_id AS VARCHAR)) AS h
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, toks,
             |    sum(toks) OVER (ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS cum,
             |    (SELECT sum(toks) FROM t) AS total
             |  FROM t)
             |SELECT CASE WHEN cum * 10 <= total * 9 THEN 'train'
             |    ELSE 'val' END AS split,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(toks) AS BIGINT) AS n_tokens
             |FROM c GROUP BY 1""".stripMargin),
      "token-budget train/val split at 90% of cumulative tokens in " +
        "md5 order: two-phase sweep (bucketed windows + O(16) carry), " +
        "exact-integer cut — no global row sort"),

    // Reproducible epoch shuffling — every epoch must visit the corpus
    // in a different order, yet the order must be a pure function of
    // (epoch, doc_id) so a resumed/re-run job shards identically. The
    // order key is md5(epoch|doc_id) (shared hash family, so DuckDB
    // replays the permutation bit-for-bit); positions are assigned
    // WITHIN each language partition, so the window parallelizes per
    // group — at 100 TB the same hash key feeds repartitionByRange for
    // a driver-free global order, and per-shard positions (this shape)
    // are what a data loader actually consumes.
    Q("pipeline_epoch_shuffle",
      (s, d) => {
        def orderKey(epoch: Int) =
          md5(concat(lit(s"$epoch|"), col("doc_id").cast("string")))
        def pos(epoch: Int) = row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
            .orderBy(orderKey(epoch), col("doc_id"))).cast("long")
        load(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            pos(1).as("epoch1_pos"), pos(2).as("epoch2_pos"))
      },
      Some("""SELECT doc_id, lang,
             |  row_number() OVER (PARTITION BY lang
             |    ORDER BY md5('1|' || CAST(doc_id AS VARCHAR)), doc_id) AS epoch1_pos,
             |  row_number() OVER (PARTITION BY lang
             |    ORDER BY md5('2|' || CAST(doc_id AS VARCHAR)), doc_id) AS epoch2_pos
             |FROM documents""".stripMargin),
      "reproducible per-epoch shuffle: md5(epoch|id) order key, " +
        "positions assigned within language shards (parallel windows)"),

    // Quantile-threshold quality filtering — "drop the worst quartile"
    // needs a GLOBAL threshold before any row can be filtered: pass 1
    // computes the exact p25 of the quality score (one aggregation),
    // pass 2 broadcasts the 1-row threshold and filters the corpus —
    // the corpus never shuffles, and the threshold is rounded 6 dp on
    // both sides so borderline membership can't diverge on
    // interpolation ulps.
    Q("pipeline_quality_cutoff",
      (s, d) => {
        val scored = load(s, d, "documents")
          .select(col("doc_id"), qualityScore(col("text")).as("q"))
        val thr = scored.agg(
          round(percentile(col("q"), lit(0.25)), 6).as("q25"))
        scored.crossJoin(broadcast(thr))
          .filter(col("q") > col("q25"))
          .select(col("doc_id"), col("q"), col("q25"))
      },
      Some("""WITH scored AS (SELECT doc_id,
             |  (least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
             |   + least((len(list_filter(string_split(text, ' '),
             |        w -> w IN ('the','a','an','of','and','or','to','in','is','on')))
             |      / len(string_split(text, ' '))) * 5.0, 1.0)
             |   + greatest(0.0, 1.0 - (CAST(length(text) -
             |        length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
             |      / length(text)) * 10.0)) / 3.0 AS q
             |  FROM documents),
             |thr AS (SELECT round(quantile_cont(q, 0.25), 6) AS q25 FROM scored)
             |SELECT doc_id, q, q25 FROM scored, thr WHERE q > q25""".stripMargin),
      "global-quantile quality cutoff: exact p25 threshold broadcast " +
        "back over the corpus — two passes, zero corpus shuffles"),

    // Feature discretization: exact-quartile binning of a money column.
    // Thresholds come from ONE exact-percentile aggregate (a 1-row
    // frame broadcast back), bin assignment is a map-side CASE, and the
    // per-bin rollup shuffles O(bins) partial rows — the table itself
    // never shuffles, unlike an ntile() global-sort formulation.
    // Exact-cents longs make the interpolated quartiles dyadic-exact;
    // the 6 dp rounding on both sides absorbs any residual ulp.
    Q("pipeline_quantile_bins",
      (s, d) => {
        val cents = load(s, d, "orders")
          .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
        val thr = cents.agg(
          round(percentile(col("cents"), lit(0.25)), 6).as("q1"),
          round(percentile(col("cents"), lit(0.5)), 6).as("q2"),
          round(percentile(col("cents"), lit(0.75)), 6).as("q3"))
        cents.crossJoin(broadcast(thr))
          .select(col("cents"),
            when(col("cents") <= col("q1"), 1)
              .when(col("cents") <= col("q2"), 2)
              .when(col("cents") <= col("q3"), 3)
              .otherwise(4).as("bin"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      },
      Some("""WITH cents AS (
             |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |  FROM orders),
             |thr AS (SELECT round(quantile_cont(cents, 0.25), 6) AS q1,
             |               round(quantile_cont(cents, 0.5), 6) AS q2,
             |               round(quantile_cont(cents, 0.75), 6) AS q3
             |        FROM cents)
             |SELECT CAST(CASE WHEN cents <= q1 THEN 1
             |            WHEN cents <= q2 THEN 2
             |            WHEN cents <= q3 THEN 3
             |            ELSE 4 END AS INTEGER) AS bin,
             |  CAST(count(*) AS BIGINT) AS n,
             |  min(cents) AS lo, max(cents) AS hi
             |FROM cents, thr
             |GROUP BY 1""".stripMargin),
      "exact-quartile feature binning: 1-row threshold broadcast + " +
        "map-side CASE + O(bins) rollup — no global sort, no table " +
        "shuffle"),

    // Weighted sampling WITHOUT replacement, per stratum, as priority
    // sampling (Duffield/Lund/Thorup; sequential Poisson sampling,
    // Ohlsson): each doc gets priority w/u with u a deterministic
    // md5-derived uniform in (0,1], the k largest priorities per lang
    // are the sample, and the (k+1)-th priority tau yields the
    // Horvitz-Thompson-style unbiased total estimate
    // sum(max(w, tau)) — emitted next to the true stratum total so the
    // estimator is visible. Scale shape: the priority is a map-only
    // per-row expression (no RNG state, stable under retries and
    // repartitioning — the same property the hash split queries rely
    // on); the rank<=k+1 filter compiles to a WindowGroupLimit, so each
    // map task forwards at most k+1 rows per stratum and the single
    // lang-keyed exchange carries samples, not the corpus. u is
    // (hex8+1)/2^32 — both engines parse the same md5 prefix (Spark
    // conv(); DuckDB a Horner fold over the hex digits), every
    // arithmetic step is IEEE-exact, so unrounded priorities
    // hash-match. The 16-double estimator sum is order-unstable →
    // rounded 4 dp (established catalog rule).
    Q("pipeline_priority_sample",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val k = 16
        val u = (conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":prio"))), 1, 8), 16, 10).cast("double") + 1) / lit(4294967296.0)
        val pr = load(s, d, "documents").select(
          col("lang"), col("doc_id"), col("n_chars").as("weight"),
          (col("n_chars").cast("double") / u).as("priority"))
        val byPrio = Window.partitionBy(col("lang"))
          .orderBy(col("priority").desc, col("doc_id"))
        val stratum = Window.partitionBy(col("lang"))
        val top = pr.withColumn("r", row_number().over(byPrio))
          .filter(col("r") <= k + 1) // WindowGroupLimit: map-side top-(k+1)
          .withColumn("tau", coalesce(
            max(when(col("r") === k + 1, col("priority"))).over(stratum),
            lit(0.0)))
        val totals = pr.groupBy(col("lang"))
          .agg(sum(col("weight")).as("true_total"))
        top.filter(col("r") <= k)
          .withColumn("est_total", round(
            sum(greatest(col("weight").cast("double"), col("tau")))
              .over(stratum), 4))
          .join(broadcast(totals), "lang")
          .select(col("lang"), col("doc_id"), col("weight"),
            col("priority"), col("est_total"), col("true_total"))
      },
      Some("""WITH h AS (
             |  SELECT lang, doc_id, n_chars AS weight,
             |    list_reduce(list_transform(range(1, 9),
             |      i -> CAST(strpos('0123456789abcdef',
             |        substr(md5(CAST(doc_id AS VARCHAR) || ':prio'), i, 1)) - 1
             |        AS DOUBLE)),
             |      (a, x) -> a * 16 + x) AS hv
             |  FROM documents),
             |pr AS (
             |  SELECT lang, doc_id, weight,
             |    CAST(weight AS DOUBLE) / ((hv + 1) / 4294967296.0) AS priority
             |  FROM h),
             |rk AS (
             |  SELECT *, row_number() OVER (
             |    PARTITION BY lang ORDER BY priority DESC, doc_id) AS r
             |  FROM pr),
             |tau AS (
             |  SELECT lang, coalesce(
             |    max(CASE WHEN r = 17 THEN priority END), 0.0) AS tau
             |  FROM rk WHERE r <= 17 GROUP BY lang),
             |tot AS (
             |  SELECT lang, CAST(sum(weight) AS BIGINT) AS true_total
             |  FROM pr GROUP BY lang)
             |SELECT lang, doc_id, weight, priority,
             |  round(sum(greatest(CAST(weight AS DOUBLE), tau))
             |    OVER (PARTITION BY lang), 4) AS est_total,
             |  true_total
             |FROM rk JOIN tau USING (lang) JOIN tot USING (lang)
             |WHERE r <= 16""".stripMargin),
      "priority sampling: deterministic weighted sample-without-" +
        "replacement per stratum (k largest w/u) + unbiased " +
        "sum(max(w,tau)) total estimate vs the true total"),

    // Robust aggregation — the outlier-resistant statistics a metrics
    // layer runs next to plain avg: per-group 10% TRIMMED mean (drop
    // rows outside [p10, p90]) and WINSORIZED mean (clamp to the same
    // band). One grouped exact-percentile aggregate (O(groups) rows)
    // joined back onto the cents scan, then one conditional rollup —
    // the same two-pass no-global-sort shape as pipeline_quantile_
    // bins. Exact-cents longs make the trimmed mean deterministic
    // UNROUNDED (integer-valued sums are exact in any order, and an
    // integer cent can never equal a fractional interpolated
    // threshold, so boundary membership can't flip); the winsorized
    // sum carries fractional clamped values → rounded 4 dp.
    Q("agg_robust_mean",
      (s, d) => {
        val cents = load(s, d, "orders").select(
          col("o_orderpriority").as("prio"),
          round(col("o_totalprice") * 100).cast("long").as("c"))
        val thr = cents.groupBy("prio").agg(
          percentile(col("c"), lit(0.1)).as("p10"),
          percentile(col("c"), lit(0.9)).as("p90"))
        cents.join(broadcast(thr), "prio")
          .groupBy(col("prio"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("c").between(col("p10"), col("p90")), 1L)
              .otherwise(0L)).as("n_kept"),
            (avg(when(col("c").between(col("p10"), col("p90")), col("c")))
              / 100.0).as("trimmed_mean"),
            round(avg(greatest(least(col("c").cast("double"), col("p90")),
              col("p10"))) / 100.0, 4).as("winsorized_mean"))
      },
      Some("""WITH cents AS (
             |  SELECT o_orderpriority AS prio,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS c
             |  FROM orders),
             |thr AS (
             |  SELECT prio, quantile_cont(c, 0.1) AS p10,
             |    quantile_cont(c, 0.9) AS p90
             |  FROM cents GROUP BY prio)
             |SELECT prio, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN c BETWEEN p10 AND p90 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_kept,
             |  avg(CASE WHEN c BETWEEN p10 AND p90 THEN c END) / 100.0
             |    AS trimmed_mean,
             |  round(avg(greatest(least(CAST(c AS DOUBLE), p90), p10))
             |    / 100.0, 4) AS winsorized_mean
             |FROM cents JOIN thr USING (prio)
             |GROUP BY prio""".stripMargin),
      "robust statistics: per-group 10% trimmed and winsorized means — " +
        "O(groups) exact-percentile broadcast + one conditional rollup, " +
        "no global sort; trimmed mean exact-cents deterministic"),

    // Composite: budgeted-corpus assembly — priority-sample a weighted
    // subset per language (k=32 largest w/u, the sampling stage of
    // pipeline_priority_sample) and greedy-pack the SAMPLED documents
    // into 128-token context windows (the packing stage of
    // pipeline_pack_sequences) — the "build this week's training mix"
    // job as one declared plan. The sample's WindowGroupLimit bounds
    // what reaches packing to k rows per stratum, so the packing scan
    // is O(sample), not O(corpus); the oracle chains the identical
    // md5-priority CTEs into the packing recurrence.
    Q("pipeline_sample_pack",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val k = 32
        val u = (conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":prio"))), 1, 8), 16, 10).cast("double") + 1) / lit(4294967296.0)
        val pr = load(s, d, "documents").select(
          col("lang"), col("doc_id"), tokens(col("text")).as("w"),
          (col("n_chars").cast("double") / u).as("priority"))
        val sampled = pr.withColumn("r", row_number().over(
            Window.partitionBy(col("lang"))
              .orderBy(col("priority").desc, col("doc_id"))))
          .filter(col("r") <= k)
          .select(col("lang"), col("doc_id"), size(col("w")).as("n_tokens"))
        graft.functions.Packing.packGreedy(sampled,
          groupCol = "lang", idCol = "doc_id", nTokensCol = "n_tokens",
          ctx = 128).toDF()
      },
      Some("""WITH RECURSIVE h AS (
             |  SELECT lang, doc_id, n_chars,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
             |    list_reduce(list_transform(range(1, 9),
             |      i -> CAST(strpos('0123456789abcdef',
             |        substr(md5(CAST(doc_id AS VARCHAR) || ':prio'), i, 1)) - 1
             |        AS DOUBLE)),
             |      (a, x) -> a * 16 + x) AS hv
             |  FROM documents),
             |rk AS (
             |  SELECT lang, doc_id, n, row_number() OVER (
             |    PARTITION BY lang
             |    ORDER BY CAST(n_chars AS DOUBLE)
             |      / ((hv + 1) / 4294967296.0) DESC, doc_id) AS r
             |  FROM h),
             |t AS (
             |  SELECT lang, doc_id, n,
             |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
             |  FROM rk WHERE r <= 32),
             |p AS (
             |  SELECT lang, doc_id, n, rn, CAST(0 AS BIGINT) AS bin, n AS fill
             |  FROM t WHERE rn = 1
             |  UNION ALL
             |  SELECT t.lang, t.doc_id, t.n, t.rn,
             |         CASE WHEN p.fill + t.n > 128 THEN p.bin + 1 ELSE p.bin END,
             |         CASE WHEN p.fill + t.n > 128 THEN t.n ELSE p.fill + t.n END
             |  FROM p JOIN t ON t.lang = p.lang AND t.rn = p.rn + 1)
             |SELECT doc_id, lang, bin AS bin_id, fill AS fill_after FROM p""".stripMargin),
      "composite budgeted-corpus assembly: per-language priority sample " +
        "(k=32) feeding greedy 128-token packing — sampling bounds the " +
        "packing scan to O(sample); chained-CTE oracle"),

    // Poisson bootstrap confidence interval for the mean — the
    // distributed bootstrap (each row draws an independent Poisson(1)
    // multiplicity per replicate, so no resample pass ever
    // materializes). 64 replicates ride ONE explode×64 + a 64-group
    // map-side-combined aggregation — shuffle is 64 rows per map
    // task, never the table; the CI is the 2nd/63rd order statistic
    // of the replicate means. Everything is deterministic: the
    // Poisson draw inverts a shared md5-uniform against hard-coded
    // CDF literals, weighted sums are exact integer cents, and the
    // replicate means are exact-int ratios (IEEE-identical), so the
    // whole interval hash-matches.
    Q("sample_bootstrap_ci",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = load(s, d, "orders").select(col("o_orderkey"),
          expr("CAST(round(o_totalprice*100) AS BIGINT)").as("cents"))
        val rep = base.select(col("o_orderkey"), col("cents"),
          explode(expr("sequence(0, 63)")).as("b"))
        val u = (conv(substring(md5(concat(
          col("o_orderkey").cast("string"), lit(":boot:"),
          col("b").cast("string"))), 1, 8), 16, 10)
          .cast("double") + 1) / lit(4294967296.0)
        val w = when(u <= 0.36787944117144233, 0L)
          .when(u <= 0.7357588823428847, 1L)
          .when(u <= 0.9196986029286058, 2L)
          .when(u <= 0.9810118431238463, 3L)
          .when(u <= 0.9963401531726563, 4L)
          .when(u <= 0.9994058151824183, 5L)
          .otherwise(6L)
        val means = rep
          .select(col("b"), (w * col("cents")).as("wx"), w.as("w"))
          .groupBy(col("b"))
          .agg(sum(col("wx")).as("swx"), sum(col("w")).as("sw"))
          .select(col("b"), (col("swx").cast("double") / col("sw") /
            lit(100.0)).as("mean_b"))
        val rk = Window.partitionBy(lit(0))
          .orderBy(col("mean_b"), col("b"))
        val ci = means.withColumn("rk", row_number().over(rk))
          .agg(max(when(col("rk") === 2, col("mean_b"))).as("lo"),
               max(when(col("rk") === 63, col("mean_b"))).as("hi"))
        val pt = base.agg(count(lit(1)).as("n_orders"),
          (sum(col("cents")).cast("double") / count(lit(1)) /
            lit(100.0)).as("pm"))
        pt.crossJoin(ci).select(col("n_orders"),
          round(col("pm"), 4).as("point_mean"),
          round(col("lo"), 4).as("ci_lo"),
          round(col("hi"), 4).as("ci_hi"),
          lit(64L).as("b_reps"))
      },
      Some("""WITH rep AS (
             |  SELECT o_orderkey,
             |    CAST(round(o_totalprice*100) AS BIGINT) AS cents,
             |    unnest(range(0, 64)) AS b
             |  FROM orders),
             |h AS (
             |  SELECT b, cents,
             |    (list_reduce(list_transform(range(1, 9),
             |      i -> CAST(strpos('0123456789abcdef',
             |        substr(md5(CAST(o_orderkey AS VARCHAR) || ':boot:'
             |          || CAST(b AS VARCHAR)), i, 1)) - 1 AS DOUBLE)),
             |      (a, x) -> a * 16 + x) + 1) / 4294967296.0 AS u
             |  FROM rep),
             |wt AS (
             |  SELECT b, cents,
             |    CASE WHEN u <= 0.36787944117144233 THEN 0
             |         WHEN u <= 0.7357588823428847 THEN 1
             |         WHEN u <= 0.9196986029286058 THEN 2
             |         WHEN u <= 0.9810118431238463 THEN 3
             |         WHEN u <= 0.9963401531726563 THEN 4
             |         WHEN u <= 0.9994058151824183 THEN 5
             |         ELSE 6 END AS w
             |  FROM h),
             |means AS (
             |  SELECT b, CAST(sum(w * cents) AS DOUBLE)
             |    / CAST(sum(w) AS BIGINT) / 100.0 AS mean_b
             |  FROM wt GROUP BY 1),
             |ci AS (
             |  SELECT max(CASE WHEN rk = 2 THEN mean_b END) AS lo,
             |         max(CASE WHEN rk = 63 THEN mean_b END) AS hi
             |  FROM (SELECT b, mean_b,
             |          row_number() OVER (ORDER BY mean_b, b) AS rk
             |        FROM means)),
             |pt AS (
             |  SELECT count(*) AS n_orders,
             |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
             |      AS DOUBLE) / count(*) / 100.0 AS pm
             |  FROM orders)
             |SELECT n_orders, round(pm, 4) AS point_mean,
             |  round(lo, 4) AS ci_lo, round(hi, 4) AS ci_hi,
             |  CAST(64 AS BIGINT) AS b_reps
             |FROM pt, ci""".stripMargin),
      "Poisson bootstrap CI of the mean: 64 replicates in one " +
        "explode + 64-group agg, md5-inverted Poisson(1) weights, " +
        "order-statistic interval — all exact-integer deterministic"),

    // Columnar-encoding advisor: the layout profiler that tells a
    // writer which parquet encoding each column wants — run-length
    // (consecutive-duplicate runs in the table's key order), distinct
    // cardinality, and average width per column, folded into an
    // RLE / DICT / PLAIN recommendation. Columns unpivot via stack
    // (×5 fan-out, same discipline as the shingle profile) and runs
    // come from one lag window per column partition; values compare
    // as strings (ints render identically cross-engine; the money
    // column is profiled at exact cents). The key-prefix bucket
    // column is the clustered-layout case RLE exists for.
    Q("profile_encoding_advisor",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = load(s, d, "orders").select(col("o_orderkey"),
          col("o_orderstatus"), col("o_orderpriority"),
          col("o_custkey").cast("string").as("ck"),
          expr("CAST(CAST(round(o_totalprice*100) AS BIGINT) AS STRING)")
            .as("ct"),
          expr("CAST(o_orderkey div 1000 AS STRING)").as("kb"))
        val long = base.select(col("o_orderkey"), expr(
          "stack(5, 'o_orderstatus', o_orderstatus, " +
            "'o_orderpriority', o_orderpriority, 'o_custkey', ck, " +
            "'o_totalprice_cents', ct, 'orderkey_bucket', kb) " +
            "AS (col_name, val)"))
        val byKey = Window.partitionBy(col("col_name"))
          .orderBy(col("o_orderkey"))
        val prev = lag(col("val"), 1).over(byKey)
        val runs = long.withColumn("is_new_run",
          when(prev.isNull || prev =!= col("val"), 1L).otherwise(0L))
        runs.groupBy(col("col_name"))
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("val")).as("n_distinct"),
            sum(col("is_new_run")).as("n_runs"),
            round(avg(length(col("val"))), 4).as("avg_width"))
          .withColumn("encoding",
            when(col("n_runs") * 10 <= col("n_rows"), "RLE")
              .when(col("n_distinct") * 10 <= col("n_rows"), "DICT")
              .otherwise("PLAIN"))
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey, o_orderstatus, o_orderpriority,
             |    CAST(o_custkey AS VARCHAR) AS ck,
             |    CAST(CAST(round(o_totalprice*100) AS BIGINT) AS VARCHAR)
             |      AS ct,
             |    CAST(o_orderkey // 1000 AS VARCHAR) AS kb
             |  FROM orders),
             |long AS (
             |  SELECT o_orderkey, 'o_orderstatus' AS col_name,
             |    o_orderstatus AS val FROM base
             |  UNION ALL SELECT o_orderkey, 'o_orderpriority',
             |    o_orderpriority FROM base
             |  UNION ALL SELECT o_orderkey, 'o_custkey', ck FROM base
             |  UNION ALL SELECT o_orderkey, 'o_totalprice_cents', ct
             |    FROM base
             |  UNION ALL SELECT o_orderkey, 'orderkey_bucket', kb
             |    FROM base),
             |runs AS (
             |  SELECT col_name, val,
             |    CASE WHEN lag(val) OVER w IS NULL
             |           OR lag(val) OVER w <> val
             |         THEN 1 ELSE 0 END AS is_new_run
             |  FROM long
             |  WINDOW w AS (PARTITION BY col_name ORDER BY o_orderkey))
             |SELECT col_name, count(*) AS n_rows,
             |  count(DISTINCT val) AS n_distinct,
             |  CAST(sum(is_new_run) AS BIGINT) AS n_runs,
             |  round(avg(length(val)), 4) AS avg_width,
             |  CASE WHEN sum(is_new_run) * 10 <= count(*) THEN 'RLE'
             |       WHEN count(DISTINCT val) * 10 <= count(*) THEN 'DICT'
             |       ELSE 'PLAIN' END AS encoding
             |FROM runs GROUP BY 1""".stripMargin),
      "per-column run/cardinality/width profile → RLE/DICT/PLAIN " +
        "advice; ×5 stack fan-out, one lag window per column"),

    // Functional-dependency discovery (profiling): does determinant →
    // dependent hold, and how badly is it violated? The signal behind
    // key detection, normalization advice, and silent-corruption
    // audits (a mirror where o_orderkey → o_orderstatus stops holding
    // has torn rows). Per candidate pair: one determinant-keyed
    // distinct aggregate → O(groups) stats (violating groups, extra
    // distinct values). Exact count_distinct shuffles each pair once;
    // at 100 TB a profiler sweeps the candidate lattice with HLL
    // sketches first (one pass, mergeable) and pays the exact pass
    // only on near-FDs — the per-pair shape below is that exact pass.
    Q("profile_functional_deps",
      (s, d) => {
        def fd(df: DataFrame, det: String, dep: String): DataFrame =
          df.groupBy(col(det))
            .agg(countDistinct(col(dep)).as("nd"))
            .agg(count(lit(1)).as("n_groups"),
              sum(when(col("nd") > 1, 1L).otherwise(0L))
                .as("violating_groups"),
              sum(col("nd") - 1).as("extra_values"))
            .select(lit(det).as("determinant"), lit(dep).as("dependent"),
              col("n_groups"), col("violating_groups"), col("extra_values"),
              (col("violating_groups") === 0).as("holds"))
        val li = load(s, d, "lineitem")
        val o = load(s, d, "orders")
        fd(li, "l_orderkey", "l_suppkey")
          .unionByName(fd(li, "l_partkey", "l_quantity"))
          .unionByName(fd(o, "o_custkey", "o_orderpriority"))
          .unionByName(fd(o, "o_orderkey", "o_orderstatus"))
      },
      Some("""SELECT 'l_orderkey' AS determinant, 'l_suppkey' AS dependent,
             |  CAST(count(*) AS BIGINT) AS n_groups,
             |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS violating_groups,
             |  CAST(sum(nd - 1) AS BIGINT) AS extra_values,
             |  sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
             |FROM (SELECT l_orderkey, count(DISTINCT l_suppkey) AS nd
             |      FROM lineitem GROUP BY 1) g1
             |UNION ALL
             |SELECT 'l_partkey', 'l_quantity', CAST(count(*) AS BIGINT),
             |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
             |  CAST(sum(nd - 1) AS BIGINT),
             |  sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0
             |FROM (SELECT l_partkey, count(DISTINCT l_quantity) AS nd
             |      FROM lineitem GROUP BY 1) g2
             |UNION ALL
             |SELECT 'o_custkey', 'o_orderpriority', CAST(count(*) AS BIGINT),
             |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
             |  CAST(sum(nd - 1) AS BIGINT),
             |  sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0
             |FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS nd
             |      FROM orders GROUP BY 1) g3
             |UNION ALL
             |SELECT 'o_orderkey', 'o_orderstatus', CAST(count(*) AS BIGINT),
             |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
             |  CAST(sum(nd - 1) AS BIGINT),
             |  sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0
             |FROM (SELECT o_orderkey, count(DISTINCT o_orderstatus) AS nd
             |      FROM orders GROUP BY 1) g4""".stripMargin),
      "approximate-FD audit per candidate pair: violating groups and " +
        "extra distinct values from one keyed distinct agg per pair"),

    // Weighted sampling without replacement (Efraimidis–Spirakis 2006):
    // each row gets key = ln(u)/w with u = (h+1)/2^32 from the md5
    // fingerprint and w its weight; the top-k keys ARE an exact
    // w-weighted sample without replacement. The property that makes
    // it THE distributed weighted sampler: the key is a pure per-row
    // function, so top-k per stratum is one bounded selection — no
    // sequential reservoir state, partials merge (any k-element
    // top-k union re-truncates correctly), replays are idempotent,
    // and a 100 TB corpus samples in a single pass. Hash-derived u
    // replaces the RNG deterministically (the repo-wide planted-
    // randomness rule), so DuckDB replays the identical sample:
    // per-source top-4 documents weighted by n_chars. The ln chain is
    // correctly-rounded single ops in both engines; the displayed key
    // rounds 8 dp, ordering uses the unrounded (bitwise-identical)
    // value with doc_id tie-break.
    Q("pipeline_weighted_sample",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = load(s, d, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"),
            (log((Reconcile.rowFingerprint(col("doc_id")) + 1L) /
              lit(4294967296.0)) / col("n_chars")).as("es_key"))
        docs.withColumn("rk", row_number().over(
            Window.partitionBy(col("source"))
              .orderBy(col("es_key").desc, col("doc_id"))))
          .filter(col("rk") <= 4)
          // + 0.0: a doc whose 32-bit hash lands within ~2e-9 of 2^32
          // makes ln(ratio) round to NEGATIVE zero in one engine and
          // positive zero in the other (hit at sf1) — normalize the
          // sign on both sides (IEEE: -0.0 + 0.0 = +0.0)
          .select(col("source"), col("rk"), col("doc_id"), col("n_chars"),
            (round(col("es_key"), 8) + lit(0.0)).as("es_key"))
      },
      Some("""WITH keyed AS (
             |  SELECT source, doc_id, n_chars,
             |    ln((CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS
             |      VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT) + 1)
             |      / 4294967296.0) / n_chars AS es_key
             |  FROM documents)
             |SELECT source, CAST(rk AS INTEGER) AS rk, doc_id, n_chars,
             |  round(es_key, 8) + 0.0 AS es_key
             |FROM (SELECT *, row_number() OVER (PARTITION BY source
             |        ORDER BY es_key DESC, doc_id) AS rk
             |      FROM keyed)
             |WHERE rk <= 4""".stripMargin),
      "Efraimidis-Spirakis weighted sampling without replacement: " +
        "pure per-row keys from the hash RNG, per-stratum top-4 — " +
        "single-pass, mergeable, no reservoir state"),

    // Length bucketing for batched inference: padding a batch to its
    // longest member wastes compute ∝ Σ(max_len − len), so serving
    // stacks bucket by length first. Equi-DEPTH buckets adapt
    // boundaries to the actual length distribution — the comparison
    // this query quantifies: per-bucket padding waste plus each
    // bucket's share of the single-bucket (no-bucketing) waste, all
    // exact integers. Buckets are VALUE-ATOMIC (every doc of one
    // length shares a bucket — the property a serving stack needs
    // anyway, since the bucket map must be a pure function of length)
    // and the whole computation runs on the value-grain rollup: one
    // map-side-combined shuffle ∝ distinct lengths, then a two-level
    // distributed prefix sum over it — within-block cumulative counts
    // under a PARTITIONED window (block = length DIV 256) plus prior-
    // block offsets from a triangular join on the block rollup (≤
    // (max_len/256)² cheap pairs at aggregate grain) — so no
    // unpartitioned window and no per-row sort exists anywhere in the
    // plan at any scale. bucket(v) = 1 + 8·(#docs shorter than v) DIV
    // total, exact integer arithmetic end to end.
    Q("pipeline_length_buckets",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val lens = persistOnce(load(s, d, "documents")
          .groupBy(col("n_chars")).agg(count(lit(1)).as("cnt"))
          .withColumn("blk", expr("n_chars div 256")))
        val wBlk = Window.partitionBy(col("blk")).orderBy(col("n_chars"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val inBlk = lens.withColumn("cumin", sum(col("cnt")).over(wBlk))
        val blkTot = lens.groupBy(col("blk")).agg(sum(col("cnt")).as("btot"))
        val prior = blkTot.as("a")
          .join(broadcast(blkTot.as("b")), col("b.blk") < col("a.blk"), "left")
          .groupBy(col("a.blk").as("blk"))
          .agg(coalesce(sum(col("b.btot")), lit(0L)).as("prior"))
        val totals = lens.agg(sum(col("cnt")).as("total"),
          max(col("n_chars")).as("gmax"))
        inBlk.join(broadcast(prior), "blk").crossJoin(totals)
          .withColumn("bucket", (lit(1) +
            expr("(8 * (cumin + prior - cnt)) div total")).cast("int"))
          .groupBy(col("bucket"))
          .agg(sum(col("cnt")).as("n_docs"),
            min(col("n_chars")).as("len_min"),
            max(col("n_chars")).as("len_max"),
            sum(col("n_chars") * col("cnt")).as("payload_chars"),
            max(col("gmax")).as("gmax"))
          .select(col("bucket"), col("n_docs"), col("len_min"),
            col("len_max"),
            (col("len_max") * col("n_docs") - col("payload_chars"))
              .as("padding_waste"),
            (col("gmax") * col("n_docs") - col("payload_chars"))
              .as("unbucketed_waste"))
      },
      Some("""WITH lens AS (
             |  SELECT n_chars, count(*) AS cnt, n_chars // 256 AS blk
             |  FROM documents GROUP BY 1),
             |inb AS (SELECT n_chars, cnt, blk,
             |    CAST(sum(cnt) OVER (PARTITION BY blk ORDER BY n_chars
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cumin
             |  FROM lens),
             |bt AS (SELECT blk, sum(cnt) AS btot FROM lens GROUP BY 1),
             |pr AS (SELECT a.blk, CAST(coalesce(sum(b.btot), 0) AS BIGINT)
             |      AS prior
             |  FROM bt a LEFT JOIN bt b ON b.blk < a.blk GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS total,
             |    max(n_chars) AS gmax FROM documents),
             |bkt AS (SELECT n_chars, cnt, gmax,
             |    CAST(1 + (8 * (cumin + prior - cnt)) // total AS INTEGER)
             |      AS bucket
             |  FROM inb JOIN pr USING (blk) CROSS JOIN tot)
             |SELECT bucket, CAST(sum(cnt) AS BIGINT) AS n_docs,
             |  min(n_chars) AS len_min, max(n_chars) AS len_max,
             |  CAST(max(n_chars) * sum(cnt) - sum(n_chars * cnt) AS BIGINT)
             |    AS padding_waste,
             |  CAST(gmax * sum(cnt) - sum(n_chars * cnt) AS BIGINT)
             |    AS unbucketed_waste
             |FROM bkt GROUP BY bucket, gmax""".stripMargin),
      "equi-depth value-atomic length bucketing for batched inference " +
        "via a two-level distributed prefix sum on the length rollup — " +
        "partitioned windows only, per-bucket padding waste vs the " +
        "no-bucketing baseline in exact integers"),

    // Leakage-free target encoding (the CatBoost/feature-pipeline
    // standard): encode a category by the smoothed mean of the target
    // over rows OUTSIDE the row's own fold, so the feature never sees
    // its own label. The out-of-fold mean needs NO second data pass —
    // (Σ_cat − Σ_cat,fold)/(n_cat − n_cat,fold) derives from ONE
    // (category, fold) rollup (map-side combined) plus its own
    // O(cats×folds) re-aggregation and a 1-row global prior; applying
    // the encoding back to rows is then a broadcast map join. Folds
    // come from the md5 hash RNG (replay-stable across epochs —
    // the split_train_test discipline); target kept in exact cents so
    // the only floating ops are the final smoothing chain (single-op
    // IEEE, unrounded hash-match).
    Q("pipeline_target_encoding",
      (s, d) => {
        val o = load(s, d, "orders").select(
          col("o_orderpriority").as("category"),
          round(col("o_totalprice") * 100).cast("long").as("t"),
          (conv(substring(md5(concat(lit("fold|"),
            col("o_orderkey").cast("string"))), 1, 2), 16, 10)
            .cast("int") % 5).as("fold"))
        val cf = o.groupBy(col("category"), col("fold"))
          .agg(count(lit(1)).as("cnt"), sum(col("t")).as("tsum"))
        val c = cf.groupBy(col("category"))
          .agg(sum(col("cnt")).as("ccnt"), sum(col("tsum")).as("csum"))
        val g = cf.agg(sum(col("cnt")).as("gn"), sum(col("tsum")).as("gsum"))
        cf.join(c, "category").crossJoin(broadcast(g))
          .select(col("category"), col("fold"),
            (col("ccnt") - col("cnt")).as("n_oof"),
            (((col("csum") - col("tsum")).cast("double") +
              lit(20.0) * (col("gsum").cast("double") /
                col("gn").cast("double"))) /
              ((col("ccnt") - col("cnt")).cast("double") + lit(20.0)))
              .as("encoded_cents"))
      },
      Some("""WITH o AS (
             |  SELECT o_orderpriority AS category,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS t,
             |    CAST(concat('0x', substr(md5(concat('fold|',
             |      CAST(o_orderkey AS VARCHAR))), 1, 2)) AS INTEGER) % 5
             |      AS fold
             |  FROM orders),
             |cf AS (
             |  SELECT category, fold, CAST(count(*) AS BIGINT) AS cnt,
             |    CAST(sum(t) AS BIGINT) AS tsum
             |  FROM o GROUP BY 1, 2),
             |c AS (
             |  SELECT category, CAST(sum(cnt) AS BIGINT) AS ccnt,
             |    CAST(sum(tsum) AS BIGINT) AS csum
             |  FROM cf GROUP BY 1),
             |g AS (
             |  SELECT CAST(sum(cnt) AS BIGINT) AS gn,
             |    CAST(sum(tsum) AS BIGINT) AS gsum
             |  FROM cf)
             |SELECT category, fold, ccnt - cnt AS n_oof,
             |  (CAST(csum - tsum AS DOUBLE)
             |    + 20.0 * (CAST(gsum AS DOUBLE) / CAST(gn AS DOUBLE)))
             |  / (CAST(ccnt - cnt AS DOUBLE) + 20.0) AS encoded_cents
             |FROM cf JOIN c USING (category) CROSS JOIN g""".stripMargin),
      "out-of-fold target encoding with smoothing prior: one " +
        "(category, fold) rollup + O(cats×folds) re-agg + 1-row global " +
        "prior — no second data pass, md5 folds, exact-cents target"),

    // V-optimal histogram (Jagadish et al., VLDB 1998): the
    // minimum-SSE bucketing an optimizer's selectivity estimator
    // wants, vs the equi-width/equi-depth heuristics elsewhere in the
    // catalog. The data pass is ONE map-side-combined 64-bin moment
    // rollup (n, Σv, Σv² per pre-bin — integer dollars so Σv² stays
    // < 2⁶³ at any SF); the O(B·bins²) dynamic program then runs on
    // that 64-row METADATA, driver-side (the compaction-planner/
    // stats-index grain — never row data). Every SSE and dp cost is
    // the identical IEEE chain in Scala and in the oracle's eight
    // unrolled dp CTEs (ties broken by smallest split point in both),
    // so the chosen boundaries AND their costs hash-match unrounded.
    Q("profile_vopt_histogram",
      (s, d) => {
        import s.implicits._
        val nb = 64
        val bmax = 8
        val vals = persistOnce(load(s, d, "orders").select(
          expr("CAST(round(o_totalprice * 100) AS BIGINT) DIV 100").as("v")))
        val mmr = vals.agg(min(col("v")), max(col("v"))).head()
        val (lo, hi) = (mmr.getLong(0), mmr.getLong(1))
        val cells = vals
          .select(expr(s"((v - ${lo}L) * $nb) DIV ${hi - lo + 1}L").as("b"),
            col("v"))
          .groupBy(col("b"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
            sum(col("v") * col("v")).as("s2"))
          .collect()
          .map(r => r.getLong(0).toInt -> (r.getLong(1), r.getLong(2),
            r.getLong(3))).toMap
        val pn = new Array[Long](nb + 1)
        val p1 = new Array[Long](nb + 1)
        val p2 = new Array[Long](nb + 1)
        for (i <- 1 to nb) {
          val (cn, c1, c2) = cells.getOrElse(i - 1, (0L, 0L, 0L))
          pn(i) = pn(i - 1) + cn; p1(i) = p1(i - 1) + c1
          p2(i) = p2(i - 1) + c2
        }
        def sse(j: Int, i: Int): Double = {
          val nn = pn(i) - pn(j)
          if (nn == 0L) 0.0
          else {
            val s1d = (p1(i) - p1(j)).toDouble
            (p2(i) - p2(j)).toDouble - s1d * s1d / nn
          }
        }
        val inf = Double.MaxValue
        val dp = Array.fill(bmax + 1, nb + 1)(inf)
        val arg = Array.fill(bmax + 1, nb + 1)(-1)
        dp(0)(0) = 0.0
        for (b <- 1 to bmax; i <- b to nb; j <- (b - 1) until i)
          if (dp(b - 1)(j) != inf) {
            val c = dp(b - 1)(j) + sse(j, i)
            if (c < dp(b)(i)) { dp(b)(i) = c; arg(b)(i) = j }
          }
        var i = nb
        val segs = (bmax to 1 by -1).map { b =>
          val j = arg(b)(i); val seg = (b, j, i - 1); i = j; seg
        }.reverse
        segs.map { case (b, jLo, iHi) =>
          (b, jLo, iHi, pn(iHi + 1) - pn(jLo), sse(jLo, iHi + 1))
        }.toDF("bucket", "bin_lo", "bin_hi", "n", "sse")
      },
      Some {
        val dps = (2 to 8).map { b =>
          s"""dp$b AS (SELECT i, cost, path FROM (
             |  SELECT s.i, d.cost + s.sse AS cost,
             |    d.path || ',' || CAST(s.j AS VARCHAR) AS path,
             |    row_number() OVER (PARTITION BY s.i
             |      ORDER BY d.cost + s.sse, s.j) AS rn
             |  FROM dp${b - 1} d JOIN seg s ON s.j = d.i) WHERE rn = 1)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH v AS (
           |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS v
           |  FROM orders),
           |mm AS (SELECT min(v) AS lo, max(v) AS hi FROM v),
           |cells AS (
           |  SELECT ((v - lo) * 64) // (hi - lo + 1) AS b,
           |    CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(v) AS BIGINT) AS s1,
           |    CAST(sum(v * v) AS BIGINT) AS s2
           |  FROM v CROSS JOIN mm GROUP BY 1),
           |grid AS (SELECT unnest(range(0, 65)) AS i),
           |pref AS (
           |  SELECT g.i, CAST(coalesce(sum(c.n), 0) AS BIGINT) AS pn,
           |    CAST(coalesce(sum(c.s1), 0) AS BIGINT) AS p1,
           |    CAST(coalesce(sum(c.s2), 0) AS BIGINT) AS p2
           |  FROM grid g LEFT JOIN cells c ON c.b < g.i GROUP BY g.i),
           |seg AS (
           |  SELECT j.i AS j, i.i AS i, i.pn - j.pn AS n,
           |    CASE WHEN i.pn - j.pn = 0 THEN 0.0
           |         ELSE CAST(i.p2 - j.p2 AS DOUBLE)
           |           - CAST(i.p1 - j.p1 AS DOUBLE)
           |             * CAST(i.p1 - j.p1 AS DOUBLE) / (i.pn - j.pn)
           |    END AS sse
           |  FROM pref j JOIN pref i ON j.i < i.i),
           |dp1 AS (SELECT i, sse AS cost, '0' AS path FROM seg WHERE j = 0),
           |$dps,
           |bnds AS (
           |  SELECT list_append(list_transform(string_split(path, ','),
           |    x -> CAST(x AS INTEGER)), 64) AS l
           |  FROM dp8 WHERE i = 64),
           |out AS (SELECT unnest(range(1, 9)) AS bucket, l FROM bnds)
           |SELECT CAST(bucket AS INTEGER) AS bucket,
           |  CAST(l[bucket] AS INTEGER) AS bin_lo,
           |  CAST(l[bucket + 1] - 1 AS INTEGER) AS bin_hi,
           |  s.n, s.sse
           |FROM out JOIN seg s
           |  ON s.j = l[out.bucket] AND s.i = l[out.bucket + 1]"""
          .stripMargin
      },
      "V-optimal histogram: one 64-bin integer-moment rollup (the only " +
        "data pass) + an O(B·bins²) dp on driver-side metadata — " +
        "boundaries and SSE costs match the oracle's unrolled dp CTEs " +
        "bitwise"),

    // Iterative proportional fitting (raking) — the 2-D generalization
    // of pipeline_domain_mix's single-dimension reweighting: calibrate
    // a subpopulation's cell weights so BOTH marginal distributions
    // (priority × customer segment) match the full population, the
    // survey-statistics standard for dataset reweighting when only
    // marginals are trusted. Everything runs at CELL grain — the data
    // pass is two count rollups; the 3 IPF rounds are joins over the
    // ≤25-row cell table. Each margin total folds through a
    // cumulative window in one deterministic order (max of a
    // nonneg-cumsum = the ordered total — the EB-shrinkage
    // discipline), so the multiplicative weight chain hash-matches
    // unrounded; the residual row-margin ratio is emitted per cell to
    // show convergence.
    Q("pipeline_raking_weights",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val o = load(s, d, "orders").select(
          col("o_orderpriority").as("p"), (col("o_custkey") % 5).as("g"),
          col("o_orderstatus").as("st"))
        val full = persistOnce(o.groupBy(col("p"), col("g"))
          .agg(count(lit(1)).as("t")))
        val tp = full.groupBy(col("p")).agg(sum(col("t")).as("tp"))
        val tg = full.groupBy(col("g")).agg(sum(col("t")).as("tg"))
        // localCheckpoint each half-iteration: w_{i+1} references w_i
        // TWICE (once directly, once through its margin), so an
        // unbroken lineage doubles per half-iteration — 2^7 copies of
        // the base rollup by the final join (measured: ~110 s at
        // sf0.01, a 2.9 MiB task binary, planning + 64 redundant
        // scans; data-size-independent). Truncating the ≤25-row cell
        // table per step makes each iteration two tiny joins over a
        // LogicalRDD — same values, same ordered-fold margins.
        //
        // Superseded checkpoints unpersist as soon as the next one is
        // materialized (ADVICE r13): each invocation otherwise left 8
        // orphan cached RDDs in the session for its lifetime. Only the
        // FINAL checkpoint stays (the returned plan reads it lazily).
        // localCheckpoint remains non-recoverable under executor loss
        // — fine under the repo's local[N] contract; a cluster
        // deployment with dynamic allocation would use checkpoint().
        def unpersistCkpt(df: DataFrame): Unit =
          df.queryExecution.analyzed.collectLeaves().foreach {
            case lr: org.apache.spark.sql.execution.LogicalRDD =>
              lr.rdd.unpersist(blocking = false); ()
            case _ => ()
          }
        var w = o.filter(col("st") === "F").groupBy(col("p"), col("g"))
          .agg(count(lit(1)).as("n")).withColumn("w", lit(1.0))
          .localCheckpoint()
        def marginOf(df: DataFrame, key: String, ord: String) = df
          .withColumn("nw", col("n") * col("w"))
          .withColumn("cum", sum(col("nw")).over(
            Window.partitionBy(col(key)).orderBy(col(ord))
              .rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col(key)).agg(max(col("cum")).as("m"))
        for (_ <- 1 to 3) {
          val prev1 = w
          w = w.join(marginOf(w, "p", "g"), "p").join(tp, "p")
            .withColumn("w",
              col("w") * (col("tp").cast("double") / col("m")))
            .select(col("p"), col("g"), col("n"), col("w"))
            .localCheckpoint()
          unpersistCkpt(prev1)
          val prev2 = w
          w = w.join(marginOf(w, "g", "p"), "g").join(tg, "g")
            .withColumn("w",
              col("w") * (col("tg").cast("double") / col("m")))
            .select(col("p"), col("g"), col("n"), col("w"))
            .localCheckpoint()
          unpersistCkpt(prev2)
        }
        w.join(marginOf(w, "p", "g"), "p").join(tp, "p")
          .select(col("p"), col("g"), col("n"), col("w").as("weight"),
            (col("m") / col("tp").cast("double")).as("row_margin_ratio"))
      },
      Some {
        def margin(src: String, key: String, ord: String, out: String) =
          s"""$out AS (
             |  SELECT $key, max(cum) AS m FROM (
             |    SELECT $key, sum(n * w) OVER (PARTITION BY $key
             |      ORDER BY $ord ROWS UNBOUNDED PRECEDING) AS cum
             |    FROM $src) GROUP BY 1)""".stripMargin
        val iters = (1 to 3).map { i =>
          margin(s"w${i - 1}", "p", "g", s"rm$i") + ",\n" +
            s"""wr$i AS (
               |  SELECT x.p, x.g, x.n,
               |    x.w * (CAST(tp.tp AS DOUBLE) / rm$i.m) AS w
               |  FROM w${i - 1} x JOIN rm$i USING (p) JOIN tp USING (p)),
               |""".stripMargin +
            margin(s"wr$i", "g", "p", s"cm$i") + ",\n" +
            s"""w$i AS (
               |  SELECT x.p, x.g, x.n,
               |    x.w * (CAST(tg.tg AS DOUBLE) / cm$i.m) AS w
               |  FROM wr$i x JOIN cm$i USING (g) JOIN tg USING (g))"""
              .stripMargin
        }.mkString(",\n")
        s"""WITH o AS (
           |  SELECT o_orderpriority AS p, o_custkey % 5 AS g,
           |    o_orderstatus AS st
           |  FROM orders),
           |full_pop AS (
           |  SELECT p, g, CAST(count(*) AS BIGINT) AS t
           |  FROM o GROUP BY 1, 2),
           |tp AS (SELECT p, CAST(sum(t) AS BIGINT) AS tp
           |       FROM full_pop GROUP BY 1),
           |tg AS (SELECT g, CAST(sum(t) AS BIGINT) AS tg
           |       FROM full_pop GROUP BY 1),
           |w0 AS (
           |  SELECT p, g, CAST(count(*) AS BIGINT) AS n, 1.0 AS w
           |  FROM o WHERE st = 'F' GROUP BY 1, 2),
           |$iters,
           |${margin("w3", "p", "g", "rmf")}
           |SELECT x.p, x.g, x.n, x.w AS weight,
           |  rmf.m / CAST(tp.tp AS DOUBLE) AS row_margin_ratio
           |FROM w3 x JOIN rmf USING (p) JOIN tp USING (p)""".stripMargin
      },
      "IPF raking to two marginal distributions: cell-grain iterations " +
        "(≤25 rows) after two count rollups; ordered-fold margins keep " +
        "the multiplicative weight chain deterministic — the " +
        "survey-calibration reweighting operator"),

    // Quantile normalization — the batch-effect correction ML
    // preprocessing applies when per-source score scales drift (one
    // crawl's length distribution vs another's): each doc's
    // WITHIN-LANG percentile is mapped back through the GLOBAL
    // inverse ECDF, so every language's scores land on one common
    // scale while preserving within-lang order. Nothing touches a
    // global per-row sort: the reference distribution is built
    // aggregate-first (distinct-score rollup → one cumulative window
    // over O(score domain) rows → a 101-point inverse-ECDF grid by
    // rank arithmetic), per-doc percentiles are integer round-half-up
    // arithmetic over (rank, group size) from one lang-keyed window
    // — ((rk−1)·200 + (nl−1)) DIV (2(nl−1)) — no float rounding at
    // the bucket edge (Spark HALF_UP vs DuckDB rounding on a .5
    // double would diverge), and the grid joins back broadcast.
    // Type-1 (no-interpolation) quantiles keep every value an
    // integer actually present in the corpus — exact hash compare.
    Q("pipeline_quantile_normalize",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = persistOnce(load(s, d, "documents")
          .select(col("lang"), col("doc_id"), col("n_chars").as("score")))
        val nRow = docs.agg(count(lit(1)).as("n"))
        val byLang = Window.partitionBy(col("lang"))
        val ranked = docs
          .withColumn("rk",
            row_number().over(byLang.orderBy(col("score"), col("doc_id")))
              .cast("long"))
          .withColumn("nl", count(lit(1)).over(byLang))
          .withColumn("j", when(col("nl") === 1, lit(0L))
            .otherwise(expr("((rk - 1) * 200 + (nl - 1)) DIV (2 * (nl - 1))")))
        val cum = docs.groupBy(col("score")).agg(count(lit(1)).as("c"))
          .withColumn("cum", sum(col("c")).over(
            Window.partitionBy(lit(0)).orderBy(col("score"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val grid = nRow
          .select(explode(sequence(lit(0L), lit(100L))).as("j"), col("n"))
          .join(cum, col("cum") >= expr("j * (n - 1) DIV 100 + 1"))
          .groupBy(col("j")).agg(min(col("score")).as("normalized"))
        ranked.join(broadcast(grid), "j")
          .select(col("lang"), col("doc_id"), col("score"),
            col("j").as("pct_bucket"), col("normalized"))
      },
      Some("""WITH s AS (
             |  SELECT lang, doc_id, n_chars AS score FROM documents),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
             |ranked AS (
             |  SELECT lang, doc_id, score,
             |    CAST(row_number() OVER (PARTITION BY lang
             |      ORDER BY score, doc_id) AS BIGINT) AS rk,
             |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS nl
             |  FROM s),
             |j AS (
             |  SELECT lang, doc_id, score,
             |    CASE WHEN nl = 1 THEN CAST(0 AS BIGINT)
             |         ELSE ((rk - 1) * 200 + (nl - 1)) // (2 * (nl - 1))
             |    END AS j
             |  FROM ranked),
             |dv AS (SELECT score, count(*) AS c FROM s GROUP BY 1),
             |cumv AS (
             |  SELECT score, CAST(sum(c) OVER (ORDER BY score
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS cum
             |  FROM dv),
             |grid AS (
             |  SELECT g.j, min(score) AS normalized
             |  FROM (SELECT unnest(range(0, 101)) AS j) g
             |  CROSS JOIN nn
             |  JOIN cumv ON cum >= g.j * (n - 1) // 100 + 1
             |  GROUP BY 1)
             |SELECT lang, doc_id, score, j.j AS pct_bucket, normalized
             |FROM j JOIN grid ON j.j = grid.j""".stripMargin),
      "quantile normalization onto the global scale: within-lang " +
        "integer percentile arithmetic (one lang-keyed window) mapped " +
        "through a 101-point inverse-ECDF grid built aggregate-first " +
        "— no global row sort, type-1 values exact"),

    // Source ablation (leave-one-source-out contribution): which crawl
    // sources PULL the corpus metric up or down? For a mean-based
    // metric the LOO value needs no second pass — drop source s and
    // the mean is (S − S_s)/(N − N_s), all from ONE source rollup plus
    // a 1-row broadcast of the global sums; the contribution is
    // metric_all − metric_loo (positive = the source improves the
    // corpus). This is the cheap end of the data-valuation spectrum
    // (data Shapley's first-order term for additive metrics) — the
    // triage a curation pipeline runs before paying for per-source
    // retraining. Integer sums end-to-end; each reported value is one
    // division (or a subtraction of two single-division doubles) —
    // bitwise deterministic, unrounded.
    Q("pipeline_source_ablation",
      (s, d) => {
        val bySrc = load(s, d, "documents")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sc"))
        val tot = bySrc.agg(sum(col("n_docs")).as("n"),
          sum(col("sc")).as("st"))
        bySrc.crossJoin(broadcast(tot))
          .select(col("source"), col("n_docs"),
            (col("st").cast("double") / col("n")).as("mean_all"),
            ((col("st") - col("sc")).cast("double") /
              (col("n") - col("n_docs"))).as("mean_loo"),
            (col("st").cast("double") / col("n") -
              (col("st") - col("sc")).cast("double") /
                (col("n") - col("n_docs"))).as("contribution"))
      },
      Some("""WITH bysrc AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |         CAST(sum(n_chars) AS BIGINT) AS sc
             |  FROM documents GROUP BY 1),
             |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n,
             |    CAST(sum(sc) AS BIGINT) AS st FROM bysrc)
             |SELECT source, n_docs,
             |  CAST(st AS DOUBLE) / n AS mean_all,
             |  CAST(st - sc AS DOUBLE) / (n - n_docs) AS mean_loo,
             |  CAST(st AS DOUBLE) / n -
             |    CAST(st - sc AS DOUBLE) / (n - n_docs) AS contribution
             |FROM bysrc CROSS JOIN tot""".stripMargin),
      "leave-one-source-out corpus ablation: per-source contribution " +
        "to the corpus mean from one rollup + a 1-row broadcast — " +
        "first-order data valuation, integer sums, unrounded " +
        "single-division doubles"),

    // DSIR — Data Selection via Importance Resampling (Xie et al.
    // 2023), the standard recipe for tilting a raw crawl toward a
    // target domain: hash every token into a fixed 64-bucket feature
    // space, fit smoothed bucket distributions on the target slice
    // (doc_id % 23 == 0 stands in for the in-domain sample) and on the
    // raw corpus, and score each document with its summed
    // log-importance weight Σ n_b·(ln p_t[b] − ln p_r[b]); the top
    // slice is what you keep. The hashed feature space is the scale
    // trick: the model is 64 rows (broadcast-literal at any corpus
    // size), scoring is one token-grain broadcast join + one per-doc
    // sum with map-side combine, and selection is TakeOrderedAndProject
    // — the corpus never sorts globally. Weight sums are rounded 4dp
    // (order-unstable double sums per the catalog contract) with
    // doc_id tie-breaks on the top-k cut.
    Q("pipeline_dsir_weights",
      (s, d) => {
        val tok = persistOnce(load(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .select(col("doc_id"),
            (conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long")
              % 64).as("bkt")))
        val raw = tok.groupBy(col("bkt")).agg(count(lit(1)).as("cr"))
        val tgt = tok.filter(col("doc_id") % 23 === 0)
          .groupBy(col("bkt")).agg(count(lit(1)).as("ct"))
        val tots = tok.agg(count(lit(1)).as("tcr"),
          sum(when(col("doc_id") % 23 === 0, 1L).otherwise(0L)).as("tct"))
        val model = raw.join(tgt, Seq("bkt"), "left").crossJoin(tots)
          .select(col("bkt"),
            (log((coalesce(col("ct"), lit(0L)).cast("double") + lit(0.5)) /
              (col("tct").cast("double") + lit(32.0))) -
              log((col("cr").cast("double") + lit(0.5)) /
                (col("tcr").cast("double") + lit(32.0)))).as("lw"))
        tok.join(broadcast(model), Seq("bkt"))
          .groupBy(col("doc_id"))
          .agg(round(sum(col("lw")), 4).as("logw"),
            count(lit(1)).as("n_tokens"))
          .orderBy(col("logw").desc, col("doc_id"))
          .limit(200)
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    CAST(CAST(concat('0x', substr(md5(w), 1, 8)) AS UBIGINT)
             |      AS BIGINT) % 64 AS bkt
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |        FROM documents)),
             |raw AS (SELECT bkt, CAST(count(*) AS BIGINT) AS cr
             |        FROM tok GROUP BY 1),
             |tgt AS (SELECT bkt, CAST(count(*) AS BIGINT) AS ct
             |        FROM tok WHERE doc_id % 23 = 0 GROUP BY 1),
             |tots AS (
             |  SELECT CAST(count(*) AS BIGINT) AS tcr,
             |    CAST(sum(CASE WHEN doc_id % 23 = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS tct
             |  FROM tok),
             |model AS (
             |  SELECT raw.bkt,
             |    ln((CAST(coalesce(ct, 0) AS DOUBLE) + 0.5) /
             |       (CAST(tct AS DOUBLE) + 32.0)) -
             |    ln((CAST(cr AS DOUBLE) + 0.5) /
             |       (CAST(tcr AS DOUBLE) + 32.0)) AS lw
             |  FROM raw LEFT JOIN tgt ON raw.bkt = tgt.bkt
             |  CROSS JOIN tots)
             |SELECT doc_id, round(sum(lw), 4) AS logw,
             |  CAST(count(*) AS BIGINT) AS n_tokens
             |FROM tok JOIN model ON tok.bkt = model.bkt
             |GROUP BY 1
             |ORDER BY logw DESC, doc_id
             |LIMIT 200""".stripMargin),
      "DSIR importance weights: 64-bucket hashed token features, " +
        "smoothed target/raw bucket models (64-row broadcast), " +
        "map-side log-ratio scoring, TakeOrderedAndProject selection"))
}
