package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.Tables.load
import graft.functions.Packing
import graft.functions.TextFunctions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between raw ingest and tokenization (SURVEY §2.10 north_star):
  * repetition-based quality metrics (Gopher-style), PII redaction,
  * benchmark decontamination, greedy sequence packing, and
  * temperature-based mixture reweighting.
  *
  * Scale notes (100 TB):
  *   - Repetition metrics and PII redaction are pure per-row Column
  *     algebra — codegen'd linear scans, no shuffle. The top-bigram
  *     multiplicity uses the sorted-run trick (O(n log n) per doc), not
  *     count-per-distinct (O(n²) on long documents).
  *   - Decontamination joins the corpus against the eval set's n-grams:
  *     the eval side is small by construction, so it broadcasts — no
  *     shuffle of the 100 TB side; distinct-shingling both sides first
  *     bounds the join input by gram cardinality, and at extreme scale
  *     the broadcast degrades gracefully to a bloom-filter pre-filter
  *     with identical semantics (the join re-verifies).
  *   - Packing is sequential per group (see [[graft.functions.Packing]])
  *     — one forward scan per group, O(1) task state.
  *   - Temperature reweighting aggregates to #groups rows; the total
  *     rides along as a broadcast one-row cross join, never a driver
  *     collect.
  */
object CurationQueries {

  /** 1..n as an array column, empty when n < 1 (`sequence` would count
    * DOWN for n = 0 — the same trap charNgrams documents). */
  private def idxSeq(n: Column): Column =
    when(n >= 1, sequence(lit(1), n)).otherwise(array().cast("array<int>"))

  // deterministic synthetic PII (both engines construct the identical
  // string, so the redaction regexes are genuinely exercised): the
  // testdata corpus itself is PII-free word soup
  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val phoneRe = "\\b\\d{3}-\\d{4}\\b"

  def queries: Seq[Q] = Seq(
    // Gopher-style repetition signals per document. All three are
    // ratios of small exact integers — bitwise-identical doubles in
    // both engines, no rounding needed.
    Q("text_repetition",
      (s, d) => {
        // staged projections: ws / sorted-sg are multiply-referenced
        // non-trivial aliases, so CollapseProject materializes each ONCE
        // per row instead of re-inlining the split/sort at every use —
        // and shingling runs over the ws COLUMN so tokenization isn't
        // re-evaluated inside the transform lambda (O(n²) otherwise)
        val base = load(s, d, "documents")
          .select(col("doc_id"), tokens(col("text")).as("ws"))
          .select(col("doc_id"), col("ws"),
            sort_array(wordShinglesFromTokens(col("ws"), 2)).as("sg"))
        val ws = col("ws")
        val sg = col("sg")
        val adj = size(filter(idxSeq(size(ws) - 1), i =>
          try_element_at(ws, i) === try_element_at(ws, i + 1)))
        base.select(
          col("doc_id"),
          (lit(1d) - size(array_distinct(ws)).cast("double") / size(ws))
            .as("dup_token_frac"),
          (adj.cast("double") / (size(ws) - 1)).as("adj_repeat_frac"),
          (maxRunLengthPreSorted(sg).cast("double") / size(sg))
            .as("top_bigram_frac"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |b AS (SELECT doc_id, ws,
             |        list_sort(list_transform(generate_series(1, len(ws) - 1),
             |          i -> ws[i] || ' ' || ws[i + 1])) AS sg
             |      FROM t),
             |r AS (SELECT doc_id, ws, sg,
             |        list_filter(generate_series(1, len(sg)),
             |          i -> i = 1 OR sg[i] != sg[i - 1]) AS starts,
             |        list_filter(generate_series(1, len(sg)),
             |          i -> i = len(sg) OR sg[i] != sg[i + 1]) AS ends
             |      FROM b)
             |SELECT doc_id,
             |  1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS dup_token_frac,
             |  CAST(len(list_filter(generate_series(1, len(ws) - 1),
             |    i -> ws[i] = ws[i + 1])) AS DOUBLE) / (len(ws) - 1) AS adj_repeat_frac,
             |  CAST(list_max(list_transform(generate_series(1, len(starts)),
             |    j -> ends[j] - starts[j] + 1)) AS DOUBLE) / len(sg) AS top_bigram_frac
             |FROM r""".stripMargin),
      "Gopher-style repetition metrics: dup-token / adjacent-repeat / top-bigram fractions"),

    // PII redaction over customer contact notes: counts each PII class,
    // then redacts email → IP → phone (orderings chosen so no pattern
    // can match inside another's replacement). RE2-safe regexes (no
    // lookaround) per the oracle contract.
    Q("text_pii_redact",
      (s, d) => {
        val note = concat(
          col("c_name"), lit(" phone 555-"),
          lpad(pmod(col("c_custkey"), lit(10000)).cast("string"), 4, "0"),
          lit(" email c"), col("c_custkey").cast("string"),
          lit("@shop.example.com ip 10.0."),
          pmod(col("c_custkey"), lit(256)).cast("string"), lit("."),
          pmod(col("c_custkey") * 7, lit(256)).cast("string"))
        load(s, d, "customer").select(
          col("c_custkey"),
          regexp_replace(
            regexp_replace(
              regexp_replace(note, lit(emailRe), lit("[EMAIL]")),
              lit(ipRe), lit("[IP]")),
            lit(phoneRe), lit("[PHONE]")).as("redacted"),
          size(regexp_extract_all(note, lit(emailRe), lit(0))).as("n_emails"),
          size(regexp_extract_all(note, lit(ipRe), lit(0))).as("n_ips"),
          size(regexp_extract_all(note, lit(phoneRe), lit(0))).as("n_phones"))
      },
      Some("""WITH n AS (
             |  SELECT c_custkey,
             |    c_name || ' phone 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
             |      || ' email c' || CAST(c_custkey AS VARCHAR)
             |      || '@shop.example.com ip 10.0.'
             |      || CAST(c_custkey % 256 AS VARCHAR) || '.'
             |      || CAST(c_custkey * 7 % 256 AS VARCHAR) AS note
             |  FROM customer)
             |SELECT c_custkey,
             |  regexp_replace(regexp_replace(regexp_replace(note,
             |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
             |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
             |    '\b\d{3}-\d{4}\b', '[PHONE]', 'g') AS redacted,
             |  CAST(len(regexp_extract_all(note, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_emails,
             |  CAST(len(regexp_extract_all(note, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ips,
             |  CAST(len(regexp_extract_all(note, '\b\d{3}-\d{4}\b')) AS INTEGER) AS n_phones
             |FROM n""".stripMargin),
      "PII detection + redaction (email/IPv4/phone) with per-class counts"),

    // Corpus-frequency boilerplate removal: a banner paragraph planted
    // into every doc_id % 7 == 0 document crosses the minDocs=10
    // threshold (71+ docs at every SF) and is stripped; every document's
    // own single-paragraph prose stays below it (max natural full-text
    // dup in testdata is 2), so the cleaned corpus must hash-equal the
    // ORIGINAL documents table. Detection shuffles 8-byte paragraph
    // hashes only; cleanup is map-only against the broadcast-literal
    // boilerplate set — corpus text never shuffles.
    Q("text_boilerplate_strip",
      (s, d) => {
        val planted = load(s, d, "documents").withColumn("text",
          when(col("doc_id") % 7 === 0,
            concat(col("text"),
              lit("\n\nsubscribe to our newsletter for daily updates")))
            .otherwise(col("text")))
        graft.functions.Boilerplate
          .strip(planted, "text", "doc_id", minDocs = 10)
          .select(col("doc_id"), col("text"), col("n_removed"))
      },
      Some("""SELECT doc_id, text,
             |  CAST(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS BIGINT)
             |    AS n_removed
             |FROM documents""".stripMargin),
      "cross-document boilerplate paragraphs stripped by corpus " +
        "frequency; per-doc prose intact (hash-only detection shuffle, " +
        "map-only cleanup)"),

    // CCNet-style unigram LM scoring: bits-per-token surprisal under a
    // model fit on the corpus itself. maxVocab far exceeds the testdata
    // vocabulary, so the truncated model is exact and the oracle can
    // refit the identical model in SQL (the OOV path is spec-tested).
    // Sum of ~30 log2 terms → 4 dp rounding absorbs engine ulp drift.
    Q("text_lm_score",
      (s, d) => {
        val docs = load(s, d, "documents")
        val model = graft.functions.LmScore.fit(docs, "text")
        docs.select(col("doc_id"),
          round(graft.functions.LmScore.bitsPerToken(col("text"), model), 4)
            .as("bits_per_token"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |  FROM documents),
             |freq AS (
             |  SELECT w, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY w),
             |tot AS (SELECT sum(c) AS t FROM freq)
             |SELECT doc_id,
             |  round(-sum(log2(c / t)) / count(*), 4) AS bits_per_token
             |FROM tok JOIN freq USING (w) CROSS JOIN tot
             |GROUP BY doc_id""".stripMargin),
      "unigram LM bits-per-token (CCNet-style quality signal): " +
        "vocab-sized fit exchange, map-only broadcast-literal scoring"),

    // Held-out variant: fit on even doc_ids, score the odd ones — every
    // token absent from the fitting half scores through the OOV floor
    // (0.5 of a count at the fitted total), so the floor semantics are
    // hash-oracled, not just spec-tested.
    Q("text_lm_score_heldout",
      (s, d) => {
        val docs = load(s, d, "documents")
        val model = graft.functions.LmScore.fit(
          docs.filter(col("doc_id") % 2 === 0), "text")
        docs.filter(col("doc_id") % 2 === 1).select(col("doc_id"),
          round(graft.functions.LmScore.bitsPerToken(col("text"), model), 4)
            .as("bits_per_token"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |  FROM documents),
             |fit AS (
             |  SELECT w, CAST(count(*) AS DOUBLE) AS c FROM tok
             |  WHERE doc_id % 2 = 0 GROUP BY w),
             |tot AS (SELECT sum(c) AS t FROM fit)
             |SELECT doc_id,
             |  round(-sum(log2(coalesce(c, 0.5) / t)) / count(*), 4)
             |    AS bits_per_token
             |FROM tok LEFT JOIN fit USING (w) CROSS JOIN tot
             |WHERE doc_id % 2 = 1
             |GROUP BY doc_id""".stripMargin),
      "held-out unigram LM scoring: unseen tokens hit the OOV floor — " +
        "the floor semantics hash-checked against an independent refit"),

    // Benchmark decontamination: flag training documents sharing any
    // 3-gram shingle with the (pretend) eval set — doc_id % 50 == 0.
    // The eval side is tiny → broadcast join; n_shared_grams /
    // n_eval_docs quantify the contamination.
    Q("dedup_decontaminate",
      (s, d) => {
        // tokens pre-projected so the shingle transform is O(n) per doc
        val g = load(s, d, "documents")
          .select(col("doc_id"), tokens(col("text")).as("w"))
          .select(col("doc_id"),
            explode(array_distinct(wordShinglesFromTokens(col("w"), 3))).as("gram"))
        val evalG = g.filter(col("doc_id") % 50 === 0)
          .withColumnRenamed("doc_id", "eval_id")
        val trainG = g.filter(col("doc_id") % 50 =!= 0)
        trainG.join(broadcast(evalG), Seq("gram"))
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("gram")).as("n_shared_grams"),
            countDistinct(col("eval_id")).as("n_eval_docs"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |    list_distinct(list_transform(generate_series(1, len(w) - 2),
             |      i -> array_to_string(w[i:i+2], ' '))) AS g
             |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
             |e AS (SELECT doc_id AS eval_id, unnest(g) AS gram FROM t WHERE doc_id % 50 = 0),
             |tr AS (SELECT doc_id, unnest(g) AS gram FROM t WHERE doc_id % 50 != 0)
             |SELECT tr.doc_id, count(DISTINCT tr.gram) AS n_shared_grams,
             |  count(DISTINCT e.eval_id) AS n_eval_docs
             |FROM tr JOIN e ON tr.gram = e.gram
             |GROUP BY tr.doc_id""".stripMargin),
      "eval-set decontamination: 3-gram overlap against a broadcast benchmark set"),

    // Greedy first-fit-sequential packing of documents into 128-token
    // context windows, per language, in doc_id order. The Spark side is
    // the typed mapPartitions scan; the oracle replays the identical
    // recurrence as a recursive CTE.
    Q("pipeline_pack_sequences",
      (s, d) => Packing.packGreedy(
        load(s, d, "documents")
          .select(col("lang"), col("doc_id"),
            size(tokens(col("text"))).as("n_tokens")),
        groupCol = "lang", idCol = "doc_id", nTokensCol = "n_tokens",
        ctx = 128).toDF(),
      Some("""WITH RECURSIVE t AS (
             |  SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
             |         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
             |  FROM documents),
             |p AS (
             |  SELECT lang, doc_id, n, rn, CAST(0 AS BIGINT) AS bin, n AS fill
             |  FROM t WHERE rn = 1
             |  UNION ALL
             |  SELECT t.lang, t.doc_id, t.n, t.rn,
             |         CASE WHEN p.fill + t.n > 128 THEN p.bin + 1 ELSE p.bin END,
             |         CASE WHEN p.fill + t.n > 128 THEN t.n ELSE p.fill + t.n END
             |  FROM p JOIN t ON t.lang = p.lang AND t.rn = p.rn + 1)
             |SELECT doc_id, lang, bin AS bin_id, fill AS fill_after FROM p""".stripMargin),
      "greedy sequence packing into 128-token bins per language (typed mapPartitions)"),

    // Composite flagship: the curation chain a training-data job runs —
    // quality gate → eval-set decontamination (broadcast benchmark
    // grams) → greedy packing into context windows — declared as ONE
    // plan (filters collapse into the scan, the decontamination side
    // broadcasts, packing is the typed tail). The oracle chains the
    // same CTEs and replays the packing recurrence.
    //
    // ONE corpus pass (r14, guide §1.2 step 1 / §2.3): the original
    // shape evaluated tokenize+quality over the train side TWICE —
    // once to explode grams for the contamination join, once more to
    // project (lang, doc_id, n_tokens) for the anti-join — because the
    // two branches were separate subtrees of one plan. Restructured:
    // explode_outer keeps gram-less docs alive in the SAME exploded
    // frame, the broadcast eval-gram join runs as a LEFT join, and a
    // doc-grain max(hit) aggregate (map-side partial — gram rows
    // collapse to doc rows before the exchange) decides contamination.
    // A doc survives iff no gram matched — exactly the old anti-join
    // set, oracle unchanged and hash-green.
    Q("pipeline_curate_pack",
      (s, d) => {
        val docs = load(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("text"),
            tokens(col("text")).as("w"))
        val train = docs.filter(qualityScore(col("text")) > 0.5 &&
          col("doc_id") % 50 =!= 0)
        val evalGrams = docs.filter(col("doc_id") % 50 === 0)
          .select(explode(array_distinct(
            wordShinglesFromTokens(col("w"), 3))).as("gram"))
          .distinct()
        val enriched = train.select(col("lang"), col("doc_id"),
          size(col("w")).as("n_tokens"),
          explode_outer(array_distinct(
            wordShinglesFromTokens(col("w"), 3))).as("gram"))
        val clean = enriched
          .join(broadcast(evalGrams.withColumn("_hit", lit(true))),
            Seq("gram"), "left")
          .groupBy(col("lang"), col("doc_id"), col("n_tokens"))
          .agg(max(col("_hit")).as("_contaminated"))
          .filter(col("_contaminated").isNull)
          .select(col("lang"), col("doc_id"), col("n_tokens"))
        Packing.packGreedy(clean, "lang", "doc_id", "n_tokens", ctx = 256)
          .toDF().select(col("doc_id"), col("lang"), col("bin_id"))
      },
      Some("""WITH RECURSIVE t0 AS (
             |  SELECT doc_id, lang, text, string_split(text, ' ') AS w FROM documents),
             |q AS (
             |  SELECT doc_id, lang, w FROM t0
             |  WHERE (least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
             |   + least((len(list_filter(w,
             |        x -> x IN ('the','a','an','of','and','or','to','in','is','on')))
             |      / len(w)) * 5.0, 1.0)
             |   + greatest(0.0, 1.0 - (CAST(length(text) -
             |        length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
             |      / length(text)) * 10.0)) / 3.0 > 0.5
             |   AND doc_id % 50 != 0),
             |eg AS (
             |  SELECT DISTINCT unnest(list_distinct(list_transform(
             |    generate_series(1, len(w) - 2),
             |    i -> array_to_string(w[i:i+2], ' ')))) AS gram
             |  FROM t0 WHERE doc_id % 50 = 0),
             |tg AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(
             |    generate_series(1, len(w) - 2),
             |    i -> array_to_string(w[i:i+2], ' ')))) AS gram
             |  FROM q),
             |bad AS (SELECT DISTINCT tg.doc_id FROM tg JOIN eg ON tg.gram = eg.gram),
             |clean AS (
             |  SELECT q.lang, q.doc_id, CAST(len(q.w) AS BIGINT) AS n,
             |    row_number() OVER (PARTITION BY q.lang ORDER BY q.doc_id) AS rn
             |  FROM q ANTI JOIN bad ON q.doc_id = bad.doc_id),
             |p AS (
             |  SELECT lang, doc_id, n, rn, CAST(0 AS BIGINT) AS bin, n AS fill
             |  FROM clean WHERE rn = 1
             |  UNION ALL
             |  SELECT c.lang, c.doc_id, c.n, c.rn,
             |         CASE WHEN p.fill + c.n > 256 THEN p.bin + 1 ELSE p.bin END,
             |         CASE WHEN p.fill + c.n > 256 THEN c.n ELSE p.fill + c.n END
             |  FROM p JOIN clean c ON c.lang = p.lang AND c.rn = p.rn + 1)
             |SELECT doc_id, lang, bin AS bin_id FROM p""".stripMargin),
      "composite curation flagship: quality gate → decontaminate → pack"),

    // Typed-Aggregator surface (SURVEY §2.10): bounded per-group top-k
    // with map-side partial aggregation — shuffle ≤ k rows per group
    // per map partition, vs collect_list's unbounded buffer or a window
    // sort's full-group shuffle. Oracle = the window formulation (same
    // total order), so the Aggregator's merge logic is hash-checked.
    Q("agg_topk_typed",
      (s, d) => graft.functions.TopK.perGroup(
        load(s, d, "orders"), Seq("o_orderpriority"),
        scoreCol = "o_totalprice", idCol = "o_orderkey", k = 3),
      Some("""SELECT o_orderpriority, CAST(rn - 1 AS INTEGER) AS rank,
             |  o_totalprice AS score, CAST(o_orderkey AS BIGINT) AS id
             |FROM (SELECT o_orderpriority, o_totalprice, o_orderkey,
             |        row_number() OVER (PARTITION BY o_orderpriority
             |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |      FROM orders)
             |WHERE rn <= 3""".stripMargin),
      "typed Aggregator top-k per group (bounded buffer, partial-agg)"),

    // Temperature-based mixture reweighting (alpha = 0.5 via sqrt —
    // correctly-rounded IEEE, bitwise identical across engines; only
    // the 5-term normalizer sum is order-unstable, hence the rounding).
    Q("sample_temperature",
      (s, d) => {
        val c = load(s, d, "documents").groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"))
        val z = c.agg(sum(sqrt(col("n_docs"))).as("z"))
        c.crossJoin(broadcast(z)).select(
          col("lang"), col("n_docs"),
          round(sqrt(col("n_docs")) / col("z"), 4).as("weight"),
          round(sqrt(col("n_docs")) / col("z") * 10000, 1).as("expected_10k"))
      },
      Some("""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
             |z AS (SELECT sum(sqrt(n_docs)) AS z FROM c)
             |SELECT lang, n_docs, round(sqrt(n_docs) / z, 4) AS weight,
             |  round(sqrt(n_docs) / z * 10000, 1) AS expected_10k
             |FROM c CROSS JOIN z""".stripMargin),
      "temperature (alpha=0.5) mixture reweighting across language groups"),

    // The scale path of decontamination, made concrete: when the eval
    // gram set is too large to broadcast as a JOIN build side, its
    // bloom BITS (8 bits/gram) still broadcast. The corpus is pruned
    // MAP-SIDE by bloom_might_contain before anything shuffles; only
    // the surviving candidates (true hits + the ~2% fp tail) pay the
    // exact semi-join confirm, which removes every false positive — so
    // the result is bit-identical to the exact formulation, which is
    // precisely what the oracle computes.
    Q("dedup_bloom_prefilter",
      (s, d) => {
        import graft.functions.BloomFunctions._
        val g = load(s, d, "documents")
          .select(col("doc_id"), tokens(col("text")).as("w"))
          .select(col("doc_id"),
            explode(array_distinct(wordShinglesFromTokens(col("w"), 3))).as("gram"))
        val evalG = g.filter(col("doc_id") % 50 === 0)
        val trainG = g.filter(col("doc_id") % 50 =!= 0)
        val bloom = bloom_build(evalG, col("gram"),
          expectedItems = 50000L, numBits = 400000L)
        val candidates = trainG
          .filter(bloom_might_contain(bloom, col("gram")))
          .select(col("doc_id"), col("gram"))
        candidates
          .join(evalG.select(col("gram")).distinct(), Seq("gram"), "left_semi")
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("gram")).as("n_shared_grams"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |    list_distinct(list_transform(generate_series(1, len(w) - 2),
             |      i -> array_to_string(w[i:i+2], ' '))) AS g
             |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
             |e AS (SELECT unnest(g) AS gram FROM t WHERE doc_id % 50 = 0),
             |tr AS (SELECT doc_id, unnest(g) AS gram FROM t WHERE doc_id % 50 != 0)
             |SELECT doc_id, count(DISTINCT gram) AS n_shared_grams
             |FROM tr WHERE gram IN (SELECT gram FROM e)
             |GROUP BY doc_id""".stripMargin),
      "bloom-bits decontamination pre-filter: map-side might_contain " +
        "prunes the corpus before any shuffle; exact confirm removes " +
        "false positives — result identical to the exact join"),

    // Model-based domain classification — the fastText/CCNet-style
    // learned filter every curation stack runs next to the heuristic
    // scores: multinomial Naive Bayes with Laplace smoothing, trained
    // ON THE ENGINE (doc_id%10<8 split) and applied to the held-out
    // 20%. Training is two aggregations: per-(token, class) counts
    // (shuffle bounded by vocab × classes, map-side combined) and a
    // 1-row class-totals/vocab frame. Scoring deliberately JOINS the
    // model on token instead of broadcasting it — at 100 TB a
    // vocab×classes model outgrows broadcast, so the honest shape is
    // explode → equi-join on token → doc-keyed sum, all hash
    // exchanges (the unigram LM queries show the broadcast variant).
    // Per-doc log-sums are order-unstable doubles → rounded 4 dp; the
    // argmax is taken over the ROUNDED scores with a label tie-break,
    // so the prediction is deterministic given the hash-checked
    // scores. The lang labels in testdata are random (no real text
    // signal — NOTES.md), which is irrelevant here: the oracle checks
    // the exact posterior arithmetic, not accuracy.
    Q("text_nb_classify",
      (s, d) => {
        val langs = Seq("en", "es", "de", "fr", "zh")
        val docs = load(s, d, "documents")
        val train = docs.filter(col("doc_id") % 10 < 8)
        val test = docs.filter(col("doc_id") % 10 >= 8)
        val tokTrain = train.select(col("lang"),
          explode(tokens(col("text"))).as("t"))
        val cnts = tokTrain.groupBy("t").pivot("lang", langs)
          .agg(count(lit(1)))
        val tokStatAggs = langs.map(l =>
          sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"tot_$l")) :+
          countDistinct(col("t")).as("v")
        val tokStats = tokTrain.agg(tokStatAggs.head, tokStatAggs.tail: _*)
        val priorAggs = count(lit(1)).as("n_docs") +: langs.map(l =>
          sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"nd_$l"))
        val priors = train.agg(priorAggs.head, priorAggs.tail: _*)
        val testTok = test.select(col("doc_id"),
          explode(tokens(col("text"))).as("t"))
        val terms = testTok.join(cnts, Seq("t"), "left")
          .crossJoin(broadcast(tokStats))
          .select(col("doc_id") +: langs.map(l =>
            log2((coalesce(col(l), lit(0L)) + 1).cast("double") /
              (col(s"tot_$l") + col("v")).cast("double")).as(s"term_$l")): _*)
        val sums = terms.groupBy("doc_id")
          .agg(sum(col(s"term_${langs.head}")).as(s"sum_${langs.head}"),
            langs.tail.map(l => sum(col(s"term_$l")).as(s"sum_$l")): _*)
        val scoreCols = langs.map(l =>
          round(log2(col(s"nd_$l").cast("double") / col("n_docs")) +
            col(s"sum_$l"), 4).as(s"score_$l"))
        sums.crossJoin(broadcast(priors))
          .select(col("doc_id") +: scoreCols: _*)
          .withColumn("predicted", greatest(langs.map(l =>
            struct(col(s"score_$l").as("s"), lit(l).as("l"))): _*).getField("l"))
      },
      Some("""WITH train AS (SELECT * FROM documents WHERE doc_id % 10 < 8),
             |test AS (SELECT * FROM documents WHERE doc_id % 10 >= 8),
             |tok AS (SELECT lang, unnest(string_split(text, ' ')) AS t FROM train),
             |cnt AS (SELECT t,
             |    sum(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS c_en,
             |    sum(CASE WHEN lang='es' THEN 1 ELSE 0 END) AS c_es,
             |    sum(CASE WHEN lang='de' THEN 1 ELSE 0 END) AS c_de,
             |    sum(CASE WHEN lang='fr' THEN 1 ELSE 0 END) AS c_fr,
             |    sum(CASE WHEN lang='zh' THEN 1 ELSE 0 END) AS c_zh
             |  FROM tok GROUP BY t),
             |st AS (SELECT
             |    sum(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS tot_en,
             |    sum(CASE WHEN lang='es' THEN 1 ELSE 0 END) AS tot_es,
             |    sum(CASE WHEN lang='de' THEN 1 ELSE 0 END) AS tot_de,
             |    sum(CASE WHEN lang='fr' THEN 1 ELSE 0 END) AS tot_fr,
             |    sum(CASE WHEN lang='zh' THEN 1 ELSE 0 END) AS tot_zh,
             |    count(DISTINCT t) AS v
             |  FROM tok),
             |pri AS (SELECT count(*) AS n_docs,
             |    sum(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS nd_en,
             |    sum(CASE WHEN lang='es' THEN 1 ELSE 0 END) AS nd_es,
             |    sum(CASE WHEN lang='de' THEN 1 ELSE 0 END) AS nd_de,
             |    sum(CASE WHEN lang='fr' THEN 1 ELSE 0 END) AS nd_fr,
             |    sum(CASE WHEN lang='zh' THEN 1 ELSE 0 END) AS nd_zh
             |  FROM train),
             |tt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM test),
             |terms AS (SELECT doc_id,
             |    log2((coalesce(c_en, 0) + 1) / CAST(tot_en + v AS DOUBLE)) AS term_en,
             |    log2((coalesce(c_es, 0) + 1) / CAST(tot_es + v AS DOUBLE)) AS term_es,
             |    log2((coalesce(c_de, 0) + 1) / CAST(tot_de + v AS DOUBLE)) AS term_de,
             |    log2((coalesce(c_fr, 0) + 1) / CAST(tot_fr + v AS DOUBLE)) AS term_fr,
             |    log2((coalesce(c_zh, 0) + 1) / CAST(tot_zh + v AS DOUBLE)) AS term_zh
             |  FROM tt LEFT JOIN cnt USING (t), st),
             |sums AS (SELECT doc_id,
             |    sum(term_en) AS s_en, sum(term_es) AS s_es,
             |    sum(term_de) AS s_de, sum(term_fr) AS s_fr,
             |    sum(term_zh) AS s_zh
             |  FROM terms GROUP BY doc_id),
             |sc AS (SELECT doc_id,
             |    round(log2(CAST(nd_en AS DOUBLE) / n_docs) + s_en, 4) AS score_en,
             |    round(log2(CAST(nd_es AS DOUBLE) / n_docs) + s_es, 4) AS score_es,
             |    round(log2(CAST(nd_de AS DOUBLE) / n_docs) + s_de, 4) AS score_de,
             |    round(log2(CAST(nd_fr AS DOUBLE) / n_docs) + s_fr, 4) AS score_fr,
             |    round(log2(CAST(nd_zh AS DOUBLE) / n_docs) + s_zh, 4) AS score_zh
             |  FROM sums, pri)
             |SELECT doc_id, score_en, score_es, score_de, score_fr, score_zh,
             |  (list_sort([
             |    {'s': score_en, 'l': 'en'}, {'s': score_es, 'l': 'es'},
             |    {'s': score_de, 'l': 'de'}, {'s': score_fr, 'l': 'fr'},
             |    {'s': score_zh, 'l': 'zh'}])[-1]).l AS predicted
             |FROM sc""".stripMargin),
      "Naive Bayes domain classifier trained on-engine (80/20 split): " +
        "vocab×classes count model, token-equi-join scoring (the " +
        "beyond-broadcast shape), rounded posteriors + deterministic " +
        "argmax — full posterior arithmetic value-checked"),

    // Conditional (bigram) LM scoring with unigram interpolation —
    // the step up from text_lm_score's unigram surprisal: perplexity
    // under P(w|prev) = 0.75·c(prev,w)/c(prev,·) + 0.25·(c(w)+0.5)/
    // (T+0.5V) separates natural word ORDER from mere word choice
    // (a shuffled document keeps its unigram score but craters here —
    // the standard gibberish/boilerplate discriminator). Scale shape:
    // the bigram model is vocab²-bounded — beyond any broadcast — so
    // scoring is the JOIN pipeline: corpus bigrams shuffle once by
    // (prev, tok) into the model join, context and unigram counts
    // join on their own keys, the two corpus-level constants ride a
    // broadcast 1-row frame, and the per-doc rollup is one doc-keyed
    // sum. Every count join partitions on a model key — no pass is
    // ever corpus × corpus. Per-doc log2 sums are order-unstable →
    // rounded 4 dp (catalog rule); everything else is exact-count
    // IEEE arithmetic identical in both engines.
    Q("text_bigram_lm",
      (s, d) => {
        val docs = load(s, d, "documents")
          .select(col("doc_id"), tokens(col("text")).as("w"))
        val bg = docs.filter(size(col("w")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(w) - 1), " +
              "i -> struct(w[i-1] as prev, w[i] as tok))")).as("p"))
          .select(col("doc_id"), col("p.prev").as("prev"), col("p.tok").as("tok"))
        val bgc = bg.groupBy("prev", "tok").agg(count(lit(1)).as("c_bg"))
        val ctx = bg.groupBy("prev").agg(count(lit(1)).as("c_prev"))
        val tk = docs.select(explode(col("w")).as("t"))
        val uni = tk.groupBy("t").agg(count(lit(1)).as("c_uni"))
        val stats = tk.agg(count(lit(1)).as("total"),
          countDistinct(col("t")).as("v"))
        bg.join(bgc, Seq("prev", "tok"))
          .join(ctx, Seq("prev"))
          .join(uni.withColumnRenamed("t", "tok"), Seq("tok"))
          .crossJoin(broadcast(stats))
          .select(col("doc_id"), log2(
            lit(0.75) * (col("c_bg") / col("c_prev")) +
              lit(0.25) * ((col("c_uni") + lit(0.5)) /
                (col("total") + lit(0.5) * col("v")))).as("lp"))
          .groupBy("doc_id")
          .agg(round(-sum(col("lp")) / count(lit(1)), 4).as("bits_per_bigram"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |bg AS (SELECT doc_id, w[i] AS prev, w[i+1] AS tok
             |       FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-1)) AS i
             |             FROM t WHERE len(w) >= 2)),
             |bgc AS (SELECT prev, tok, count(*) AS c_bg FROM bg GROUP BY 1, 2),
             |ctx AS (SELECT prev, count(*) AS c_prev FROM bg GROUP BY 1),
             |tk AS (SELECT unnest(w) AS t FROM t),
             |uni AS (SELECT t, count(*) AS c_uni FROM tk GROUP BY 1),
             |st AS (SELECT count(*) AS total, count(DISTINCT t) AS v FROM tk),
             |sc AS (SELECT doc_id,
             |    log2(0.75 * (c_bg / c_prev)
             |       + 0.25 * ((c_uni + 0.5) / (total + 0.5 * v))) AS lp
             |  FROM bg JOIN bgc USING (prev, tok) JOIN ctx USING (prev)
             |  JOIN uni ON bg.tok = uni.t, st)
             |SELECT doc_id, round(-sum(lp) / count(*), 4) AS bits_per_bigram
             |FROM sc GROUP BY doc_id""".stripMargin),
      "interpolated bigram LM bits-per-bigram: word-order surprisal " +
        "via the join-scored conditional model (vocab²-bounded, beyond " +
        "broadcast) — whole pipeline value-checked"),

    // Domain-mixture diagnostic: KL(P_domain ‖ P_corpus) over unigram
    // distributions — how far each domain's token distribution sits
    // from the corpus mixture (the signal domain-reweighting methods
    // like DoReMi monitor; a domain at ~0 bits is redundant with the
    // mixture, a high-KL domain is what upweighting actually buys).
    // One (lang, token) aggregation + token-keyed join against the
    // corpus counts + O(langs) rollup: shuffles bounded by vocab ×
    // domains, the corpus text itself never re-shuffles. Per-domain
    // sums of log2 terms are order-unstable → rounded 4 dp.
    Q("text_domain_divergence",
      (s, d) => {
        val tok = load(s, d, "documents")
          .select(col("lang"), explode(tokens(col("text"))).as("t"))
        val cl = tok.groupBy("lang", "t").agg(count(lit(1)).as("c_lt"))
        val ct = tok.groupBy("t").agg(count(lit(1)).as("c_t"))
        val tl = tok.groupBy("lang").agg(count(lit(1)).as("n_l"))
        val tt = tok.agg(count(lit(1)).as("n"))
        cl.join(ct, "t").join(broadcast(tl), "lang")
          .crossJoin(broadcast(tt))
          .select(col("lang"), col("n_l"),
            ((col("c_lt") / col("n_l")) *
              log2((col("c_lt") / col("n_l")) / (col("c_t") / col("n"))))
              .as("term"))
          .groupBy(col("lang"), col("n_l").as("n_tokens"))
          .agg(round(sum(col("term")), 4).as("kl_bits"))
      },
      Some("""WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS t
             |            FROM documents),
             |cl AS (SELECT lang, t, count(*) AS c_lt FROM tok GROUP BY 1, 2),
             |ct AS (SELECT t, count(*) AS c_t FROM tok GROUP BY 1),
             |tl AS (SELECT lang, count(*) AS n_l FROM tok GROUP BY 1),
             |tt AS (SELECT count(*) AS n FROM tok)
             |SELECT lang, n_l AS n_tokens,
             |  round(sum((c_lt / n_l) * log2((c_lt / n_l) / (c_t / n))), 4)
             |    AS kl_bits
             |FROM cl JOIN ct USING (t) JOIN tl USING (lang), tt
             |GROUP BY lang, n_l""".stripMargin),
      "per-domain KL divergence from the corpus token mixture — the " +
        "domain-reweighting diagnostic; vocab×domains-bounded shuffles"),

    // The same divergence at token grain: each domain's top-10 tokens
    // by pointwise KL contribution — the characteristic vocabulary of
    // a domain (what makes it different from the mixture). The rank
    // runs per domain over the (lang, token) aggregate, truncated
    // map-side via WindowGroupLimit. The rank compares the ROUNDED
    // contribution (4 dp) with a token tie-break: log2 differs in the
    // last ulp between engines, so an unrounded order could cut a
    // different top-10 when rank 10 and 11 are within that ulp —
    // rounding first makes the cut deterministic (hash-checked
    // rounded values ⇒ identical order).
    Q("text_domain_keywords",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = load(s, d, "documents")
          .select(col("lang"), explode(tokens(col("text"))).as("t"))
        val cl = tok.groupBy("lang", "t").agg(count(lit(1)).as("c_lt"))
        val ct = tok.groupBy("t").agg(count(lit(1)).as("c_t"))
        val tl = tok.groupBy("lang").agg(count(lit(1)).as("n_l"))
        val tt = tok.agg(count(lit(1)).as("n"))
        val term = cl.join(ct, "t").join(broadcast(tl), "lang")
          .crossJoin(broadcast(tt))
          .select(col("lang"), col("t"), col("c_lt"),
            round((col("c_lt") / col("n_l")) *
              log2((col("c_lt") / col("n_l")) / (col("c_t") / col("n"))), 4)
              .as("contrib"))
        term.withColumn("rk", row_number().over(
            Window.partitionBy(col("lang"))
              .orderBy(col("contrib").desc, col("t"))))
          .filter(col("rk") <= 10)
          .select(col("lang"), col("t").as("token"),
            col("c_lt").as("n_occurrences"), col("contrib"))
      },
      Some("""WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS t
             |            FROM documents),
             |cl AS (SELECT lang, t, count(*) AS c_lt FROM tok GROUP BY 1, 2),
             |ct AS (SELECT t, count(*) AS c_t FROM tok GROUP BY 1),
             |tl AS (SELECT lang, count(*) AS n_l FROM tok GROUP BY 1),
             |tt AS (SELECT count(*) AS n FROM tok),
             |term AS (SELECT lang, t, c_lt,
             |    round((c_lt / n_l) * log2((c_lt / n_l) / (c_t / n)), 4)
             |      AS contrib
             |  FROM cl JOIN ct USING (t) JOIN tl USING (lang), tt)
             |SELECT lang, t AS token, c_lt AS n_occurrences, contrib
             |FROM (SELECT *, row_number() OVER (PARTITION BY lang
             |        ORDER BY contrib DESC, t) AS rk FROM term)
             |WHERE rk <= 10""".stripMargin),
      "per-domain characteristic vocabulary: top-10 tokens by pointwise " +
        "KL contribution, map-side WindowGroupLimit rank"),

    // Zipf-law fit — the corpus-health diagnostic: natural language
    // has rank-frequency slope ≈ −1 on the log-log plot; heavily
    // templated/duplicated corpora flatten it, OCR noise steepens the
    // tail. One vocab-sized aggregate, a rank over the O(vocab)
    // counts, then a least-squares fit via the built-in regression
    // aggregates — the corpus text itself is scanned once. The rank
    // window runs over the aggregate (vocab rows, not corpus rows);
    // regression sums of ln products are order-unstable → rounded
    // 4 dp (catalog rule).
    Q("text_zipf_fit",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val counts = load(s, d, "documents")
          .select(explode(tokens(col("text"))).as("t"))
          .groupBy("t").agg(count(lit(1)).as("n"))
        // partitionBy(lit(0)): same single-partition plan a global
        // window needs anyway (O(vocab) rows), without the WindowExec
        // no-partition WARN
        val ranked = counts.withColumn("rank", row_number().over(
          Window.partitionBy(lit(0)).orderBy(col("n").desc, col("t"))))
        ranked.agg(
          count(lit(1)).as("vocab"),
          round(regr_slope(log(col("n")), log(col("rank"))), 4).as("slope"),
          round(regr_intercept(log(col("n")), log(col("rank"))), 4)
            .as("intercept"),
          round(regr_r2(log(col("n")), log(col("rank"))), 4).as("r2"))
      },
      Some("""WITH cnt AS (
             |  SELECT t, count(*) AS n FROM (
             |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
             |  GROUP BY t),
             |ranked AS (
             |  SELECT n, row_number() OVER (ORDER BY n DESC, t) AS rank
             |  FROM cnt)
             |SELECT CAST(count(*) AS BIGINT) AS vocab,
             |  round(regr_slope(ln(n), ln(rank)), 4) AS slope,
             |  round(regr_intercept(ln(n), ln(rank)), 4) AS intercept,
             |  round(regr_r2(ln(n), ln(rank)), 4) AS r2
             |FROM ranked""".stripMargin),
      "Zipf rank-frequency fit (slope/intercept/R²) — corpus-health " +
        "diagnostic; one vocab aggregate + O(vocab) rank + regression " +
        "aggregates"))
}
