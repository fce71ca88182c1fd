package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables.load

/** Statistics / econometrics faces added round 10: survival analysis,
  * inequality and concentration measures, digit-distribution auditing,
  * Markov transition estimation, readability scoring. Every query is a
  * grain-reducing rollup first (user / customer / supplier / duration
  * grain), with any ordered window running on the REDUCED frame — the
  * catalog's scale discipline (PlanAuditSpec's window rule).
  */
object StatsQueries {

  def queries: Seq[Q] = Seq(

    // Kaplan-Meier survival estimator — time-to-conversion over the
    // event stream: duration = days from a user's first event to their
    // first HIGH-VALUE purchase (value > 90 — the "death"; the raw
    // event stream is so dense every user purchases, which would leave
    // the censoring path vacuous, the same fixture trap
    // events_cohort_retention documents); users who never convert are
    // right-CENSORED at their last observed event (they leave the risk
    // set without converting — dropping them instead would bias the
    // curve down, the classic mistake KM exists to fix). One user-grain
    // rollup (min/filtered-min/max, no argmax), one duration-grain agg,
    // then the product-limit fold as exp(running sum of ln(1 - d/n))
    // over the tiny duration spine. round(4): the running double sum is
    // segment-tree-ordered in DuckDB, sequential in Spark.
    Q("eval_kaplan_meier",
      (s, d) => {
        val ev = load(s, d, "events")
        val users = ev.groupBy(col("user_id")).agg(
          min(to_date(col("ts"))).as("first_d"),
          min(when(col("event_type") === "purchase" && col("value") > 90,
            to_date(col("ts")))).as("purch_d"),
          max(to_date(col("ts"))).as("last_d"))
        val durations = users.select(
          datediff(coalesce(col("purch_d"), col("last_d")), col("first_d"))
            .cast("long").as("dur"),
          col("purch_d").isNotNull.cast("long").as("obs"))
        val grain = durations.groupBy(col("dur"))
          .agg(sum(col("obs")).as("d_t"), count(lit(1)).as("c_t"))
        val w = Window.orderBy(col("dur"))
        grain
          // risk set at time t = everyone still under observation:
          // reverse-cumulative count, same frame as the oracle
          .withColumn("at_risk",
            sum(col("c_t")).over(w.rowsBetween(
              Window.currentRow, Window.unboundedFollowing)))
          // the final duration can kill the whole risk set (factor 0);
          // DuckDB's ln(0) THROWS (Spark's returns null), so both sides
          // guard: ln only over positive factors, an explicit 0.0 once
          // any factor hits zero (it then stays zero forever)
          .withColumn("_f",
            lit(1.0) - col("d_t").cast("double") / col("at_risk"))
          .withColumn("survival",
            when(min(col("_f")).over(w.rowsBetween(
              Window.unboundedPreceding, Window.currentRow)) <= 0, lit(0.0))
              .otherwise(round(exp(
                sum(when(col("_f") > 0, log(col("_f"))).otherwise(lit(0.0)))
                  .over(w.rowsBetween(Window.unboundedPreceding,
                    Window.currentRow))), 4)))
          .select(col("dur"), col("at_risk"), col("d_t").as("n_events"),
            col("c_t").as("n_leaving"), col("survival"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    min(CAST(ts AS DATE)) AS first_d,
             |    min(CAST(ts AS DATE))
             |      FILTER (event_type = 'purchase' AND value > 90)
             |      AS purch_d,
             |    max(CAST(ts AS DATE)) AS last_d
             |  FROM events GROUP BY 1),
             |dur AS (
             |  SELECT date_diff('day', first_d, coalesce(purch_d, last_d))
             |      AS dur,
             |    CASE WHEN purch_d IS NOT NULL THEN 1 ELSE 0 END AS obs
             |  FROM u),
             |g AS (
             |  SELECT dur, CAST(sum(obs) AS BIGINT) AS d_t,
             |    CAST(count(*) AS BIGINT) AS c_t
             |  FROM dur GROUP BY 1),
             |g2 AS (
             |  SELECT dur, d_t, c_t,
             |    CAST(sum(c_t) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
             |      AND UNBOUNDED FOLLOWING) AS BIGINT) AS at_risk
             |  FROM g),
             |g3 AS (
             |  SELECT dur, d_t, c_t, at_risk,
             |    1.0 - CAST(d_t AS DOUBLE) / at_risk AS f
             |  FROM g2)
             |SELECT dur, at_risk, d_t AS n_events, c_t AS n_leaving,
             |  CASE WHEN min(f) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) <= 0 THEN 0.0
             |    ELSE round(exp(sum(CASE WHEN f > 0 THEN ln(f) ELSE 0.0 END)
             |      OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
             |        AND CURRENT ROW)), 4) END AS survival
             |FROM g3""".stripMargin),
      "Kaplan-Meier product-limit survival: censoring-correct " +
        "time-to-purchase; one user rollup + a duration-grain fold"),

    // Gini coefficient of customer revenue per market segment — the
    // inequality lens on the same revenue rollup every dashboard runs.
    // Exact-integer formulation: revenue in cents, ranks from a
    // per-segment window over the CUSTOMER-grain rollup, and the
    // closed form G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) on long
    // arithmetic (equal values commute under rank swap, so the unique
    // (rev, custkey) order is deterministic AND value-correct).
    // Overflow audit (the r9 rule): Σ rank·x at sf0.1 is ~4.5e17 of
    // the 9.2e18 long range (20× margin) — verified green at the
    // sf0.1 gate; the 100 TB form would shard the rank-sum per
    // segment-salt and re-sum, same plan shape.
    Q("agg_gini_coefficient",
      (s, d) => {
        val custRev = load(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("rev_cents"))
        val seg = custRev.join(
          broadcast(load(s, d, "customer")
            .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("rev_cents"), col("o_custkey"))
        // rank_sum ≈ n²·avg_cents/2 — a long would wrap near sf10;
        // DECIMAL(38,0) is exact to 1e38 (n ≈ 1e14 customers), and the
        // final double cast of the same exact integer is bitwise-
        // identical on both engines at any magnitude.
        seg.withColumn("rnk", row_number().over(w))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("rev_cents")).as("total_rev_cents"),
            sum(col("rnk").cast("decimal(19,0)") *
              col("rev_cents").cast("decimal(19,0)")).as("rank_sum"))
          .select(col("c_mktsegment"), col("n_customers"),
            col("total_rev_cents"),
            round((lit(2.0) * col("rank_sum").cast("double") -
              (col("n_customers") + 1).cast("double") *
                col("total_rev_cents").cast("double")) /
              (col("n_customers").cast("double") *
                col("total_rev_cents").cast("double")), 4).as("gini"))
      },
      Some("""WITH cr AS (
             |  SELECT o_custkey,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS rev_cents
             |  FROM orders GROUP BY 1),
             |r AS (
             |  SELECT c_mktsegment, rev_cents,
             |    row_number() OVER (PARTITION BY c_mktsegment
             |      ORDER BY rev_cents, o_custkey) AS rnk
             |  FROM cr JOIN customer ON o_custkey = c_custkey)
             |SELECT c_mktsegment,
             |  CAST(count(*) AS BIGINT) AS n_customers,
             |  CAST(sum(rev_cents) AS BIGINT) AS total_rev_cents,
             |  round((2.0 * CAST(sum(CAST(rnk AS DECIMAL(19,0)) *
             |      CAST(rev_cents AS DECIMAL(19,0))) AS DOUBLE) -
             |    CAST(count(*) + 1 AS DOUBLE) *
             |      CAST(CAST(sum(rev_cents) AS BIGINT) AS DOUBLE)) /
             |    (CAST(count(*) AS DOUBLE) *
             |      CAST(CAST(sum(rev_cents) AS BIGINT) AS DOUBLE)), 4)
             |    AS gini
             |FROM r GROUP BY 1""".stripMargin),
      "Gini inequality per segment: exact-cents rank formula on the " +
        "customer-grain rollup, one partitioned window"),

    // Benford first-digit audit — the fraud/corruption smell test for
    // any financial column: observed leading-digit counts vs the
    // log10(1 + 1/d) law, with per-digit chi-square contributions.
    // Leading digit comes from the exact cents string (scale-shift
    // invariant), so both engines read the same digit; expectations
    // and contributions round 4 (log10 may differ across libm ulps).
    Q("quality_benford_digits",
      (s, d) => {
        val digits = load(s, d, "orders")
          .select(substring(round(col("o_totalprice") * 100)
            .cast("long").cast("string"), 1, 1).as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
        val tot = digits.agg(sum(col("n_obs")).as("n_total"))
        digits.crossJoin(broadcast(tot))
          .select(col("digit"), col("n_obs"),
            round(col("n_total") *
              log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 4)
              .as("n_expected"),
            round(pow(col("n_obs") - col("n_total") *
              log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 2) /
              (col("n_total") *
                log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))), 4)
              .as("chi2_part"))
      },
      Some("""WITH dg AS (
             |  SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
             |    AS VARCHAR), 1, 1) AS digit, count(*) AS n_obs
             |  FROM orders GROUP BY 1),
             |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM dg)
             |SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
             |  round(n_total * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 4)
             |    AS n_expected,
             |  round(pow(n_obs - n_total *
             |      log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 2) /
             |    (n_total * log10(1.0 + 1.0 / CAST(digit AS DOUBLE))), 4)
             |    AS chi2_part
             |FROM dg CROSS JOIN t""".stripMargin),
      "Benford's-law first-digit audit with per-digit chi-square " +
        "contributions; digit from the exact cents string"),

    // Lorenz curve deciles — the curve the Gini scalar summarizes:
    // cumulative revenue share by customer decile per segment, the
    // "top 10% of customers hold X% of revenue" readout. NTILE over
    // the customer-grain rollup (unique (rev, custkey) order), one
    // decile-grain agg, then a 10-row cumulative window per segment;
    // shares are exact long ratios (unrounded — both engines divide
    // the same exact integers).
    Q("agg_lorenz_deciles",
      (s, d) => {
        val custRev = load(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("rev_cents"))
        val seg = custRev.join(
          broadcast(load(s, d, "customer")
            .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("rev_cents"), col("o_custkey"))
        val deciles = seg.withColumn("decile", ntile(10).over(w))
          .groupBy(col("c_mktsegment"), col("decile"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("rev_cents")).as("decile_cents"))
        val cumW = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val totW = Window.partitionBy(col("c_mktsegment"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        deciles
          .withColumn("cum_share",
            sum(col("decile_cents")).over(cumW).cast("double") /
              sum(col("decile_cents")).over(totW).cast("double"))
          .select(col("c_mktsegment"), col("decile"), col("n_customers"),
            col("decile_cents"), col("cum_share"))
      },
      Some("""WITH cr AS (
             |  SELECT o_custkey,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS rev_cents
             |  FROM orders GROUP BY 1),
             |r AS (
             |  SELECT c_mktsegment, rev_cents,
             |    ntile(10) OVER (PARTITION BY c_mktsegment
             |      ORDER BY rev_cents, o_custkey) AS decile
             |  FROM cr JOIN customer ON o_custkey = c_custkey),
             |g AS (
             |  SELECT c_mktsegment, CAST(decile AS INTEGER) AS decile,
             |    CAST(count(*) AS BIGINT) AS n_customers,
             |    CAST(sum(rev_cents) AS BIGINT) AS decile_cents
             |  FROM r GROUP BY 1, 2)
             |SELECT c_mktsegment, decile, n_customers, decile_cents,
             |  CAST(sum(decile_cents) OVER (PARTITION BY c_mktsegment
             |      ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND
             |      CURRENT ROW) AS DOUBLE) /
             |    CAST(sum(decile_cents) OVER (PARTITION BY c_mktsegment)
             |      AS DOUBLE) AS cum_share
             |FROM g""".stripMargin),
      "Lorenz curve by customer decile per segment: exact-cents NTILE " +
        "rollup + a 10-row cumulative window — the curve behind Gini"),

    // Flesch reading-ease scoring — the classic readability gate in a
    // text-curation pipeline. Words / sentences / vowel-group syllable
    // proxies are RE2-countable in both engines; the score is pure
    // per-row IEEE arithmetic on exact integer counts (unrounded —
    // bitwise identical), computed entirely map-side.
    Q("text_readability",
      (s, d) => {
        val t = s.read.parquet(s"$d/documents.parquet")
          .select(col("doc_id"),
            regexp_count(col("text"), lit("[A-Za-z]+")).cast("long")
              .as("n_words"),
            greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
              .cast("long").as("n_sentences"),
            regexp_count(col("text"), lit("[aeiouyAEIOUY]+")).cast("long")
              .as("n_syllables"))
        t.filter(col("n_words") > 0)
          .select(col("doc_id"), col("n_words"), col("n_sentences"),
            col("n_syllables"),
            (lit(206.835) -
              lit(1.015) * (col("n_words").cast("double") /
                col("n_sentences").cast("double")) -
              lit(84.6) * (col("n_syllables").cast("double") /
                col("n_words").cast("double"))).as("flesch"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
             |      AS n_words,
             |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
             |      AS BIGINT) AS n_sentences,
             |    CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
             |      AS BIGINT) AS n_syllables
             |  FROM documents)
             |SELECT doc_id, n_words, n_sentences, n_syllables,
             |  206.835 - 1.015 * (CAST(n_words AS DOUBLE) /
             |      CAST(n_sentences AS DOUBLE)) -
             |    84.6 * (CAST(n_syllables AS DOUBLE) /
             |      CAST(n_words AS DOUBLE)) AS flesch
             |FROM t WHERE n_words > 0""".stripMargin),
      "Flesch reading-ease per document: RE2 word/sentence/vowel-group " +
        "counts, zero-shuffle map-side scoring"),

    // Herfindahl-Hirschman concentration of supplier revenue within
    // each nation — the market-structure monitor over the same
    // supplier rollup Q5-class queries build. Revenue exact in cents
    // per supplier (rollup BELOW the dim join, supplier dim broadcast);
    // shares are exact long ratios; the share-squared sum rounds 4
    // (order-unstable doubles), top share is an order-independent max.
    Q("agg_hhi_concentration",
      (s, d) => {
        val srev = load(s, d, "lineitem")
          .groupBy(col("l_suppkey"))
          .agg(sum(round(col("l_extendedprice") * (lit(1.0) -
            col("l_discount")) * 100).cast("long")).as("rev_cents"))
        val bySupp = srev.join(
          broadcast(load(s, d, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        val nrev = bySupp.groupBy(col("s_nationkey").as("n_key"))
          .agg(sum(col("rev_cents")).as("nation_cents"))
        bySupp.join(broadcast(nrev), col("s_nationkey") === col("n_key"))
          .select(col("s_nationkey"),
            (col("rev_cents").cast("double") /
              col("nation_cents").cast("double")).as("share"))
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_suppliers"),
            round(sum(col("share") * col("share")), 4).as("hhi"),
            round(max(col("share")), 4).as("top_share"))
      },
      Some("""WITH sr AS (
             |  SELECT l_suppkey,
             |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
             |      * 100) AS BIGINT)) AS BIGINT) AS rev_cents
             |  FROM lineitem GROUP BY 1),
             |j AS (
             |  SELECT s_nationkey, rev_cents,
             |    CAST(sum(rev_cents) OVER (PARTITION BY s_nationkey)
             |      AS BIGINT) AS nation_cents
             |  FROM sr JOIN supplier ON l_suppkey = s_suppkey)
             |SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
             |  round(sum((CAST(rev_cents AS DOUBLE) /
             |    CAST(nation_cents AS DOUBLE)) *
             |    (CAST(rev_cents AS DOUBLE) /
             |    CAST(nation_cents AS DOUBLE))), 4) AS hhi,
             |  round(max(CAST(rev_cents AS DOUBLE) /
             |    CAST(nation_cents AS DOUBLE)), 4) AS top_share
             |FROM j GROUP BY 1""".stripMargin),
      "HHI market concentration per nation: supplier-grain exact-cents " +
        "rollup below a broadcast dim join, shares as exact ratios"),

    // Spearman rank correlation between daily traffic and daily revenue
    // — the monotone-association screen Pearson (profile_correlation_
    // matrix) misses when the relation is nonlinear. Day-grain rollup
    // first (calendar-bounded: ~31 rows at ANY scale factor), exact
    // cents for the revenue sum, then DOUBLED mid-ranks (2·minrank +
    // ties − 1 stays integer) from two windows over the tiny frame and
    // Pearson's closed form on exact integer moments. sqrt/division are
    // IEEE-correctly-rounded in both engines, so the result ships
    // unrounded. Windows are unpartitioned but the frame is day-grain
    // (the PlanAuditSpec regime).
    Q("profile_spearman_corr",
      (s, d) => {
        val day = load(s, d, "events")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"),
            sum(round(col("value") * 100).cast("long")).as("y"))
        val ranked = day.select(
          (rank().over(Window.orderBy(col("x"))).cast("long") * 2 +
            count(lit(1)).over(Window.partitionBy(col("x"))) - 1).as("rx"),
          (rank().over(Window.orderBy(col("y"))).cast("long") * 2 +
            count(lit(1)).over(Window.partitionBy(col("y"))) - 1).as("ry"))
        ranked
          .agg(count(lit(1)).as("n"),
            sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
            sum(col("rx") * col("rx")).as("sxx"),
            sum(col("ry") * col("ry")).as("syy"),
            sum(col("rx") * col("ry")).as("sxy"))
          .select(col("n"),
            ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double")) *
                sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                  .cast("double")))).as("rho"))
      },
      Some("""WITH day AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS x,
             |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             |      AS y
             |  FROM events GROUP BY 1),
             |r AS (
             |  SELECT
             |    CAST(rank() OVER (ORDER BY x) * 2 +
             |      count(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS rx,
             |    CAST(rank() OVER (ORDER BY y) * 2 +
             |      count(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS ry
             |  FROM day),
             |m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(rx) AS BIGINT) AS sx,
             |    CAST(sum(ry) AS BIGINT) AS sy,
             |    CAST(sum(rx * rx) AS BIGINT) AS sxx,
             |    CAST(sum(ry * ry) AS BIGINT) AS syy,
             |    CAST(sum(rx * ry) AS BIGINT) AS sxy
             |  FROM r)
             |SELECT n,
             |  CAST(n * sxy - sx * sy AS DOUBLE) /
             |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
             |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS rho
             |FROM m""".stripMargin),
      "Spearman rank correlation on the day-grain rollup: doubled " +
        "integer mid-ranks + Pearson closed form, exact moments"),

    // Mann-Whitney U — the distribution-free two-sample test (purchase
    // vs click values): no normality assumption, unlike
    // quality_welch_ttest on the same comparison. The AUC machinery
    // (exact doubled mid-ranks on the DISTINCT-CENTS rollup — value
    // domain, not row grain) gives the rank sum in one pass; the
    // tie-corrected normal approximation is a fixed double chain over
    // exact integer moments (Σ(t³−t) ≤ n³ — long-safe through sf1;
    // the 100 TB form shards the value rollup, same shape). u1 is an
    // exact dyadic (possibly .5) so it ships as double, z unrounded
    // (identical IEEE chains both engines).
    Q("quality_mann_whitney",
      (s, d) => {
        val ev = load(s, d, "events")
          .filter(col("event_type").isin("purchase", "click"))
          .select((col("event_type") === lit("purchase"))
            .cast("long").as("g1"),
            round(col("value") * 100).cast("long").as("v"))
        val byV = ev.groupBy(col("v"))
          .agg(count(lit(1)).as("cnt"), sum(col("g1")).as("cnt1"))
          .withColumn("cum",
            sum(col("cnt")).over(Window.orderBy(col("v"))))
          .withColumn("rank2", col("cum") * 2 - col("cnt") + 1)
        // r1_2 ≈ 2n², ties worst-case n³ (one tie spike holds the
        // corpus), n1·n2 and n(n−1) ≈ n²/4 — all wrap long within a
        // few sf decades. The n-quadratic/cubic terms accumulate in
        // DECIMAL (exact to 1e38, i.e. n ≈ 1e12 rows for the cube);
        // bounded factors stay long; every decimal casts to double at
        // its use site (same exact integer, both engines).
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
        def dec12(c: org.apache.spark.sql.Column) = c.cast("decimal(12,0)")
        byV
          .agg(sum(col("cnt")).as("n"), sum(col("cnt1")).as("n1"),
            sum(dec(col("cnt1")) * dec(col("rank2"))).as("r1_2"),
            sum(dec12(col("cnt")) * dec12(col("cnt")) * dec12(col("cnt"))
              - dec(col("cnt"))).as("ties"))
          .select(col("n1"), (col("n") - col("n1")).as("n2"), col("n"),
            col("r1_2"), col("ties"))
          .select(col("n1"), col("n2"),
            ((col("r1_2") - dec(col("n1")) * (dec(col("n1")) + lit(1)))
              .cast("double") / lit(2.0)).as("u1"),
            (((col("r1_2") - dec(col("n1")) * (dec(col("n1")) + lit(1))) -
              dec(col("n1")) * dec(col("n2"))).cast("double") /
              (lit(2.0) * sqrt(
                col("n1").cast("double") * col("n2").cast("double") /
                  lit(12.0) *
                  ((col("n") + 1).cast("double") -
                    col("ties").cast("double") /
                      (col("n").cast("double") *
                        (col("n") - 1).cast("double"))))))
              .as("z"))
      },
      Some("""WITH ev AS (
             |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
             |      END AS g1,
             |    CAST(round(value * 100) AS BIGINT) AS v
             |  FROM events WHERE event_type IN ('purchase', 'click')),
             |g AS (
             |  SELECT v, CAST(count(*) AS BIGINT) AS cnt,
             |    CAST(sum(g1) AS BIGINT) AS cnt1
             |  FROM ev GROUP BY 1),
             |r AS (
             |  SELECT cnt, cnt1,
             |    CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) * 2
             |      - cnt + 1 AS rank2
             |  FROM g),
             |m AS (
             |  SELECT CAST(sum(cnt) AS BIGINT) AS n,
             |    CAST(sum(cnt1) AS BIGINT) AS n1,
             |    sum(CAST(cnt1 AS DECIMAL(19,0)) *
             |      CAST(rank2 AS DECIMAL(19,0))) AS r1_2,
             |    sum(CAST(cnt AS DECIMAL(12,0)) * CAST(cnt AS DECIMAL(12,0))
             |      * CAST(cnt AS DECIMAL(12,0))
             |      - CAST(cnt AS DECIMAL(19,0))) AS ties
             |  FROM r)
             |SELECT n1, n - n1 AS n2,
             |  CAST(r1_2 - CAST(n1 AS DECIMAL(19,0)) *
             |    (CAST(n1 AS DECIMAL(19,0)) + 1) AS DOUBLE) / 2.0 AS u1,
             |  CAST((r1_2 - CAST(n1 AS DECIMAL(19,0)) *
             |      (CAST(n1 AS DECIMAL(19,0)) + 1)) -
             |    CAST(n1 AS DECIMAL(19,0)) * CAST(n - n1 AS DECIMAL(19,0))
             |    AS DOUBLE) /
             |    (2.0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)
             |      / 12.0 *
             |      (CAST(n + 1 AS DOUBLE) -
             |       CAST(ties AS DOUBLE) /
             |         (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))))) AS z
             |FROM m""".stripMargin),
      "Mann-Whitney U two-sample rank test: exact doubled mid-ranks on " +
        "the distinct-cents rollup, tie-corrected normal z"),

    // Kruskal-Wallis — Mann-Whitney generalized to all five event
    // types: one (type, cents) grain pass, the value-grain rank frame
    // DERIVED from it (no second scan), per-type doubled rank sums via
    // an equi-join at value grain. Rj² crosses 2^63 by sf1, so each
    // per-type term casts the EXACT long rank-sum to double before
    // squaring (the r9 moment-product rule — sf0.1-gate verified);
    // the 5-term cross-group sum is order-unstable, so H rounds 4dp.
    Q("quality_kruskal_wallis",
      (s, d) => {
        val gv = load(s, d, "events")
          .select(col("event_type").as("g"),
            round(col("value") * 100).cast("long").as("v"))
          .groupBy(col("g"), col("v"))
          .agg(count(lit(1)).as("gcnt"))
        val vg = gv.groupBy(col("v")).agg(sum(col("gcnt")).as("cnt"))
          .withColumn("cum",
            sum(col("cnt")).over(Window.orderBy(col("v"))))
          .select(col("v"), col("cnt"),
            (col("cum") * 2 - col("cnt") + 1).as("rank2"))
        // rj2 ≈ 2n² and the tie sum is worst-case n³ (a single tie
        // spike) — both wrap long within a few sf decades; accumulate
        // in DECIMAL (exact to n ≈ 1e12 for the cube), double at use.
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
        def dec12(c: org.apache.spark.sql.Column) = c.cast("decimal(12,0)")
        val perGroup = gv.join(vg.select(col("v"), col("rank2")), Seq("v"))
          .groupBy(col("g"))
          .agg(sum(col("gcnt")).as("nj"),
            sum(dec(col("gcnt")) * dec(col("rank2"))).as("rj2"))
        val tot = vg.agg(sum(col("cnt")).as("n"),
          sum(dec12(col("cnt")) * dec12(col("cnt")) * dec12(col("cnt"))
            - dec(col("cnt"))).as("ties"))
        perGroup.crossJoin(broadcast(tot))
          .select(col("g"), col("nj"), col("rj2"), col("n"), col("ties"),
            (col("rj2").cast("double") * col("rj2").cast("double") /
              (lit(4.0) * col("nj").cast("double"))).as("term"))
          .agg(count(lit(1)).as("k_groups"), max(col("n")).as("n"),
            sum(col("term")).as("sumterm"), max(col("ties")).as("ties"))
          .select(col("k_groups"), col("n"),
            round((lit(12.0) * col("sumterm") /
              (col("n").cast("double") * (col("n") + 1).cast("double")) -
              lit(3.0) * (col("n") + 1).cast("double")) /
              // n³ in LONG wraps past n ≈ 2.1e6 (~sf3) — cube in
              // double (deterministic, overflow-free; same cast-
              // before-the-product rule as the rj2² term above)
              (lit(1.0) - col("ties").cast("double") /
                (col("n").cast("double") * col("n").cast("double") *
                  col("n").cast("double") - col("n").cast("double"))),
              4).as("h"))
      },
      Some("""WITH gv AS (
             |  SELECT event_type AS g,
             |    CAST(round(value * 100) AS BIGINT) AS v,
             |    CAST(count(*) AS BIGINT) AS gcnt
             |  FROM events GROUP BY 1, 2),
             |vg AS (
             |  SELECT v, CAST(sum(gcnt) AS BIGINT) AS cnt
             |  FROM gv GROUP BY 1),
             |vr AS (
             |  SELECT v, cnt,
             |    CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) * 2
             |      - cnt + 1 AS rank2
             |  FROM vg),
             |pg AS (
             |  SELECT g, CAST(sum(gcnt) AS BIGINT) AS nj,
             |    sum(CAST(gcnt AS DECIMAL(19,0)) *
             |      CAST(rank2 AS DECIMAL(19,0))) AS rj2
             |  FROM gv JOIN vr USING (v) GROUP BY 1),
             |tot AS (
             |  SELECT CAST(sum(cnt) AS BIGINT) AS n,
             |    sum(CAST(cnt AS DECIMAL(12,0)) * CAST(cnt AS DECIMAL(12,0))
             |      * CAST(cnt AS DECIMAL(12,0))
             |      - CAST(cnt AS DECIMAL(19,0))) AS ties
             |  FROM vg),
             |m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS k_groups, max(n) AS n,
             |    sum(CAST(rj2 AS DOUBLE) * CAST(rj2 AS DOUBLE) /
             |      (4.0 * CAST(nj AS DOUBLE))) AS sumterm,
             |    max(ties) AS ties
             |  FROM pg CROSS JOIN tot)
             |SELECT k_groups, n,
             |  round((12.0 * sumterm /
             |      (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)) -
             |    3.0 * CAST(n + 1 AS DOUBLE)) /
             |    (1.0 - CAST(ties AS DOUBLE) /
             |      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) *
             |       CAST(n AS DOUBLE) - CAST(n AS DOUBLE))), 4) AS h
             |FROM m""".stripMargin),
      "Kruskal-Wallis k-group rank test: one (type, cents) pass, " +
        "value-grain ranks, tie-corrected H rounded 4dp"),

    // Krippendorff's alpha — the reliability coefficient that remains
    // comparable across designs (kappa family fails under prevalence
    // skew). Nominal binary, the SAME three deterministic pseudo-raters
    // as eval_fleiss_kappa (deliberately: one fixture, two coefficient
    // families — their disagreement is itself informative). With m=3
    // and no missing values the whole statistic collapses to three
    // integer sums: D_o ∝ Σk(3−k), D_e from the pooled margin, and
    // alpha = 1 − dis·(3N−1) / (2P(3N−P)) ships as ONE exact-integer
    // division chain, unrounded.
    Q("eval_krippendorff_alpha",
      (s, d) => {
        val t = load(s, d, "documents").select(
          (when(col("n_chars") >= 200, 1L).otherwise(0L) +
            when((col("doc_id") * 31) % 100 < 55, 1L).otherwise(0L) +
            when((col("n_chars") + col("doc_id") * 7) % 13 < 7, 1L)
              .otherwise(0L)).as("k"))
        t.agg(count(lit(1)).as("n_items"), sum(col("k")).as("p"),
            sum(col("k") * (lit(3L) - col("k"))).as("dis"))
          .select(col("n_items"),
            (col("dis").cast("double") /
              (lit(3L) * col("n_items")).cast("double")).as("d_o"),
            ((lit(2L) * col("p") * (lit(3L) * col("n_items") - col("p")))
              .cast("double") /
              ((lit(3L) * col("n_items")) *
                (lit(3L) * col("n_items") - 1)).cast("double")).as("d_e"),
            (lit(1.0) -
              (col("dis") * (lit(3L) * col("n_items") - 1)).cast("double") /
                (lit(2L) * col("p") *
                  (lit(3L) * col("n_items") - col("p"))).cast("double"))
              .as("alpha"))
      },
      Some("""WITH t AS (
             |  SELECT
             |    (CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) +
             |    (CASE WHEN (doc_id * 31) % 100 < 55 THEN 1 ELSE 0 END) +
             |    (CASE WHEN (n_chars + doc_id * 7) % 13 < 7
             |          THEN 1 ELSE 0 END) AS k
             |  FROM documents),
             |m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_items,
             |    CAST(sum(k) AS BIGINT) AS p,
             |    CAST(sum(k * (3 - k)) AS BIGINT) AS dis
             |  FROM t)
             |SELECT n_items,
             |  CAST(dis AS DOUBLE) / CAST(3 * n_items AS DOUBLE) AS d_o,
             |  CAST(2 * p * (3 * n_items - p) AS DOUBLE) /
             |    CAST((3 * n_items) * (3 * n_items - 1) AS DOUBLE) AS d_e,
             |  1.0 - CAST(dis * (3 * n_items - 1) AS DOUBLE) /
             |    CAST(2 * p * (3 * n_items - p) AS DOUBLE) AS alpha
             |FROM m""".stripMargin),
      "Krippendorff's alpha (nominal, m=3, no missing): three integer " +
        "sums, exact closed form — the skew-robust reliability gate"),

    // Cochran's Q — McNemar generalized to k=3 paired binary
    // classifiers scored on the SAME documents (eval_mcnemar covers
    // k=2): do the three judge columns differ in positive rate, given
    // per-document pairing? Column totals G_j, row totals L_i, and
    // Q = (k−1)(kΣG_j² − (ΣG_j)²)/(kΣL_i − ΣL_i²) — five integer sums
    // in one map-side pass, one exact division, unrounded.
    Q("eval_cochrans_q",
      (s, d) => {
        val t = load(s, d, "documents").select(
          when(col("n_chars") >= 200, 1L).otherwise(0L).as("c1"),
          when((col("doc_id") * 31) % 100 < 55, 1L).otherwise(0L).as("c2"),
          when((col("n_chars") + col("doc_id") * 7) % 13 < 7, 1L)
            .otherwise(0L).as("c3"))
        t.agg(count(lit(1)).as("n"),
            sum(col("c1")).as("g1"), sum(col("c2")).as("g2"),
            sum(col("c3")).as("g3"),
            sum(col("c1") + col("c2") + col("c3")).as("sl"),
            sum((col("c1") + col("c2") + col("c3")) *
              (col("c1") + col("c2") + col("c3"))).as("sl2"))
          .select(col("n"), col("g1"), col("g2"), col("g3"), lit(2L).as("df"),
            ((lit(2L) * (lit(3L) * (col("g1") * col("g1") +
              col("g2") * col("g2") + col("g3") * col("g3")) -
              col("sl") * col("sl"))).cast("double") /
              (lit(3L) * col("sl") - col("sl2")).cast("double")).as("q"))
      },
      Some("""WITH t AS (
             |  SELECT
             |    CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS c1,
             |    CASE WHEN (doc_id * 31) % 100 < 55 THEN 1 ELSE 0 END
             |      AS c2,
             |    CASE WHEN (n_chars + doc_id * 7) % 13 < 7 THEN 1 ELSE 0
             |      END AS c3
             |  FROM documents),
             |m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(c1) AS BIGINT) AS g1,
             |    CAST(sum(c2) AS BIGINT) AS g2,
             |    CAST(sum(c3) AS BIGINT) AS g3,
             |    CAST(sum(c1 + c2 + c3) AS BIGINT) AS sl,
             |    CAST(sum((c1 + c2 + c3) * (c1 + c2 + c3)) AS BIGINT)
             |      AS sl2
             |  FROM t)
             |SELECT n, g1, g2, g3, CAST(2 AS BIGINT) AS df,
             |  CAST(2 * (3 * (g1 * g1 + g2 * g2 + g3 * g3) - sl * sl)
             |    AS DOUBLE) / CAST(3 * sl - sl2 AS DOUBLE) AS q
             |FROM m""".stripMargin),
      "Cochran's Q for k=3 paired binary classifiers: five integer " +
        "sums map-side, exact division — the k-way McNemar"),

    // Kendall's tau-b between per-nation revenue and shipped quantity
    // — the third correlation lens (Pearson: linear, Spearman:
    // monotone-by-rank, Kendall: pairwise concordance, the most
    // outlier-robust and the right one for small-n grain like 25
    // nations). Nation-grain exact-integer rollup (cents + quantity
    // units) below a broadcast dim join, then ALL pairs from a self
    // equi-free join on the 25-row frame — O(n²) pairs is the
    // ALGORITHM here and n is dimension-bounded, the Theil-Sen pair
    // discipline. Concordant/discordant/tie classification is exact
    // integer sign arithmetic; tau-b ships unrounded (integer moments
    // into one sqrt/division chain).
    Q("profile_kendall_tau",
      (s, d) => {
        val byNation = load(s, d, "lineitem")
          .join(broadcast(load(s, d, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey"))
          .agg(sum(round(col("l_extendedprice") * (lit(1.0) -
            col("l_discount")) * 100).cast("long")).as("x"),
            sum(col("l_quantity").cast("long")).as("y"))
        val pairs = byNation.as("a").crossJoin(byNation.as("b"))
          .filter(col("a.s_nationkey") < col("b.s_nationkey"))
          .select(
            signum((col("a.x") - col("b.x")).cast("double")).cast("long")
              .as("sx"),
            signum((col("a.y") - col("b.y")).cast("double")).cast("long")
              .as("sy"))
        pairs.agg(count(lit(1)).as("n_pairs"),
            sum(when(col("sx") * col("sy") === 1, 1L).otherwise(0L))
              .as("c"),
            sum(when(col("sx") * col("sy") === -1, 1L).otherwise(0L))
              .as("disc"),
            sum(when(col("sx") === 0 && col("sy") =!= 0, 1L).otherwise(0L))
              .as("tx"),
            sum(when(col("sy") === 0 && col("sx") =!= 0, 1L).otherwise(0L))
              .as("ty"))
          .select(col("n_pairs"), col("c"), col("disc"),
            ((col("c") - col("disc")).cast("double") /
              (sqrt((col("c") + col("disc") + col("tx")).cast("double")) *
                sqrt((col("c") + col("disc") + col("ty")).cast("double"))))
              .as("tau_b"))
      },
      Some("""WITH bn AS (
             |  SELECT s_nationkey,
             |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
             |      * 100) AS BIGINT)) AS BIGINT) AS x,
             |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |  GROUP BY 1),
             |pairs AS (
             |  SELECT CAST(sign(a.x - b.x) AS BIGINT) AS sx,
             |    CAST(sign(a.y - b.y) AS BIGINT) AS sy
             |  FROM bn a, bn b WHERE a.s_nationkey < b.s_nationkey),
             |m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             |    CAST(sum(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c,
             |    CAST(sum(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS disc,
             |    CAST(sum(CASE WHEN sx = 0 AND sy <> 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS tx,
             |    CAST(sum(CASE WHEN sy = 0 AND sx <> 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS ty
             |  FROM pairs)
             |SELECT n_pairs, c, disc,
             |  CAST(c - disc AS DOUBLE) /
             |    (sqrt(CAST(c + disc + tx AS DOUBLE)) *
             |     sqrt(CAST(c + disc + ty AS DOUBLE))) AS tau_b
             |FROM m""".stripMargin),
      "Kendall tau-b on the nation-grain rollup: exact integer pair " +
        "concordance over the dimension-bounded frame, tau unrounded"),

    // Wilcoxon signed-rank — the PAIRED nonparametric test (Mann-
    // Whitney assumes independent samples; per-document score deltas
    // are paired): two deterministic md5 integer scores per document
    // with a planted +50 shift, signed ranks of |d| on the |d|-domain
    // rollup (same doubled-mid-rank machinery, zeros excluded per the
    // standard), W+ and the tie-corrected normal z. All moments exact
    // longs (n(n+1)(2n+1) ≈ 2.5e14 at sf0.1, 4 orders of margin);
    // W+ is exact dyadic, z a fixed identical chain.
    Q("quality_wilcoxon_signed",
      (s, d) => {
        val t = load(s, d, "documents").select(
          ((conv(substring(md5(concat(lit("wa|"),
            col("doc_id").cast("string"))), 1, 3), 16, 10).cast("long")
            % 1000) -
            (conv(substring(md5(concat(lit("wb|"),
              col("doc_id").cast("string"))), 1, 3), 16, 10).cast("long")
              % 1000) + 50).as("diff"))
          .filter(col("diff") =!= 0)
          .select(abs(col("diff")).as("ad"),
            (col("diff") > 0).cast("long").as("pos"))
        val byA = t.groupBy(col("ad"))
          .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("cnt_pos"))
          .withColumn("cum",
            sum(col("cnt")).over(Window.orderBy(col("ad"))))
          .withColumn("rank2", col("cum") * 2 - col("cnt") + 1)
        // w2 ≈ 2n², the tie sum and n(n+1)(2n+1) are n³ — long wraps
        // at n ≈ 1.7e6 rows. Quadratic/cubic integer terms accumulate
        // in DECIMAL (exact to n ≈ 1e12); the variance cube runs as a
        // double product of exact longs (identical chain both engines).
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
        def dec12(c: org.apache.spark.sql.Column) = c.cast("decimal(12,0)")
        byA.agg(sum(col("cnt")).as("n"),
            sum(dec(col("cnt_pos")) * dec(col("rank2"))).as("w2"),
            sum(dec12(col("cnt")) * dec12(col("cnt")) * dec12(col("cnt"))
              - dec(col("cnt"))).as("ties"))
          .select(col("n"),
            (col("w2").cast("double") / lit(2.0)).as("w_plus"),
            ((lit(2) * col("w2") - dec(col("n")) * (dec(col("n")) + lit(1)))
              .cast("double") /
              (lit(4.0) * sqrt(
                col("n").cast("double") * (col("n") + 1).cast("double") *
                  (lit(2L) * col("n") + 1).cast("double") / lit(24.0) -
                  col("ties").cast("double") / lit(48.0)))).as("z"))
      },
      Some("""WITH t AS (
             |  SELECT (CAST(concat('0x', substr(md5(concat('wa|',
             |      CAST(doc_id AS VARCHAR))), 1, 3)) AS BIGINT) % 1000) -
             |    (CAST(concat('0x', substr(md5(concat('wb|',
             |      CAST(doc_id AS VARCHAR))), 1, 3)) AS BIGINT) % 1000)
             |    + 50 AS diff
             |  FROM documents),
             |nz AS (
             |  SELECT abs(diff) AS ad,
             |    CASE WHEN diff > 0 THEN 1 ELSE 0 END AS pos
             |  FROM t WHERE diff <> 0),
             |g AS (
             |  SELECT ad, CAST(count(*) AS BIGINT) AS cnt,
             |    CAST(sum(pos) AS BIGINT) AS cnt_pos
             |  FROM nz GROUP BY 1),
             |r AS (
             |  SELECT cnt, cnt_pos,
             |    CAST(sum(cnt) OVER (ORDER BY ad) AS BIGINT) * 2
             |      - cnt + 1 AS rank2
             |  FROM g),
             |m AS (
             |  SELECT CAST(sum(cnt) AS BIGINT) AS n,
             |    sum(CAST(cnt_pos AS DECIMAL(19,0)) *
             |      CAST(rank2 AS DECIMAL(19,0))) AS w2,
             |    sum(CAST(cnt AS DECIMAL(12,0)) * CAST(cnt AS DECIMAL(12,0))
             |      * CAST(cnt AS DECIMAL(12,0))
             |      - CAST(cnt AS DECIMAL(19,0))) AS ties
             |  FROM r)
             |SELECT n, CAST(w2 AS DOUBLE) / 2.0 AS w_plus,
             |  CAST(2 * w2 - CAST(n AS DECIMAL(19,0)) *
             |    (CAST(n AS DECIMAL(19,0)) + 1) AS DOUBLE) /
             |    (4.0 * sqrt(
             |      CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE) *
             |        CAST(2 * n + 1 AS DOUBLE) / 24.0 -
             |      CAST(ties AS DOUBLE) / 48.0)) AS z
             |FROM m""".stripMargin),
      "Wilcoxon signed-rank paired test: doubled mid-ranks on the " +
        "|delta|-domain rollup, planted +50 shift, tie-corrected z"),

    // Simpson's-paradox detector — the aggregation-bias failure mode
    // every pooled dashboard metric risks: within-group slopes all
    // positive while the pooled slope is negative. The planted
    // semantic fixture derives (group, x, y) arithmetically from order
    // keys (y = 2x' within each group, group shifts +10 in x / −30 in
    // y), so the reversal exists BY CONSTRUCTION at every SF and the
    // detector must find it: per-group and pooled OLS slope NUMERATORS
    // as exact integer moments (n·Σxy − Σx·Σy), reversal = pooled
    // negative while every group positive. One map-side pass + a
    // 3-row rollup, all longs.
    Q("quality_simpson_reversal",
      (s, d) => {
        val t = load(s, d, "orders").select(
          (col("o_orderkey") % 3).as("g"),
          (col("o_orderkey") % 7 + (col("o_orderkey") % 3) * 10).as("x"),
          ((col("o_orderkey") % 7) * 2 - (col("o_orderkey") % 3) * 30)
            .as("y"))
        // n·Σxy and Σx·Σy grow ∝ sf² (≈ 312·n²) — long wraps near
        // sf100. The numerators form in DECIMAL(38,0) (exact to
        // n ≈ 5e17); the reversal compare runs on the exact decimals
        // and the reported magnitudes ship as doubles (same exact
        // integer rounded identically on both engines).
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
        val byG = t.groupBy(col("g"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"))
          .select(col("g"), col("n"),
            (dec(col("n")) * dec(col("sxy")) - dec(col("sx")) * dec(col("sy")))
              .as("slope_num"))
        byG.agg(sum(col("n")).as("n"),
            min(col("slope_num")).as("min_group_num"),
            max(col("slope_num")).as("max_group_num"))
          .crossJoin(broadcast(t.agg(
            (dec(count(lit(1))) * dec(sum(col("x") * col("y"))) -
              dec(sum(col("x"))) * dec(sum(col("y")))).as("pooled_num"))))
          .select(col("n"), col("pooled_num").cast("double").as("pooled_num"),
            col("min_group_num").cast("double").as("min_group_num"),
            col("max_group_num").cast("double").as("max_group_num"),
            (col("pooled_num") < 0 && col("min_group_num") > 0)
              .as("reversal"))
      },
      Some("""WITH t AS (
             |  SELECT o_orderkey % 3 AS g,
             |    o_orderkey % 7 + (o_orderkey % 3) * 10 AS x,
             |    (o_orderkey % 7) * 2 - (o_orderkey % 3) * 30 AS y
             |  FROM orders),
             |bg AS (
             |  SELECT g, CAST(count(*) AS BIGINT) AS n,
             |    CAST(count(*) AS DECIMAL(19,0)) *
             |      CAST(sum(x * y) AS DECIMAL(19,0)) -
             |      CAST(sum(x) AS DECIMAL(19,0)) *
             |      CAST(sum(y) AS DECIMAL(19,0)) AS slope_num
             |  FROM t GROUP BY 1),
             |p AS (
             |  SELECT CAST(count(*) AS DECIMAL(19,0)) *
             |      CAST(sum(x * y) AS DECIMAL(19,0)) -
             |      CAST(sum(x) AS DECIMAL(19,0)) *
             |      CAST(sum(y) AS DECIMAL(19,0)) AS pooled_num
             |  FROM t)
             |SELECT CAST(sum(bg.n) AS BIGINT) AS n,
             |  CAST(max(p.pooled_num) AS DOUBLE) AS pooled_num,
             |  CAST(min(bg.slope_num) AS DOUBLE) AS min_group_num,
             |  CAST(max(bg.slope_num) AS DOUBLE) AS max_group_num,
             |  max(p.pooled_num) < 0 AND min(bg.slope_num) > 0
             |    AS reversal
             |FROM bg CROSS JOIN p""".stripMargin),
      "Simpson's-paradox detector: per-group vs pooled OLS slope " +
        "numerators as exact integer moments — planted reversal found " +
        "at every SF"),

    // Chain-ladder development factors — the actuarial/BI triangle:
    // how does cumulative revenue develop as cohorts age? Cohort =
    // order year, age = ship year − order year (0..3), cumulative
    // exact-cents triangle from one join + one (cohort, age) rollup
    // (the frame is years×4 — dimension-bounded), factors
    // f_k = Σ C_{k+1} / Σ C_k over cohorts observed at BOTH ages
    // (lead-with-gap-guard per cohort). Factors are single exact
    // divisions of long sums, unrounded.
    Q("agg_chain_ladder",
      (s, d) => {
        val tri = load(s, d, "lineitem")
          .join(load(s, d, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .select(year(col("o_orderdate")).as("cohort"),
            (year(col("l_shipdate")) - year(col("o_orderdate"))).as("age"),
            round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * 100).cast("long").as("cents"))
          .filter(col("age").between(0, 3))
          .groupBy(col("cohort"), col("age"))
          .agg(sum(col("cents")).as("rev"))
        val w = Window.partitionBy(col("cohort")).orderBy(col("age"))
        val cum = tri
          .withColumn("cum", sum(col("rev")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("next_age", lead(col("age"), 1).over(w))
          .withColumn("next_cum", lead(col("cum"), 1).over(w))
        cum.filter(col("next_age") === col("age") + 1)
          .groupBy(col("age").as("age_from"))
          .agg(count(lit(1)).as("n_cohorts"),
            sum(col("cum")).as("c_cur_total"),
            sum(col("next_cum")).as("c_next_total"))
          .select(col("age_from"), (col("age_from") + 1).as("age_to"),
            col("n_cohorts"), col("c_cur_total"), col("c_next_total"),
            (col("c_next_total").cast("double") /
              col("c_cur_total").cast("double")).as("factor"))
      },
      Some("""WITH tri AS (
             |  SELECT year(o_orderdate) AS cohort,
             |    year(l_shipdate) - year(o_orderdate) AS age,
             |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
             |      * 100) AS BIGINT)) AS BIGINT) AS rev
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE year(l_shipdate) - year(o_orderdate) BETWEEN 0 AND 3
             |  GROUP BY 1, 2),
             |cum0 AS (
             |  SELECT cohort, age,
             |    CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY age
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cum
             |  FROM tri),
             |cum AS (
             |  SELECT cohort, age, cum,
             |    lead(age) OVER (PARTITION BY cohort ORDER BY age)
             |      AS next_age,
             |    CAST(lead(cum) OVER (PARTITION BY cohort ORDER BY age)
             |      AS BIGINT) AS next_cum
             |  FROM cum0)
             |SELECT CAST(age AS INTEGER) AS age_from,
             |  CAST(age + 1 AS INTEGER) AS age_to,
             |  CAST(count(*) AS BIGINT) AS n_cohorts,
             |  CAST(sum(cum) AS BIGINT) AS c_cur_total,
             |  CAST(sum(next_cum) AS BIGINT) AS c_next_total,
             |  CAST(sum(next_cum) AS DOUBLE) / CAST(sum(cum) AS DOUBLE)
             |    AS factor
             |FROM cum WHERE next_age = age + 1
             |GROUP BY age""".stripMargin),
      "chain-ladder development factors: cumulative exact-cents " +
        "(cohort-year, age) triangle, lead-with-gap-guard pairing, " +
        "factors as exact long-sum ratios"),

    // Conditional transition entropy H(next | current) per event type
    // — how predictable is the next user action given the current one?
    // The scalar the Markov transition MATRIX (events_markov_
    // transitions) doesn't give: low entropy = funnel-like determinism,
    // high = exploration. One lag window per user (partitioned, row
    // grain per key), a (cur, next) rollup, entropy over ≤5 next-states
    // per current — per-term libm log2 rounds at 4dp.
    Q("events_transition_entropy",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val trans = load(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("cur"))
          .withColumn("next", lead(col("cur"), 1).over(w))
          .filter(col("next").isNotNull)
          .groupBy(col("cur"), col("next"))
          .agg(count(lit(1)).as("c"))
        val byCur = trans.groupBy(col("cur")).agg(sum(col("c")).as("n"))
        trans.join(broadcast(byCur), Seq("cur"))
          .groupBy(col("cur"))
          .agg(max(col("n")).as("n_trans"),
            round(-sum((col("c").cast("double") / col("n")) *
              log2(col("c").cast("double") / col("n"))), 4).as("h_bits"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type AS cur,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS next
             |  FROM events),
             |t AS (
             |  SELECT cur, next, CAST(count(*) AS BIGINT) AS c
             |  FROM e WHERE next IS NOT NULL GROUP BY 1, 2),
             |bc AS (
             |  SELECT cur, CAST(sum(c) AS BIGINT) AS n FROM t GROUP BY 1)
             |SELECT cur, max(n) AS n_trans,
             |  round(-sum((CAST(c AS DOUBLE) / n) *
             |    log2(CAST(c AS DOUBLE) / n)), 4) AS h_bits
             |FROM t JOIN bc USING (cur)
             |GROUP BY cur""".stripMargin),
      "conditional transition entropy per current event type: one lag " +
        "window per user, (cur, next) rollup, predictability scalar"),

    // Lincoln-Petersen capture-recapture — estimating what QA never
    // saw: two INDEPENDENT detectors each flag a subset; the overlap
    // calibrates total population N̂ = n1·n2/m, so coverage of a
    // third, unseen defect class is quantifiable from two passes.
    // Detectors are independent md5 channels (30% / 40%), the truth N
    // is the corpus size, and the relative error of the estimate is
    // itself an output (the estimator works: err → 0 as n grows).
    // Five integer sums in one map-side pass, single exact divisions.
    Q("quality_capture_recapture",
      (s, d) => {
        val t = load(s, d, "documents").select(
          (conv(substring(md5(concat(lit("d1|"),
            col("doc_id").cast("string"))), 1, 3), 16, 10) % 10 < 3)
            .cast("long").as("f1"),
          (conv(substring(md5(concat(lit("d2|"),
            col("doc_id").cast("string"))), 1, 3), 16, 10) % 10 < 4)
            .cast("long").as("f2"))
        t.agg(count(lit(1)).as("n_true"), sum(col("f1")).as("n1"),
            sum(col("f2")).as("n2"),
            sum(col("f1") * col("f2")).as("m"))
          .select(col("n_true"), col("n1"), col("n2"), col("m"),
            ((col("n1") * col("n2")).cast("double") / col("m"))
              .as("n_hat"),
            round(((col("n1") * col("n2")).cast("double") / col("m") -
              col("n_true")) / col("n_true"), 4).as("rel_err"))
      },
      Some("""WITH t AS (
             |  SELECT
             |    CASE WHEN CAST(concat('0x', substr(md5(concat('d1|',
             |      CAST(doc_id AS VARCHAR))), 1, 3)) AS BIGINT) % 10 < 3
             |      THEN 1 ELSE 0 END AS f1,
             |    CASE WHEN CAST(concat('0x', substr(md5(concat('d2|',
             |      CAST(doc_id AS VARCHAR))), 1, 3)) AS BIGINT) % 10 < 4
             |      THEN 1 ELSE 0 END AS f2
             |  FROM documents),
             |m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_true,
             |    CAST(sum(f1) AS BIGINT) AS n1,
             |    CAST(sum(f2) AS BIGINT) AS n2,
             |    CAST(sum(f1 * f2) AS BIGINT) AS m
             |  FROM t)
             |SELECT n_true, n1, n2, m,
             |  CAST(n1 * n2 AS DOUBLE) / m AS n_hat,
             |  round((CAST(n1 * n2 AS DOUBLE) / m - n_true)
             |    / n_true, 4) AS rel_err
             |FROM m""".stripMargin),
      "Lincoln-Petersen capture-recapture: two independent md5 " +
        "detectors calibrate total population from their overlap — " +
        "the QA-coverage estimator"),

    // Wald-Wolfowitz runs test — is daily traffic RANDOM around its
    // median, or do above/below stretches cluster (trend, regime
    // shifts, weekly cycles)? The randomness gate for residual-based
    // monitors. Day-grain frame: exact lower median via row_number
    // over the ≤31-row rollup, ties-with-median excluded per the
    // standard, runs counted by one lag window, and the normal
    // approximation is a fixed chain over exact integers, unrounded.
    Q("mon_runs_test",
      (s, d) => {
        val day = load(s, d, "events")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"))
        val med = day
          .withColumn("rn", row_number().over(
            Window.orderBy(col("cnt"), col("day"))))
          .withColumn("n", count(lit(1)).over(
            Window.orderBy(lit(1)).rowsBetween(
              Window.unboundedPreceding, Window.unboundedFollowing)))
          .filter(col("rn") === expr("(n + 1) DIV 2"))
          .select(col("cnt").as("median"))
        val signs = day.crossJoin(broadcast(med))
          .filter(col("cnt") =!= col("median"))
          .select(col("day"), (col("cnt") > col("median")).cast("long")
            .as("sgn"))
          .withColumn("prev",
            lag(col("sgn"), 1).over(Window.orderBy(col("day"))))
        signs.agg(count(lit(1)).as("n"), sum(col("sgn")).as("n1"),
            (sum(when(col("prev").isNotNull &&
              col("sgn") =!= col("prev"), 1L).otherwise(0L)) + 1)
              .as("runs"))
          .select(col("n1"), (col("n") - col("n1")).as("n2"), col("runs"),
            ((col("runs") - (lit(1L) + lit(2L) * col("n1") *
              (col("n") - col("n1")) / col("n"))).cast("double") /
              sqrt((lit(2L) * col("n1") * (col("n") - col("n1")) *
                (lit(2L) * col("n1") * (col("n") - col("n1")) - col("n")))
                .cast("double") /
                (col("n") * col("n") * (col("n") - 1)).cast("double")))
              .as("z"))
      },
      Some("""WITH day AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1),
             |med AS (
             |  SELECT cnt AS median FROM (
             |    SELECT cnt, row_number() OVER (ORDER BY cnt, day) AS rn,
             |      count(*) OVER () AS n
             |    FROM day)
             |  WHERE rn = (n + 1) // 2),
             |signs AS (
             |  SELECT day, CASE WHEN cnt > median THEN 1 ELSE 0 END
             |      AS sgn
             |  FROM day CROSS JOIN med WHERE cnt <> median),
             |lagged AS (
             |  SELECT sgn, lag(sgn) OVER (ORDER BY day) AS prev
             |  FROM signs),
             |m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(sgn) AS BIGINT) AS n1,
             |    CAST(sum(CASE WHEN prev IS NOT NULL AND sgn <> prev
             |      THEN 1 ELSE 0 END) + 1 AS BIGINT) AS runs
             |  FROM lagged)
             |SELECT n1, n - n1 AS n2, runs,
             |  CAST(runs - (1 + 2 * n1 * (n - n1) / n) AS DOUBLE) /
             |    sqrt(CAST(2 * n1 * (n - n1) *
             |      (2 * n1 * (n - n1) - n) AS DOUBLE) /
             |      CAST(n * n * (n - 1) AS DOUBLE)) AS z
             |FROM m""".stripMargin),
      "Wald-Wolfowitz runs test on daily arrivals around the exact " +
        "median: one lag window over the day grain, integer chain, " +
        "the randomness gate for residual monitors"),

    // ABC revenue classification — the inventory-analysis classic at
    // its true scale shape: parts ranked by revenue need a GLOBAL
    // cumulative share, and at 100 TB part grain a single-partition
    // window is the classic scale-killer. The catalog's two-phase
    // sweep discipline instead: approx cutoffs (percentile_approx —
    // they only balance buckets, the RESULT is cutoff-independent)
    // bucket the parts, the cumulative sum runs per-bucket (windows
    // partitioned by bucket), and an O(buckets) carry of higher-bucket
    // totals broadcasts back. Class membership is an exact integer
    // compare (cum·100 vs total·80/95), so the classes are identical
    // to the oracle's single-window formulation.
    Q("agg_abc_classification",
      (s, d) => {
        // the part rollup feeds four subplans (cuts, totals, bucket
        // assignment, the sweep) — persist it once or the fact scan
        // and combine run 4× (the 100 TB version of this is a real
        // re-read of the corpus)
        val parts = graft.core.Caching.persistOnce(
          load(s, d, "lineitem")
            .groupBy(col("l_partkey"))
            .agg(sum(round(col("l_extendedprice") * (lit(1.0) -
              col("l_discount")) * 100).cast("long")).as("cents")))
        val cuts = parts.agg(percentile_approx(col("cents"),
          array((1 to 7).map(i => lit(i / 8.0)): _*), lit(100))
          .as("cuts"))
        val bucketed = parts.crossJoin(broadcast(cuts))
          // bucket 0 holds the HIGHEST revenue (descending sweep order):
          // bucket = #cuts at-or-above cents, monotone in -cents
          .withColumn("bucket", expr(
            "aggregate(cuts, 0, (acc, c) -> acc + CAST(cents <= c AS INT))"))
          .drop("cuts")
        val bTotals = bucketed.groupBy(col("bucket"))
          .agg(sum(col("cents")).as("btot"))
          .withColumn("carry",
            coalesce(sum(col("btot")).over(
              org.apache.spark.sql.expressions.Window
                .orderBy(col("bucket"))
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("bucket"), col("carry"))
        val total = parts.agg(sum(col("cents")).as("total"))
        val wb = Window.partitionBy(col("bucket"))
          .orderBy(col("cents").desc, col("l_partkey"))
        bucketed.join(broadcast(bTotals), Seq("bucket"))
          .crossJoin(broadcast(total))
          .withColumn("cum", col("carry") + sum(col("cents")).over(
            wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cls",
            when(col("cum") * 100 <= col("total") * 80, "A")
              .when(col("cum") * 100 <= col("total") * 95, "B")
              .otherwise("C"))
          .groupBy(col("cls"))
          .agg(count(lit(1)).as("n_parts"),
            sum(col("cents")).as("class_cents"),
            (sum(col("cents")).cast("double") / max(col("total")))
              .as("rev_share"))
      },
      Some("""WITH parts AS (
             |  SELECT l_partkey,
             |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
             |      * 100) AS BIGINT)) AS BIGINT) AS cents
             |  FROM lineitem GROUP BY 1),
             |c AS (
             |  SELECT l_partkey, cents,
             |    CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cum,
             |    CAST(sum(cents) OVER () AS BIGINT) AS total
             |  FROM parts)
             |SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
             |    WHEN cum * 100 <= total * 95 THEN 'B'
             |    ELSE 'C' END AS cls,
             |  CAST(count(*) AS BIGINT) AS n_parts,
             |  CAST(sum(cents) AS BIGINT) AS class_cents,
             |  CAST(sum(cents) AS DOUBLE) / max(total) AS rev_share
             |FROM c GROUP BY 1""".stripMargin),
      "ABC revenue classification via the two-phase sweep: bucketed " +
        "windows + O(buckets) carry replace the global-sort cumsum; " +
        "classes exact-integer identical to the single-window oracle"),

    // Laspeyres / Paasche / Fisher price indices between two order
    // years — the economics of "did prices move, holding the basket
    // fixed?": Laspeyres weights by BASE-year quantities (overstates
    // inflation), Paasche by current (understates), Fisher is their
    // geometric mean. Unit values per part are exact-cents/quantity
    // ratios; the base-weighted denominators Σc₀ and numerator Σc₁
    // stay exact longs, the cross terms (q₀·uv₁, q₁·uv₀) are per-part
    // doubles summed across parts — order-unstable, so the three
    // indices round 4dp. Parts must trade in BOTH years (inner join
    // of the two part-year rollups — the matched-basket rule).
    Q("agg_price_index",
      (s, d) => {
        val li = load(s, d, "lineitem")
          .join(load(s, d, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .filter(year(col("o_orderdate")).isin(1995, 1996))
          .groupBy(col("l_partkey"), year(col("o_orderdate")).as("yr"))
          .agg(sum(col("l_quantity").cast("long")).as("q"),
            sum(round(col("l_extendedprice") * (lit(1.0) -
              col("l_discount")) * 100).cast("long")).as("c"))
        val base = li.filter(col("yr") === 1995)
          .select(col("l_partkey"), col("q").as("q0"), col("c").as("c0"))
        val cur = li.filter(col("yr") === 1996)
          .select(col("l_partkey"), col("q").as("q1"), col("c").as("c1"))
        base.join(cur, Seq("l_partkey"))
          .agg(count(lit(1)).as("n_parts"),
            sum(col("c0")).as("sc0"), sum(col("c1")).as("sc1"),
            sum(col("q0").cast("double") *
              (col("c1").cast("double") / col("q1"))).as("l_num"),
            sum(col("q1").cast("double") *
              (col("c0").cast("double") / col("q0"))).as("p_den"))
          .select(col("n_parts"),
            round(col("l_num") / col("sc0"), 4).as("laspeyres"),
            round(col("sc1") / col("p_den"), 4).as("paasche"),
            round(sqrt((col("l_num") / col("sc0")) *
              (col("sc1") / col("p_den"))), 4).as("fisher"))
      },
      Some("""WITH li AS (
             |  SELECT l_partkey, year(o_orderdate) AS yr,
             |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
             |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
             |      * 100) AS BIGINT)) AS BIGINT) AS c
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE year(o_orderdate) IN (1995, 1996)
             |  GROUP BY 1, 2),
             |b AS (SELECT l_partkey, q AS q0, c AS c0 FROM li
             |      WHERE yr = 1995),
             |cu AS (SELECT l_partkey, q AS q1, c AS c1 FROM li
             |       WHERE yr = 1996),
             |m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_parts,
             |    CAST(sum(c0) AS BIGINT) AS sc0,
             |    CAST(sum(c1) AS BIGINT) AS sc1,
             |    sum(CAST(q0 AS DOUBLE) *
             |      (CAST(c1 AS DOUBLE) / q1)) AS l_num,
             |    sum(CAST(q1 AS DOUBLE) *
             |      (CAST(c0 AS DOUBLE) / q0)) AS p_den
             |  FROM b JOIN cu USING (l_partkey))
             |SELECT n_parts,
             |  round(l_num / sc0, 4) AS laspeyres,
             |  round(sc1 / p_den, 4) AS paasche,
             |  round(sqrt((l_num / sc0) * (sc1 / p_den)), 4) AS fisher
             |FROM m""".stripMargin),
      "Laspeyres/Paasche/Fisher price indices on the matched basket: " +
        "exact-cents unit values, base-weighted sums, 4dp"),

    // Distribution-shape anomaly via hourly-entropy: a day whose
    // traffic CONCENTRATES into few hours (bot burst, stuck retry
    // loop) has low entropy even when its total volume is normal —
    // the axis volume monitors can't see. Per-day 24-hour entropy
    // from exact integer counts (libm log2, rounded 4dp), then the
    // anomaly fence runs on the INTEGER-SCALED rounded entropies
    // (e4 = entropy·10⁴ as long): flag iff (n·e4 − Σe4)² >
    // 4·(n·Σe4² − (Σe4)²) — the 2σ compare as exact integer
    // arithmetic, no order-unstable double moments near the boundary.
    Q("mon_entropy_anomaly",
      (s, d) => {
        // planted positive: one synthetic day with ALL traffic in a
        // single hour (entropy exactly 0) — at sf0.1 the real days'
        // hourly mix is uniform enough that no natural day breaches
        // 2σ, and a detector whose positive path never fires at a
        // gate SF is untested by the gate (the degenerate-fixture
        // rule). Entropy of a one-hour day is 0 regardless of the
        // count, so the plant is scale-free. The planted day is
        // DATA-DERIVED (max real day + 30) — collision-free at any
        // fixture date range, same discipline as the planted-id
        // offsets in SimilarityQueries/TextQueries.
        val ev = load(s, d, "events")
        val hourly = ev
          .groupBy(to_date(col("ts")).as("day"),
            hour(col("ts")).as("hr"))
          .agg(count(lit(1)).as("c"))
          .unionByName(ev
            .agg(max(to_date(col("ts"))).as("md"))
            .select(date_add(col("md"), 30).as("day"), lit(3).as("hr"),
              lit(7L).as("c")))
        val byDay = hourly.groupBy(col("day")).agg(sum(col("c")).as("n"))
        val ent = hourly.join(broadcast(byDay), Seq("day"))
          .groupBy(col("day"))
          // + 0.0 normalizes the single-hour day's -0.0 (IEEE: the
          // sum of p·log2(p) terms is -0.0 when every term is; both
          // engines then print a sign the hash compare sees)
          .agg(round(-sum((col("c").cast("double") / col("n")) *
            log2(col("c").cast("double") / col("n"))) + lit(0.0), 4)
            .as("entropy"))
          .withColumn("e4", round(col("entropy") * 10000).cast("long"))
        val w = Window.orderBy(lit(1)).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        ent
          .withColumn("nd", count(lit(1)).over(w))
          .withColumn("se", sum(col("e4")).over(w))
          .withColumn("se2", sum(col("e4") * col("e4")).over(w))
          .select(col("day"), col("entropy"),
            ((col("nd") * col("e4") - col("se")) *
              (col("nd") * col("e4") - col("se")) >
              lit(4L) * (col("nd") * col("se2") - col("se") * col("se")))
              .as("anomaly"))
      },
      Some("""WITH h AS (
             |  SELECT CAST(ts AS DATE) AS day, hour(ts) AS hr,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2
             |  UNION ALL
             |  SELECT CAST(max(ts) AS DATE) + 30, 3,
             |    CAST(7 AS BIGINT) FROM events),
             |bd AS (
             |  SELECT day, CAST(sum(c) AS BIGINT) AS n FROM h
             |  GROUP BY 1),
             |e AS (
             |  SELECT day,
             |    round(-sum((CAST(c AS DOUBLE) / n) *
             |      log2(CAST(c AS DOUBLE) / n)) + 0.0, 4) AS entropy
             |  FROM h JOIN bd USING (day) GROUP BY day),
             |e4t AS (
             |  SELECT day, entropy,
             |    CAST(round(entropy * 10000) AS BIGINT) AS e4
             |  FROM e),
             |m AS (
             |  SELECT day, entropy, e4,
             |    CAST(count(*) OVER () AS BIGINT) AS nd,
             |    CAST(sum(e4) OVER () AS BIGINT) AS se,
             |    CAST(sum(e4 * e4) OVER () AS BIGINT) AS se2
             |  FROM e4t)
             |SELECT day, entropy,
             |  (nd * e4 - se) * (nd * e4 - se) >
             |    4 * (nd * se2 - se * se) AS anomaly
             |FROM m""".stripMargin),
      "hourly-distribution entropy per day with an exact-integer 2σ " +
        "fence on the scaled entropies — concentration anomalies " +
        "volume monitors can't see"),

    // Monthly seasonal index across the multi-year order history —
    // the classical-decomposition companion at the OTHER calendar
    // grain (mon_seasonal_decompose works days-within-month on the
    // event stream; this works months-across-years on orders): index
    // = 12·share vs the uniform month, for volume and exact-cents
    // revenue. 12-row output, one aggregation, exact single-division
    // ratios unrounded.
    Q("agg_seasonal_index",
      (s, d) => {
        val m = load(s, d, "orders")
          .groupBy(month(col("o_orderdate")).as("mo"))
          .agg(count(lit(1)).as("n_orders"),
            sum(round(col("o_totalprice") * 100).cast("long"))
              .as("rev_cents"))
        val tot = m.agg(sum(col("n_orders")).as("tn"),
          sum(col("rev_cents")).as("tr"))
        m.crossJoin(broadcast(tot))
          .select(col("mo"), col("n_orders"), col("rev_cents"),
            (lit(12L) * col("n_orders")).cast("double")./(col("tn"))
              .as("volume_index"),
            (lit(12L) * col("rev_cents")).cast("double")./(col("tr"))
              .as("revenue_index"))
      },
      Some("""WITH m AS (
             |  SELECT month(o_orderdate) AS mo,
             |    CAST(count(*) AS BIGINT) AS n_orders,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS rev_cents
             |  FROM orders GROUP BY 1),
             |t AS (
             |  SELECT CAST(sum(n_orders) AS BIGINT) AS tn,
             |    CAST(sum(rev_cents) AS BIGINT) AS tr
             |  FROM m)
             |SELECT CAST(mo AS INTEGER) AS mo, n_orders, rev_cents,
             |  CAST(12 * n_orders AS DOUBLE) / tn AS volume_index,
             |  CAST(12 * rev_cents AS DOUBLE) / tr AS revenue_index
             |FROM m CROSS JOIN t""".stripMargin),
      "monthly seasonal index over the multi-year order history: " +
        "12·share vs uniform for volume and exact-cents revenue"),

    // Drawdown DURATION — mon_max_drawdown gives depth; operations
    // care how LONG the metric stayed underwater. The demeaned daily
    // series scales to exact integers (equity_t = n·cum_t − t·total —
    // no rational mean anywhere), the running peak is a cumulative
    // max window, and underwater episodes are gaps-and-islands
    // (rn_all − rn_underwater) — all on the ≤31-row day grain, every
    // compare exact. Depth converts to cents by one final /n.
    Q("mon_drawdown_duration",
      (s, d) => {
        val day = load(s, d, "events")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
        val w = Window.orderBy(col("day"))
        val full = Window.orderBy(lit(1)).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        val eq = day
          .withColumn("n", count(lit(1)).over(full))
          .withColumn("total", sum(col("cents")).over(full))
          .withColumn("t", row_number().over(w))
          .withColumn("cum", sum(col("cents")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("equity", col("n") * col("cum") -
            col("t") * col("total"))
          .withColumn("peak", max(col("equity")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("uw", col("equity") < col("peak"))
        val islands = eq.filter(col("uw"))
          .withColumn("rn_uw", row_number().over(w))
          .withColumn("island", col("t") - col("rn_uw"))
          .groupBy(col("island"))
          .agg(count(lit(1)).as("len"),
            max(col("peak") - col("equity")).as("depth_scaled"))
        islands.crossJoin(broadcast(
            eq.agg(count(lit(1)).as("n_days"), max(col("n")).as("n"))))
          .agg(max(col("n_days")).as("n_days"),
            count(lit(1)).as("n_episodes"),
            max(col("len")).as("longest_underwater_days"),
            round(max(col("depth_scaled")).cast("double") /
              max(col("n")), 1).as("max_depth_cents"))
      },
      Some("""WITH day AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             |      AS cents
             |  FROM events GROUP BY 1),
             |eq AS (
             |  SELECT day, cents,
             |    CAST(count(*) OVER () AS BIGINT) AS n,
             |    CAST(sum(cents) OVER () AS BIGINT) AS total,
             |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             |    CAST(sum(cents) OVER (ORDER BY day ROWS BETWEEN
             |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |      AS cum
             |  FROM day),
             |e2 AS (
             |  SELECT day, n, t, n * cum - t * total AS equity
             |  FROM eq),
             |e3 AS (
             |  SELECT day, n, t, equity,
             |    CAST(max(equity) OVER (ORDER BY day ROWS BETWEEN
             |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |      AS peak
             |  FROM e2),
             |uw AS (
             |  SELECT n, t, peak - equity AS gap,
             |    t - row_number() OVER (ORDER BY day) AS island
             |  FROM e3 WHERE equity < peak),
             |isl AS (
             |  SELECT island, CAST(count(*) AS BIGINT) AS len,
             |    CAST(max(gap) AS BIGINT) AS depth_scaled,
             |    max(n) AS n
             |  FROM uw GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM e3)
             |SELECT max(tot.n_days) AS n_days,
             |  CAST(count(*) AS BIGINT) AS n_episodes,
             |  max(len) AS longest_underwater_days,
             |  round(CAST(max(depth_scaled) AS DOUBLE) / max(isl.n), 1)
             |    AS max_depth_cents
             |FROM isl CROSS JOIN tot""".stripMargin),
      "drawdown duration via gaps-and-islands on the exact-integer " +
        "demeaned equity series (n·cum − t·total): longest underwater " +
        "stretch + episode count, depth in cents"))
}
