package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Caching.persistOnce
import graft.core.Tables.load

/** Row-level data-quality expectations — the gate a replication
  * pipeline puts between raw mirrors and consumers (the batch analog
  * of the reference's health-check DAGs, applied to DATA instead of
  * connectors; same contract as Delta Live Tables expectations).
  *
  * Everything is one scan of Column algebra: a rule's predicate is
  * evaluated per row, a NULL predicate result counts as a violation
  * (unknown is not clean), and per-rule stats are conditional sums —
  * no second pass, no UDFs, shuffle only for the final 1-row stats
  * aggregate. */
object Expectations {

  final case class Rule(name: String, predicate: Column)

  private def violated(r: Rule): Column = !coalesce(r.predicate, lit(false))

  /** Append `_violations`: the names of every rule the row fails
    * (empty array = clean row). */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.withColumn("_violations", array_compact(array(
      rules.map(r => when(violated(r), lit(r.name))): _*)))

  /** (clean rows, violating rows with their `_violations` names).
    * Both sides derive from one annotated plan — with the source
    * cached or reused, the filter splits without recomputation. */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val annotated = annotate(df, rules)
    (annotated.filter(size(col("_violations")) === 0).drop("_violations"),
      annotated.filter(size(col("_violations")) > 0))
  }

  /** Per-rule violation counts + row totals, in ONE scan (conditional
    * sums, map-side combined). Columns: n_rows, n_clean, and one
    * `viol_<rule>` per rule. */
  def stats(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val perRule = rules.map(r =>
      sum(when(violated(r), 1L).otherwise(0L)).as(s"viol_${r.name}"))
    val clean = sum(when(rules.map(violated).reduce(_ || _), 0L).otherwise(1L))
      .as("n_clean")
    df.agg(count(lit(1)).as("n_rows"), (clean +: perRule): _*)
  }

  /** One-row table-grain stats (row count + per-column extrema) — the
    * continuous form of the reference's integrity probe, which compares
    * MAX(id) between source and sink per table
    * (cdc_data_integrity_dynamic_dag.py:48-60). `prefix` lets the
    * reference side land as `ref_*` columns next to the sink's. */
  def tableStats(df: DataFrame, maxCols: Seq[String],
                 prefix: String = ""): DataFrame =
    df.agg(count(lit(1)).as(s"${prefix}n_rows"),
      maxCols.map(c => max(col(c)).as(s"${prefix}max_$c")): _*)

  /** Table-grain rule evaluation: annotate the 1-row `sink × reference`
    * stats frame and keep only failed rules — empty result = clean
    * table. Rules see columns `n_rows`/`max_*` (sink) and
    * `ref_n_rows`/`ref_max_*` (reference), e.g.
    * `col("max_id") === col("ref_max_id")` or
    * `abs(col("n_rows") - col("ref_n_rows")) <= 10`. */
  def tableViolations(sinkStats: DataFrame, refStats: DataFrame,
                      rules: Seq[Rule]): DataFrame =
    annotate(sinkStats.crossJoin(refStats), rules)
      .filter(size(col("_violations")) > 0)

  def queries: Seq[Q] = Seq(
    // Table-grain integrity expectation over the CDC spine: the sink
    // side is the fixture stream materialized to current state, the
    // reference side is the source-of-truth expectation derived from
    // `orders` — MAX(id) parity + row-count delta, evaluated
    // continuously instead of on the reference's cron.
    Q("quality_table_integrity",
      (s, d) => {
        val sink = tableStats(graft.cdc.Materialize.currentState(
          CdcQueries.fixtureChanges(s, d), Seq("id")), Seq("id"))
        val src = tableStats(
          graft.core.Tables.load(s, d, "orders")
            .filter(!(col("o_orderkey") % 5 === 0 &&
              col("o_orderkey") % 10 =!= 0))
            .select(col("o_orderkey").as("id")),
          Seq("id"), prefix = "ref_")
        sink.crossJoin(src)
          .withColumn("ok_max_id_parity", col("max_id") === col("ref_max_id"))
          .withColumn("ok_row_count",
            abs(col("n_rows") - col("ref_n_rows")) <= 0)
      },
      Some("""WITH sink AS (
             |  SELECT count(*) AS n_rows, max(id) AS max_id FROM (
             |    SELECT o_orderkey AS id FROM orders
             |    WHERE NOT (o_orderkey % 5 = 0 AND o_orderkey % 10 <> 0)) t),
             |src AS (
             |  SELECT count(*) AS ref_n_rows, max(o_orderkey) AS ref_max_id
             |  FROM orders
             |  WHERE NOT (o_orderkey % 5 = 0 AND o_orderkey % 10 <> 0))
             |SELECT n_rows, max_id, ref_n_rows, ref_max_id,
             |  max_id = ref_max_id AS ok_max_id_parity,
             |  abs(n_rows - ref_n_rows) <= 0 AS ok_row_count
             |FROM sink, src""".stripMargin),
      "table-grain integrity expectation: MAX(pk) parity + row-count " +
        "delta, sink (CDC state) vs source, stats-only scans"),

    Q("quality_expectations",
      (s, d) => {
        val orders = graft.core.Tables.load(s, d, "orders")
        stats(orders, Seq(
          Rule("bounded_total", col("o_totalprice") < 300000),
          Rule("status_known", col("o_orderstatus").isin("P", "O", "F")),
          Rule("urgent_is_recent", col("o_orderpriority") =!= "1-URGENT" ||
            col("o_orderdate") >= "1996-01-01")))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CASE WHEN NOT coalesce(o_totalprice < 300000, FALSE)
             |             OR NOT coalesce(o_orderstatus IN ('P','O','F'), FALSE)
             |             OR NOT coalesce(o_orderpriority <> '1-URGENT'
             |                  OR o_orderdate >= TIMESTAMP '1996-01-01', FALSE)
             |           THEN 0 ELSE 1 END) AS BIGINT) AS n_clean,
             |  CAST(sum(CASE WHEN NOT coalesce(o_totalprice < 300000, FALSE)
             |           THEN 1 ELSE 0 END) AS BIGINT) AS viol_bounded_total,
             |  CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('P','O','F'),
             |             FALSE) THEN 1 ELSE 0 END) AS BIGINT)
             |    AS viol_status_known,
             |  CAST(sum(CASE WHEN NOT coalesce(o_orderpriority <> '1-URGENT'
             |             OR o_orderdate >= TIMESTAMP '1996-01-01', FALSE)
             |           THEN 1 ELSE 0 END) AS BIGINT)
             |    AS viol_urgent_is_recent
             |FROM orders""".stripMargin),
      "row-level expectations: per-rule violation counts + clean total " +
        "in one conditional-sum scan (DLT-style quality gate)"),

    // Sample-ratio-mismatch guardrail: every experimentation platform's
    // first invalidity check — assign units to arms by deterministic
    // hash (md5 first hex digit < '8' ⇒ 50/50, the same stable-under-
    // retries assignment split_train_test uses), then χ² against the
    // designed ratio; for two cells χ² collapses to (a−b)²/n. A
    // failing SRM means the assignment or logging pipeline is biased
    // and every downstream metric is untrustworthy — the check runs
    // BEFORE any effect estimate. One conditional-count scan; the
    // statistic is an exact-integer square over a count, flag at the
    // α=0.05 critical value 3.841.
    Q("quality_srm_check",
      (s, d) => {
        graft.core.Tables.load(s, d, "customer")
          .select((substring(md5(concat(col("c_custkey").cast("string"),
            lit(":ab"))), 1, 1) < "8").as("treat"))
          .agg(sum(when(col("treat"), 1L).otherwise(0L)).as("a"),
            sum(when(!col("treat"), 1L).otherwise(0L)).as("b"))
          .select(col("a"), col("b"),
            round(((col("a") - col("b")) * (col("a") - col("b")))
              .cast("double") / (col("a") + col("b")), 6).as("chi2"),
            (((col("a") - col("b")) * (col("a") - col("b")))
              .cast("double") / (col("a") + col("b")) > 3.841).as("srm"))
      },
      Some("""WITH t AS (SELECT substr(md5(CAST(c_custkey AS VARCHAR)
             |             || ':ab'), 1, 1) < '8' AS treat
             |           FROM customer),
             |c AS (SELECT CAST(sum(CASE WHEN treat THEN 1 ELSE 0 END)
             |        AS BIGINT) AS a,
             |        CAST(sum(CASE WHEN treat THEN 0 ELSE 1 END)
             |        AS BIGINT) AS b
             |      FROM t)
             |SELECT a, b,
             |  round(CAST((a - b) * (a - b) AS DOUBLE) / (a + b), 6)
             |    AS chi2,
             |  CAST((a - b) * (a - b) AS DOUBLE) / (a + b) > 3.841 AS srm
             |FROM c""".stripMargin),
      "sample-ratio-mismatch χ² on a deterministic hash split — one " +
        "conditional-count scan, exact-integer statistic"),

    // CUPED variance reduction (Deng et al.): adjust the experiment
    // metric by its pre-period covariate, ŷ = y − θ(x − x̄), with
    // θ = cov(x,y)/var(x) — the single highest-leverage trick in
    // online experimentation (same effect estimate, tighter CI, often
    // 30-50% variance off). Here y = a user's second-half purchase
    // count, x = first-half (the stand-in pre-period), arms from the
    // same deterministic md5 split the SRM check audits. θ collapses
    // to the integer-moment ratio (n·Σxy − ΣxΣy)/(n·Σx² − (Σx)²) —
    // exact BIGINTs, one division; arm means are exact-count ratios;
    // both the raw and CUPED effect estimates round 6 dp. Shape: one
    // user-grain rollup (split/covariate are map-side on the
    // broadcast midpoint), one O(1) pooled-moment aggregate, one
    // O(arms) rollup.
    Q("quality_cuped_effect",
      (s, d) => {
        val ev = graft.core.Tables.load(s, d, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            (col("event_type") === "purchase").as("pur"))
        val sp = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
        // consumed by pooled moments AND the arm rollup; O(users)
        val user = graft.core.Caching.persistOnce(ev.crossJoin(broadcast(sp))
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("pur") &&
              col("us") <= col("lo") + expr("(hi - lo) div 2"), 1L)
              .otherwise(0L)).as("x"),
            sum(when(col("pur") &&
              col("us") > col("lo") + expr("(hi - lo) div 2"), 1L)
              .otherwise(0L)).as("y"))
          .select(col("x"), col("y"),
            (substring(md5(concat(col("user_id").cast("string"),
              lit(":ab"))), 1, 1) < "8").as("treat")))
        val pooled = user.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sx2"))
        val theta = (col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          (col("n") * col("sx2") - col("sx") * col("sx")).cast("double")
        val arms = user.groupBy(col("treat"))
          .agg(count(lit(1)).as("na"), sum(col("x")).as("ax"),
            sum(col("y")).as("ay"))
        val wide = arms.groupBy()
          .agg(
            max(when(col("treat"), col("na"))).as("nt"),
            max(when(col("treat"), col("ax"))).as("txs"),
            max(when(col("treat"), col("ay"))).as("tys"),
            max(when(!col("treat"), col("na"))).as("nc"),
            max(when(!col("treat"), col("ax"))).as("cxs"),
            max(when(!col("treat"), col("ay"))).as("cys"))
        val xbar = col("sx").cast("double") / col("n")
        val adjT = col("tys").cast("double") / col("nt") -
          theta * (col("txs").cast("double") / col("nt") - xbar)
        val adjC = col("cys").cast("double") / col("nc") -
          theta * (col("cxs").cast("double") / col("nc") - xbar)
        wide.crossJoin(broadcast(pooled))
          .select(col("nt"), col("nc"), round(theta, 6).as("theta"),
            round(col("tys").cast("double") / col("nt") -
              col("cys").cast("double") / col("nc"), 6).as("raw_effect"),
            round(adjT - adjC, 6).as("cuped_effect"))
      },
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts) AS us,
             |             event_type = 'purchase' AS pur
             |           FROM events),
             |sp AS (SELECT min(us) AS lo, max(us) AS hi FROM ev),
             |u AS (SELECT user_id,
             |    sum(CASE WHEN pur AND us <= lo + (hi - lo) // 2
             |             THEN 1 ELSE 0 END) AS x,
             |    sum(CASE WHEN pur AND us > lo + (hi - lo) // 2
             |             THEN 1 ELSE 0 END) AS y
             |  FROM ev CROSS JOIN sp GROUP BY 1),
             |ua AS (SELECT x, y,
             |    substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 1)
             |      < '8' AS treat
             |  FROM u),
             |pooled AS (SELECT count(*) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * y) AS BIGINT) AS sxy,
             |    CAST(sum(x * x) AS BIGINT) AS sx2
             |  FROM ua),
             |arms AS (SELECT
             |    max(CASE WHEN treat THEN na END) AS nt,
             |    max(CASE WHEN treat THEN ax END) AS txs,
             |    max(CASE WHEN treat THEN ay END) AS tys,
             |    max(CASE WHEN NOT treat THEN na END) AS nc,
             |    max(CASE WHEN NOT treat THEN ax END) AS cxs,
             |    max(CASE WHEN NOT treat THEN ay END) AS cys
             |  FROM (SELECT treat, count(*) AS na,
             |          CAST(sum(x) AS BIGINT) AS ax,
             |          CAST(sum(y) AS BIGINT) AS ay
             |        FROM ua GROUP BY 1) g)
             |SELECT nt, nc,
             |  round(CAST(n * sxy - sx * sy AS DOUBLE)
             |    / CAST(n * sx2 - sx * sx AS DOUBLE), 6) AS theta,
             |  round(CAST(tys AS DOUBLE) / nt - CAST(cys AS DOUBLE) / nc, 6)
             |    AS raw_effect,
             |  round((CAST(tys AS DOUBLE) / nt
             |      - (CAST(n * sxy - sx * sy AS DOUBLE)
             |         / CAST(n * sx2 - sx * sx AS DOUBLE))
             |        * (CAST(txs AS DOUBLE) / nt - CAST(sx AS DOUBLE) / n))
             |    - (CAST(cys AS DOUBLE) / nc
             |      - (CAST(n * sxy - sx * sy AS DOUBLE)
             |         / CAST(n * sx2 - sx * sx AS DOUBLE))
             |        * (CAST(cxs AS DOUBLE) / nc - CAST(sx AS DOUBLE) / n)),
             |    6) AS cuped_effect
             |FROM arms, pooled""".stripMargin),
      "CUPED-adjusted experiment effect from exact integer moments — " +
        "θ, raw and adjusted estimates hash-checked; one user rollup, " +
        "O(1) moment frames"),

    // Inverse-propensity weighting — the OBSERVATIONAL causal
    // estimator (CUPED's sibling for when assignment was NOT uniform):
    // treatment here deliberately confounds with the customer segment
    // (hash-assigned at ~3/4 for two segments, ~1/4 for the rest), so
    // the naive treated-vs-control difference mixes segment effects;
    // IPW reweights each user by 1/p̂(stratum) to recover the
    // population estimand. Propensities are ESTIMATED per stratum as
    // exact count ratios; strata violating POSITIVITY (no treated or
    // no control) are excluded by the inner join — the textbook
    // support condition, applied identically by the oracle. Scale
    // shape: one user rollup (user-keyed exchange), stratum stats are
    // O(strata) rows broadcast back, one final 1-row aggregate. The
    // weighted sums are order-unstable doubles → rounded 2 dp before
    // the (deterministic) final arithmetic; naive means are exact
    // int-ratio divisions, unrounded.
    Q("quality_ipw_effect",
      (s, d) => {
        val y = graft.core.Tables.load(s, d, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(sum(round(col("value") * 100).cast("long")).as("y_c"))
        val seg = graft.core.Tables.load(s, d, "customer")
          .select(col("c_custkey").as("user_id"),
            col("c_mktsegment").isin("AUTOMOBILE", "BUILDING").as("hi"))
        val base = y.join(broadcast(seg), "user_id")
          .withColumn("t", (substring(md5(concat(
            col("user_id").cast("string"), lit(":ipw"))), 1, 2) <
            when(col("hi"), "c0").otherwise("40")).cast("long"))
        val strata = base.groupBy(col("hi"))
          .agg(count(lit(1)).as("n_s"), sum(col("t")).as("nt_s"))
          .filter(col("nt_s") > 0 && col("nt_s") < col("n_s")) // positivity
        val w = base.join(broadcast(strata), "hi")
          .withColumn("p", col("nt_s").cast("double") /
            col("n_s").cast("double"))
        val m = w.agg(count(lit(1)).as("n_users"),
          sum(col("t")).as("n_treated"),
          sum(when(col("t") === 1, col("y_c"))).as("yt_c"),
          sum(when(col("t") === 0, col("y_c"))).as("yc_c"),
          round(sum(col("y_c").cast("double") / 100.0 *
            col("t").cast("double") / col("p")), 2).as("s1"),
          round(sum(col("y_c").cast("double") / 100.0 *
            (lit(1.0) - col("t").cast("double")) /
            (lit(1.0) - col("p"))), 2).as("s0"))
        m.select(col("n_users"), col("n_treated"),
          (col("yt_c").cast("double") / 100.0 /
            col("n_treated").cast("double") -
            col("yc_c").cast("double") / 100.0 /
            (col("n_users") - col("n_treated")).cast("double"))
            .as("naive_diff"),
          round((col("s1") - col("s0")) /
            col("n_users").cast("double"), 6).as("ipw_ate"))
      },
      Some("""WITH y AS (
             |  SELECT user_id,
             |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             |      AS y_c
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |base AS (
             |  SELECT y.user_id, y.y_c,
             |    c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING') AS hi,
             |    CASE WHEN substr(md5(CAST(y.user_id AS VARCHAR) || ':ipw'),
             |        1, 2) < (CASE WHEN c.c_mktsegment IN
             |          ('AUTOMOBILE', 'BUILDING') THEN 'c0' ELSE '40' END)
             |      THEN 1 ELSE 0 END AS t
             |  FROM y JOIN customer c ON y.user_id = c.c_custkey),
             |strata AS (
             |  SELECT hi, count(*) AS n_s, CAST(sum(t) AS BIGINT) AS nt_s
             |  FROM base GROUP BY 1
             |  HAVING sum(t) > 0 AND sum(t) < count(*)),
             |w AS (
             |  SELECT b.*, CAST(nt_s AS DOUBLE) / CAST(n_s AS DOUBLE) AS p
             |  FROM base b JOIN strata USING (hi)),
             |m AS (
             |  SELECT count(*) AS n_users, CAST(sum(t) AS BIGINT)
             |      AS n_treated,
             |    CAST(sum(CASE WHEN t = 1 THEN y_c END) AS BIGINT) AS yt_c,
             |    CAST(sum(CASE WHEN t = 0 THEN y_c END) AS BIGINT) AS yc_c,
             |    round(sum(CAST(y_c AS DOUBLE) / 100.0 * CAST(t AS DOUBLE)
             |      / p), 2) AS s1,
             |    round(sum(CAST(y_c AS DOUBLE) / 100.0
             |      * (1.0 - CAST(t AS DOUBLE)) / (1.0 - p)), 2) AS s0
             |  FROM w)
             |SELECT n_users, n_treated,
             |  CAST(yt_c AS DOUBLE) / 100.0 / CAST(n_treated AS DOUBLE)
             |    - CAST(yc_c AS DOUBLE) / 100.0
             |      / CAST(n_users - n_treated AS DOUBLE) AS naive_diff,
             |  round((s1 - s0) / CAST(n_users AS DOUBLE), 6) AS ipw_ate
             |FROM m""".stripMargin),
      "IPW causal effect under confounded hash assignment: stratum " +
        "propensities as exact count ratios, positivity-violating " +
        "strata excluded, naive vs reweighted estimates side by side"),

    // Decision-stump feature selection: information gain of each
    // candidate categorical feature against a binary label (high-value
    // order) — the split criterion of every tree learner and the
    // standard "which column predicts the outcome" triage in feature
    // stores. Algebra: H(S) − Σ_v (n_v/N)·H(S|v) collapses to
    // log2(N) + (A − B − C)/N with A = Σ_cells n·log2 n over
    // (value,label) cells, B = Σ_v n_v·log2 n_v, C = Σ_c n_c·log2 n_c
    // — so ONE (feature,value,label) count cube (stack() unpivot,
    // map-side combine, shuffle ∝ cells not rows) feeds three
    // O(cells) rollups and the gain needs no per-value join. Per-cell
    // n·log2 n is bitwise cross-engine; the order-unstable cell sums
    // are rounded 6 dp after the final division (noise ~1e-14).
    Q("quality_info_gain",
      (s, d) => {
        val cust = load(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        val base = load(s, d, "orders")
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .select(
            when(col("o_totalprice") > 250000, lit(1)).otherwise(lit(0))
              .as("label"),
            col("o_orderpriority").as("priority"),
            col("o_orderstatus").as("status"),
            col("c_mktsegment").as("segment"))
        val long = base.selectExpr("label",
          "stack(3, 'priority', priority, 'status', status, " +
            "'segment', segment) AS (feature, val)")
        val cnt = persistOnce(long
          .groupBy(col("feature"), col("val"), col("label"))
          .agg(count(lit(1)).as("n")))
        val a = cnt.groupBy("feature").agg(
          sum(col("n") * log2(col("n"))).as("a_cells"),
          sum(col("n")).as("nn"))
        val b = cnt.groupBy("feature", "val").agg(sum(col("n")).as("nv"))
          .groupBy("feature")
          .agg(sum(col("nv") * log2(col("nv"))).as("b_vals"),
            count(lit(1)).as("n_values"))
        val c = cnt.groupBy("feature", "label").agg(sum(col("n")).as("nc"))
          .groupBy("feature").agg(sum(col("nc") * log2(col("nc"))).as("c_labels"))
        a.join(b, "feature").join(c, "feature")
          .select(col("feature"), col("n_values"),
            round(log2(col("nn")) +
              (col("a_cells") - col("b_vals") - col("c_labels")) / col("nn"),
              6).as("info_gain"))
      },
      Some("""WITH base AS (
             |  SELECT CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END
             |      AS label,
             |    o_orderpriority AS priority, o_orderstatus AS status,
             |    c_mktsegment AS segment
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |lng AS (
             |  SELECT 'priority' AS feature, priority AS val, label FROM base
             |  UNION ALL SELECT 'status', status, label FROM base
             |  UNION ALL SELECT 'segment', segment, label FROM base),
             |cnt AS (SELECT feature, val, label, count(*) AS n
             |        FROM lng GROUP BY 1, 2, 3),
             |a AS (SELECT feature, sum(n * log2(n)) AS a_cells,
             |        CAST(sum(n) AS BIGINT) AS nn FROM cnt GROUP BY 1),
             |b AS (SELECT feature, sum(nv * log2(nv)) AS b_vals,
             |        CAST(count(*) AS BIGINT) AS n_values
             |      FROM (SELECT feature, val, CAST(sum(n) AS BIGINT) AS nv
             |            FROM cnt GROUP BY 1, 2) v GROUP BY 1),
             |c AS (SELECT feature, sum(nc * log2(nc)) AS c_labels
             |      FROM (SELECT feature, label, CAST(sum(n) AS BIGINT) AS nc
             |            FROM cnt GROUP BY 1, 2) l GROUP BY 1)
             |SELECT feature, n_values,
             |  round(log2(nn) + (a_cells - b_vals - c_labels) / nn, 6)
             |    AS info_gain
             |FROM a JOIN b USING (feature) JOIN c USING (feature)"""
        .stripMargin),
      "decision-stump information gain per candidate feature from one " +
        "(feature,value,label) count cube — shuffle ∝ cells, not rows"),

    // Chi-square independence audit (the categorical sibling of
    // [[quality_info_gain]]'s entropy view): is o_orderpriority
    // independent of o_orderstatus? One (r × c) count cube — shuffle ∝
    // cells — then O(cells) driver-free math: expected E = R·C/N, the
    // statistic Σ(O−E)²/E, and Cramér's V = sqrt(χ²/(N·min(r−1,c−1)))
    // as the [0,1] effect size a profiler thresholds on (χ² alone
    // grows with N, so at 100 TB EVERYTHING is "significant" — V is
    // the scale-free signal). Integer-only cube; the per-cell term is
    // a fixed IEEE chain, the ~15-term sum is order-unstable → χ²
    // rounds 4 dp before V derives from it.
    Q("quality_chi_square",
      (s, d) => {
        val cube = persistOnce(load(s, d, "orders")
          .groupBy(col("o_orderpriority").as("r"),
            col("o_orderstatus").as("c"))
          .agg(count(lit(1)).as("o")))
        val rt = cube.groupBy("r").agg(sum(col("o")).as("rn"))
        val ct = cube.groupBy("c").agg(sum(col("o")).as("cn"))
        val tot = cube.agg(sum(col("o")).as("n"),
          countDistinct(col("r")).as("nr"),
          countDistinct(col("c")).as("nc"))
        cube.join(rt, "r").join(ct, "c").crossJoin(tot)
          .select(col("n"), col("nr"), col("nc"),
            (col("o") - col("rn") * col("cn") / col("n").cast("double"))
              .as("dev"),
            (col("rn") * col("cn") / col("n").cast("double")).as("e"))
          .groupBy(col("n"), col("nr"), col("nc"))
          .agg(round(sum(col("dev") * col("dev") / col("e")), 4).as("chi2"))
          .select(col("n"), col("nr"), col("nc"),
            ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
            col("chi2"),
            round(sqrt(col("chi2") /
              (col("n") * least(col("nr") - 1, col("nc") - 1))), 6)
              .as("cramers_v"))
      },
      Some("""WITH cube AS (
             |  SELECT o_orderpriority AS r, o_orderstatus AS c,
             |    count(*) AS o
             |  FROM orders GROUP BY 1, 2),
             |rt AS (SELECT r, sum(o) AS rn FROM cube GROUP BY 1),
             |ct AS (SELECT c, sum(o) AS cn FROM cube GROUP BY 1),
             |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
             |    CAST(count(DISTINCT r) AS BIGINT) AS nr,
             |    CAST(count(DISTINCT c) AS BIGINT) AS nc
             |  FROM cube),
             |chi AS (
             |  SELECT n, nr, nc,
             |    round(sum((o - rn * cn / CAST(n AS DOUBLE))
             |      * (o - rn * cn / CAST(n AS DOUBLE))
             |      / (rn * cn / CAST(n AS DOUBLE))), 4) AS chi2
             |  FROM cube JOIN rt USING (r) JOIN ct USING (c), tot
             |  GROUP BY 1, 2, 3)
             |SELECT n, nr, nc, (nr - 1) * (nc - 1) AS dof, chi2,
             |  round(sqrt(chi2 / (n * least(nr - 1, nc - 1))), 6)
             |    AS cramers_v
             |FROM chi""".stripMargin),
      "chi-square independence + Cramér's V from one count cube — the " +
        "scale-free categorical-association audit (χ² inflates with N; " +
        "V is what a 100 TB profiler thresholds)"),

    // Welch's unequal-variance t-test between two segments — the
    // default two-sample comparison (Student's pooled test silently
    // assumes equal variances; Welch is what experimentation platforms
    // actually run). One map-side-combined aggregate per segment
    // yields the exact integer moments (n, Σx, Σx²) in whole DOLLARS —
    // overflow-audited at worst case: n·max² ≤ 3e4·2.5e11 ≈ 7.5e15 at
    // sf0.1, « 2⁶³; beyond ~3.7e7 rows the sums move to DECIMAL(38).
    // The t statistic and the Welch–Satterthwaite df derive from the
    // moments in a fixed single-op IEEE chain (identical expression
    // trees both engines), rounded 6/4 dp only at the end.
    Q("quality_welch_ttest",
      (s, d) => {
        val o = load(s, d, "orders")
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .select(col("o_orderpriority").as("seg"),
            round(col("o_totalprice")).cast("long").as("x"))
        val m = o.groupBy(col("seg"))
          // Σx² accumulates n dollar² summands (≤ ~2.5e11 each): long
          // wraps near 3.7e7 rows (~sf25) — DECIMAL(38,0) is exact to
          // 1e38 and casts to double once, at use (audit v2 SUMPROD)
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("x").cast("decimal(19,0)") *
              col("x").cast("decimal(19,0)")).as("sxx"))
          .select(col("seg"), col("n"), col("sx"), col("sxx"),
            (col("sx") / col("n").cast("double")).as("mean"),
            // sx cast to double BEFORE the square: the long×long
            // product overflows past ~3e9 total (sf0.1 upward)
            ((col("sxx").cast("double") - col("sx").cast("double") * col("sx") /
              col("n").cast("double")) /
              (col("n") - 1).cast("double")).as("v"))
        val a = m.filter(col("seg") === "1-URGENT")
          .select(col("n").as("n1"), col("mean").as("m1"), col("v").as("v1"))
        val b = m.filter(col("seg") === "5-LOW")
          .select(col("n").as("n2"), col("mean").as("m2"), col("v").as("v2"))
        a.crossJoin(b)
          .select(col("n1"), col("n2"),
            round(col("m1") - col("m2"), 4).as("mean_diff"),
            round((col("m1") - col("m2")) /
              sqrt(col("v1") / col("n1") + col("v2") / col("n2")), 6)
              .as("t_stat"),
            round(
              pow(col("v1") / col("n1") + col("v2") / col("n2"), 2) /
                (pow(col("v1") / col("n1"), 2) / (col("n1") - 1) +
                  pow(col("v2") / col("n2"), 2) / (col("n2") - 1)), 4)
              .as("df_welch"))
      },
      Some("""WITH o AS (
             |  SELECT o_orderpriority AS seg,
             |    CAST(round(o_totalprice) AS BIGINT) AS x
             |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
             |m AS (
             |  SELECT seg, CAST(count(*) AS BIGINT) AS n,
             |    sum(x) AS sx, sum(x * x) AS sxx
             |  FROM o GROUP BY 1),
             |mm AS (
             |  SELECT seg, n, sx / CAST(n AS DOUBLE) AS mean,
             |    (sxx - CAST(sx AS DOUBLE) * sx / CAST(n AS DOUBLE))
             |      / CAST(n - 1 AS DOUBLE) AS v
             |  FROM m),
             |a AS (SELECT n AS n1, mean AS m1, v AS v1 FROM mm
             |      WHERE seg = '1-URGENT'),
             |b AS (SELECT n AS n2, mean AS m2, v AS v2 FROM mm
             |      WHERE seg = '5-LOW')
             |SELECT n1, n2, round(m1 - m2, 4) AS mean_diff,
             |  round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
             |  round(pow(v1 / n1 + v2 / n2, 2)
             |    / (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1)),
             |    4) AS df_welch
             |FROM a, b""".stripMargin),
      "Welch unequal-variance t-test from exact integer moments — one " +
        "map-side aggregate per segment, fixed IEEE chain for t and " +
        "the Satterthwaite df"),

    // k-anonymity / l-diversity release audit (Sweeney; Machanavajjhala
    // et al.): before publishing a grouped extract, every
    // quasi-identifier group must hold ≥ k individuals (re-identification
    // bound) AND ≥ l distinct sensitive values (homogeneity-attack
    // bound). One (QI, sensitive)-cube pass — shuffle ∝ cells — then
    // O(groups) math: group size, sensitive diversity, both flags, and
    // the released count NULLED for violating groups (suppression, the
    // standard first remedy). QI = (id band, segment) where the band is
    // the sqrt bucket — an age-band-like coarsening whose group-size
    // distribution spans small AND large groups at EVERY SF (sizes grow
    // ~2j+1 with band index), so the release and suppression branches
    // are both live at every gate; sensitive = balance-sign bucket.
    Q("quality_kanon_release",
      (s, d) => {
        val k = 4L
        val l = 2L
        val cube = persistOnce(load(s, d, "customer")
          .select(floor(sqrt(col("c_custkey"))).cast("long").as("band"),
            col("c_mktsegment").as("segment"),
            when(col("c_acctbal") < 0, "neg")
              .when(col("c_acctbal") < 4500, "mid")
              .otherwise("high").as("bal_bucket"))
          .groupBy(col("band"), col("segment"), col("bal_bucket"))
          .agg(count(lit(1)).as("n")))
        cube.groupBy(col("band"), col("segment"))
          .agg(sum(col("n")).as("group_n"),
            count(lit(1)).as("l_diversity"))
          .select(col("band"), col("segment"), col("group_n"),
            col("l_diversity"),
            (col("group_n") >= k).as("k_anonymous"),
            (col("l_diversity") >= l).as("l_diverse"),
            when(col("group_n") >= k && col("l_diversity") >= l,
              col("group_n")).cast("long").as("released_n"))
      },
      Some("""WITH cube AS (
             |  SELECT CAST(floor(sqrt(c_custkey)) AS BIGINT) AS band,
             |    c_mktsegment AS segment,
             |    CASE WHEN c_acctbal < 0 THEN 'neg'
             |         WHEN c_acctbal < 4500 THEN 'mid'
             |         ELSE 'high' END AS bal_bucket,
             |    count(*) AS n
             |  FROM customer GROUP BY 1, 2, 3)
             |SELECT band, segment,
             |  CAST(sum(n) AS BIGINT) AS group_n,
             |  CAST(count(*) AS BIGINT) AS l_diversity,
             |  sum(n) >= 4 AS k_anonymous,
             |  count(*) >= 2 AS l_diverse,
             |  CAST(CASE WHEN sum(n) >= 4 AND count(*) >= 2
             |       THEN sum(n) END AS BIGINT) AS released_n
             |FROM cube GROUP BY 1, 2""".stripMargin),
      "k-anonymity + l-diversity release audit from one QI×sensitive " +
        "cube: group sizes, diversity, and the suppressed release — " +
        "both pass and suppress branches live at every SF"),

    // Differential-privacy count release (Dwork's ε-DP Laplace
    // mechanism) — the formal-privacy sibling of the k-anonymity
    // audit above: each per-nation customer count is released as
    // n + Laplace(Δ/ε) with sensitivity Δ = 1 (one individual moves
    // one count by one), ε = 0.5. The noise draw inverts the Laplace
    // CDF against the engine's deterministic md5-uniform (the same
    // hash-RNG every sampling query uses — no RNG state, stable under
    // retries/repartitioning, and REPLAYABLE in the oracle, which is
    // exactly what a production privacy layer wants for audit:
    // per-release seeds, not ambient randomness). u = (2·hv+1)/2³³ is
    // a dyadic rational strictly inside (0,1) that can never equal ½,
    // so sign and log stay well-defined; |noise| ≤ (1/ε)·ln 2³² ≈ 44.
    // One map-side count rollup, O(groups) noise math; noised values
    // rounded 4 dp (ln drifts ~1 ulp cross-engine), the ε ledger and
    // the realized absolute error emitted beside the release.
    Q("quality_dp_release",
      (s, d) => {
        val eps = 0.5
        val hv = conv(substring(md5(concat(col("c_nationkey").cast("string"),
          lit(":dp"))), 1, 8), 16, 10).cast("double")
        val u = (hv * 2 + 1) / lit(8589934592.0)
        val noise = (-lit(1.0) / eps) * signum(u - 0.5) *
          log(lit(1.0) - lit(2.0) * abs(u - 0.5))
        load(s, d, "customer")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n"))
          .select(col("c_nationkey"), col("n"),
            round(col("n") + noise, 4).as("released_n"),
            round(abs(noise), 4).as("abs_err"),
            lit(eps).as("epsilon_spent"))
      },
      Some("""WITH g AS (
             |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n
             |  FROM customer GROUP BY 1),
             |h AS (
             |  SELECT *, list_reduce(list_transform(range(1, 9),
             |      i -> CAST(strpos('0123456789abcdef',
             |        substr(md5(CAST(c_nationkey AS VARCHAR) || ':dp'),
             |          i, 1)) - 1 AS DOUBLE)),
             |      (a, x) -> a * 16 + x) AS hv
             |  FROM g),
             |z AS (
             |  SELECT c_nationkey, n, (hv * 2 + 1) / 8589934592.0 AS u
             |  FROM h),
             |nz AS (
             |  SELECT c_nationkey, n,
             |    (-1.0 / 0.5) * sign(u - 0.5)
             |      * ln(1.0 - 2.0 * abs(u - 0.5)) AS noise
             |  FROM z)
             |SELECT c_nationkey, n,
             |  round(n + noise, 4) AS released_n,
             |  round(abs(noise), 4) AS abs_err,
             |  CAST(0.5 AS DOUBLE) AS epsilon_spent
             |FROM nz""".stripMargin),
      "ε-differential-privacy count release: Laplace(1/ε) noise " +
        "inverted from the deterministic md5-uniform — replayable " +
        "draws, O(groups) noise math on one map-side rollup, ε ledger " +
        "and realized error beside the release"),

    // Difference-in-differences — the causal-inference family member
    // between CUPED (variance reduction) and IPW (confounding
    // adjustment): when treatment wasn't randomized but a PRE period
    // exists, the effect estimate is (post_T − pre_T) − (post_C −
    // pre_C), differencing out both the group baseline and the common
    // time trend. Four cell means from ONE map-side-combined
    // (treated, post) rollup over exact cents; every output is an
    // integer-ratio mean or a single subtraction chain — unrounded
    // hash-match. Cohorts and the period cutoff are deterministic
    // (customer-key parity, 1998 cutoff), so all four cells are
    // populated at every SF.
    Q("quality_did_effect",
      (s, d) => {
        val cells = load(s, d, "orders")
          .select((col("o_custkey") % 2 === 0).as("treated"),
            (year(col("o_orderdate")) >= 1998).as("post"),
            round(col("o_totalprice") * 100).cast("long").as("c"))
          .groupBy(col("treated"), col("post"))
          .agg(count(lit(1)).as("n"), sum(col("c")).as("s1"))
          .withColumn("m", col("s1").cast("double") / col("n").cast("double"))
        val w = cells.groupBy()
          .pivot(concat(when(col("treated"), lit("t")).otherwise(lit("c")),
            when(col("post"), lit("_post")).otherwise(lit("_pre"))),
            Seq("t_pre", "t_post", "c_pre", "c_post"))
          .agg(first(col("m")))
        w.select(col("t_pre"), col("t_post"), col("c_pre"), col("c_post"),
          ((col("t_post") - col("t_pre")) - (col("c_post") - col("c_pre")))
            .as("did_cents"))
      },
      Some("""WITH cells AS (
             |  SELECT (o_custkey % 2 = 0) AS treated,
             |    (year(o_orderdate) >= 1998) AS post,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS s1
             |  FROM orders GROUP BY 1, 2),
             |m AS (
             |  SELECT treated, post,
             |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m
             |  FROM cells)
             |SELECT
             |  (SELECT m FROM m WHERE treated AND NOT post) AS t_pre,
             |  (SELECT m FROM m WHERE treated AND post) AS t_post,
             |  (SELECT m FROM m WHERE NOT treated AND NOT post) AS c_pre,
             |  (SELECT m FROM m WHERE NOT treated AND post) AS c_post,
             |  ((SELECT m FROM m WHERE treated AND post)
             |    - (SELECT m FROM m WHERE treated AND NOT post))
             |  - ((SELECT m FROM m WHERE NOT treated AND post)
             |    - (SELECT m FROM m WHERE NOT treated AND NOT post))
             |    AS did_cents""".stripMargin),
      "difference-in-differences from one (treated, post) rollup: four " +
        "exact-cents cell means, the common time trend differenced out " +
        "— single-op chains, unrounded"),

    // Disparate-impact audit of a curation filter (the four-fifths /
    // 80% rule from US EEOC selection analysis, the standard first
    // fairness probe on a training-data pipeline): does the corpus
    // quality cutoff (n_chars >= 200 here) select documents of some
    // languages at materially lower rates than the most-selected
    // language? Per group: selection rate, impact ratio vs the best
    // rate, the 80%-rule flag, and the statistical-parity difference.
    // One (lang)-keyed rollup of integer counts + a 1-row broadcast of
    // the reference rate; ratios stay exact INTEGER cross-products
    // (n_sel·ref_n vs ref_sel·n) for the flag so the pass/fail never
    // rides a float boundary; reported rates are single divisions.
    Q("quality_disparate_impact",
      (s, d) => {
        val g = persistOnce(load(s, d, "documents")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("n_chars") >= 200, 1L).otherwise(0L))
              .as("n_sel")))
        // reference = the highest selection rate (exact fraction
        // compare via cross-multiplication, ties to the larger group
        // then lang for determinism)
        val ref = g.select(col("lang").as("ref_lang"),
            col("n").as("ref_n"), col("n_sel").as("ref_sel"))
          .orderBy(expr("(ref_sel * 1000000000) div ref_n").desc,
            col("ref_n").desc, col("ref_lang"))
          .limit(1)
        g.crossJoin(broadcast(ref))
          .select(col("lang"), col("n"), col("n_sel"),
            (col("n_sel").cast("double") / col("n")).as("sel_rate"),
            ((col("n_sel") * col("ref_n")).cast("double") /
              (col("ref_sel") * col("n"))).as("impact_ratio"),
            (col("n_sel") * col("ref_n") * lit(5) <
              col("ref_sel") * col("n") * lit(4)).as("below_80pct"),
            (col("n_sel").cast("double") / col("n") -
              col("ref_sel").cast("double") / col("ref_n"))
              .as("parity_diff"))
      },
      Some("""WITH g AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_sel
             |  FROM documents GROUP BY 1),
             |ref AS (
             |  SELECT lang AS ref_lang, n AS ref_n, n_sel AS ref_sel
             |  FROM g
             |  ORDER BY (n_sel * 1000000000) // n DESC, n DESC, lang
             |  LIMIT 1)
             |SELECT lang, n, n_sel,
             |  CAST(n_sel AS DOUBLE) / n AS sel_rate,
             |  CAST(n_sel * ref_n AS DOUBLE) / (ref_sel * n)
             |    AS impact_ratio,
             |  n_sel * ref_n * 5 < ref_sel * n * 4 AS below_80pct,
             |  CAST(n_sel AS DOUBLE) / n - CAST(ref_sel AS DOUBLE) / ref_n
             |    AS parity_diff
             |FROM g CROSS JOIN ref""".stripMargin),
      "four-fifths-rule disparate-impact audit of the quality cutoff: " +
        "per-language selection rates vs the best-selected group — " +
        "integer cross-product flags, single-division rates"),

    // Benjamini-Hochberg FDR control over a FAMILY of hypotheses — the
    // missing piece next to the single-test battery (chi², Welch, SRM):
    // run 25 per-nation two-proportion z-tests at once and control the
    // expected false-discovery rate at 10% instead of Bonferroni-
    // starving power. The conversion flag plants a real signal (nations
    // %5==0 convert at 24% vs the 18% base) so the procedure has true
    // positives to find. Scale shape: one nation-grain rollup (map-side
    // combined), a 1-row total broadcast, and the rank computed by a
    // 25×25 pair join on the ROLLUP (the Theil-Sen precedent) — no
    // global window, no row-grain sort. p-values via the Numerical-
    // Recipes erfc chain (|rel err| < 1.2e-7), rounded to 6dp BEFORE
    // the threshold compare so the accept/reject decision hashes
    // identically across engines.
    Q("quality_bh_fdr",
      (s, d) => {
        def erfcc(x: Column): Column = {
          val t = lit(1.0) / (lit(1.0) + x / 2)
          t * exp(-x * x - lit(1.26551223) + t * (lit(1.00002368) +
            t * (lit(0.37409196) + t * (lit(0.09678418) +
            t * (lit(-0.18628806) + t * (lit(0.27886807) +
            t * (lit(-1.13520398) + t * (lit(1.48851587) +
            t * (lit(-0.82215223) + t * lit(0.17087277))))))))))
        }
        val o = load(s, d, "orders")
          .join(load(s, d, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").cast("long").as("nk"),
            when((col("o_orderkey") + col("c_nationkey") * 7) % 100 <
                lit(18) + when(col("c_nationkey") % 5 === 0, 6).otherwise(0),
              1L).otherwise(0L).as("x"))
        val g = persistOnce(o.groupBy(col("nk"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("k")))
        val tot = g.agg(sum(col("n")).as("tn"), sum(col("k")).as("tk"),
          count(lit(1)).as("m"))
        val scored = g.crossJoin(broadcast(tot))
          .withColumn("p0", col("tk").cast("double") / col("tn"))
          .withColumn("z",
            (col("k").cast("double") / col("n") - col("p0")) /
              sqrt(col("p0") * (lit(1.0) - col("p0")) / col("n")))
          .select(col("nk"), col("n"), col("k"), col("m"),
            round(erfcc(abs(col("z")) / sqrt(lit(2.0))), 6).as("p_value"))
        val peers = scored.select(col("nk").as("b_nk"),
          col("p_value").as("b_p"))
        val ranked = scored.join(peers,
            col("b_p") < col("p_value") ||
              (col("b_p") === col("p_value") && col("b_nk") <= col("nk")))
          .groupBy(col("nk"), col("n"), col("k"), col("m"), col("p_value"))
          .agg(count(lit(1)).as("rank"))
          .withColumn("ok",
            when(col("p_value") <=
              col("rank").cast("double") * 0.10 / col("m"), 1L)
              .otherwise(0L))
        val kstar = ranked.agg(
          coalesce(max(when(col("ok") === 1L, col("rank"))), lit(0L))
            .as("kstar"))
        ranked.crossJoin(broadcast(kstar))
          .select(col("nk"), col("n"), col("k"), col("p_value"),
            col("rank"),
            when(col("rank") <= col("kstar"), 1L).otherwise(0L)
              .as("rejected"))
      },
      Some("""WITH o AS (
             |  SELECT CAST(c_nationkey AS BIGINT) AS nk,
             |    CASE WHEN (o_orderkey + c_nationkey * 7) % 100 <
             |      18 + CASE WHEN c_nationkey % 5 = 0 THEN 6 ELSE 0 END
             |      THEN 1 ELSE 0 END AS x
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |g AS (
             |  SELECT nk, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS k
             |  FROM o GROUP BY 1),
             |tot AS (
             |  SELECT CAST(sum(n) AS BIGINT) AS tn,
             |    CAST(sum(k) AS BIGINT) AS tk,
             |    CAST(count(*) AS BIGINT) AS m
             |  FROM g),
             |z AS (
             |  SELECT nk, n, k, m,
             |    (CAST(k AS DOUBLE) / n - CAST(tk AS DOUBLE) / tn) /
             |      sqrt((CAST(tk AS DOUBLE) / tn) *
             |        (1.0 - CAST(tk AS DOUBLE) / tn) / n) AS zv
             |  FROM g CROSS JOIN tot),
             |p AS (
             |  SELECT nk, n, k, m,
             |    round((1.0 / (1.0 + abs(zv) / sqrt(2.0) / 2)) *
             |      exp(-(abs(zv) / sqrt(2.0)) * (abs(zv) / sqrt(2.0))
             |        - 1.26551223 +
             |        (1.0 / (1.0 + abs(zv) / sqrt(2.0) / 2)) * (1.00002368 +
             |        (1.0 / (1.0 + abs(zv) / sqrt(2.0) / 2)) * (0.37409196 +
             |        (1.0 / (1.0 + abs(zv) / sqrt(2.0) / 2)) * (0.09678418 +
             |        (1.0 / (1.0 + abs(zv) / sqrt(2.0) / 2)) * (-0.18628806 +
             |        (1.0 / (1.0 + abs(zv) / sqrt(2.0) / 2)) * (0.27886807 +
             |        (1.0 / (1.0 + abs(zv) / sqrt(2.0) / 2)) * (-1.13520398 +
             |        (1.0 / (1.0 + abs(zv) / sqrt(2.0) / 2)) * (1.48851587 +
             |        (1.0 / (1.0 + abs(zv) / sqrt(2.0) / 2)) * (-0.82215223 +
             |        (1.0 / (1.0 + abs(zv) / sqrt(2.0) / 2)) * 0.17087277
             |        ))))))))), 6) AS p_value
             |  FROM z),
             |r AS (
             |  SELECT a.nk, a.n, a.k, a.m, a.p_value,
             |    CAST(count(*) AS BIGINT) AS rank
             |  FROM p a JOIN p b
             |    ON b.p_value < a.p_value
             |    OR (b.p_value = a.p_value AND b.nk <= a.nk)
             |  GROUP BY 1, 2, 3, 4, 5),
             |ks AS (
             |  SELECT coalesce(max(CASE WHEN p_value <=
             |    CAST(rank AS DOUBLE) * 0.10 / m THEN rank END), 0)
             |    AS kstar
             |  FROM r)
             |SELECT nk, n, k, p_value, rank,
             |  CAST(CASE WHEN rank <= kstar THEN 1 ELSE 0 END AS BIGINT)
             |    AS rejected
             |FROM r CROSS JOIN ks""".stripMargin),
      "Benjamini-Hochberg FDR over 25 per-nation z-tests: nation-grain " +
        "rollup + 1-row broadcast + pair-join rank — erfc-chain " +
        "p-values rounded before the decision compare"),

    // Wald's SEQUENTIAL probability ratio test — the always-valid
    // sibling of the fixed-horizon battery: monitor the urgent-order
    // rate day by day (H0 p=0.15 vs H1 p=0.20, α=0.05, β=0.20) and
    // STOP at the first day the cumulative log-likelihood ratio exits
    // (ln(β/(1-α)), ln((1-β)/α)). The early-stopping day is the whole
    // point: a fixed-n test would wait out the full history. Scale
    // shape: one day-grain rollup (the only row-grain pass), a
    // cumulative window over ≤2406 day rows, two 1-row decision
    // rollups. LLR is integer counts × two ln constants, rounded 6dp
    // before the boundary compare; both boundaries are rounded the
    // same way so the crossing day is engine-exact.
    Q("quality_sprt",
      (s, d) => {
        val o = load(s, d, "orders").select(
          datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
            .cast("long").as("day"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
            .as("x"))
        val daily = o.groupBy(col("day"))
          .agg(count(lit(1)).as("n_d"), sum(col("x")).as("k_d"))
        // cumulative over the bounded day domain (≤2406 rows — an
        // aggregate-grain window, not a row sort)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("day"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        val c1 = log(lit(0.20 / 0.15))
        val c2 = log(lit(0.80 / 0.85))
        val hi = round(log(lit(0.80 / 0.05)), 6)
        val lo = round(log(lit(0.20 / 0.95)), 6)
        val cum = daily
          .select(col("day"), sum(col("n_d")).over(w).as("n"),
            sum(col("k_d")).over(w).as("k"))
          .withColumn("llr", round(col("k").cast("double") * c1 +
            (col("n") - col("k")).cast("double") * c2, 6))
          .withColumn("decision",
            when(col("llr") >= hi, "h1").when(col("llr") <= lo, "h0"))
        val firsts = cum.filter(col("decision").isNotNull)
          .groupBy(col("decision"))
          .agg(min(col("day")).as("day"),
            min_by(col("n"), col("day")).as("n"),
            min_by(col("k"), col("day")).as("k"),
            min_by(col("llr"), col("day")).as("llr"))
        val fin = cum.agg(max(col("day")).as("day"),
            max_by(col("n"), col("day")).as("n"),
            max_by(col("k"), col("day")).as("k"),
            max_by(col("llr"), col("day")).as("llr"))
          .select(lit("final").as("decision"), col("day"), col("n"),
            col("k"), col("llr"))
        firsts.select(col("decision"), col("day"), col("n"), col("k"),
          col("llr")).unionByName(fin)
      },
      Some("""WITH o AS (
             |  SELECT date_diff('day', DATE '1970-01-01',
             |      CAST(o_orderdate AS DATE)) AS day,
             |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
             |      AS x
             |  FROM orders),
             |daily AS (
             |  SELECT day, count(*) AS n_d, sum(x) AS k_d
             |  FROM o GROUP BY 1),
             |cum AS (
             |  SELECT day,
             |    CAST(sum(n_d) OVER (ORDER BY day
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n,
             |    CAST(sum(k_d) OVER (ORDER BY day
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS k
             |  FROM daily),
             |l AS (
             |  SELECT day, n, k,
             |    round(CAST(k AS DOUBLE) * ln(0.20 / 0.15) +
             |      CAST(n - k AS DOUBLE) * ln(0.80 / 0.85), 6) AS llr
             |  FROM cum),
             |dec AS (
             |  SELECT day, n, k, llr,
             |    CASE WHEN llr >= round(ln(0.80 / 0.05), 6) THEN 'h1'
             |         WHEN llr <= round(ln(0.20 / 0.95), 6) THEN 'h0'
             |    END AS decision
             |  FROM l),
             |firsts AS (
             |  SELECT decision, CAST(min(day) AS BIGINT) AS day,
             |    arg_min(n, day) AS n, arg_min(k, day) AS k,
             |    arg_min(llr, day) AS llr
             |  FROM dec WHERE decision IS NOT NULL GROUP BY 1),
             |fin AS (
             |  SELECT 'final' AS decision, CAST(max(day) AS BIGINT) AS day,
             |    arg_max(n, day) AS n, arg_max(k, day) AS k,
             |    arg_max(llr, day) AS llr
             |  FROM dec)
             |SELECT decision, day, n, k, llr FROM firsts
             |UNION ALL
             |SELECT decision, day, n, k, llr FROM fin""".stripMargin),
      "Wald SPRT on the daily urgent-order rate: day-grain rollup + " +
        "bounded cumulative window, first boundary crossing per " +
        "decision + the final-day row — 6dp-rounded LLR compares"),

    // TOST equivalence test — the inverse question the Welch t-test
    // can't answer: are two segments the SAME to within a margin?
    // (Failing to reject difference ≠ equivalence.) Two one-sided
    // Welch tests against ±$1000 on order totals; equivalence is
    // declared when BOTH one-sided statistics clear the z critical
    // value — compared on 6dp-rounded statistics so the verdict
    // hashes identically. Same scale shape as the Welch query: one
    // map-side integer-moment rollup per segment, a 1-row cross join,
    // fixed IEEE chains.
    Q("quality_tost",
      (s, d) => {
        val o = load(s, d, "orders")
          .filter(col("o_orderpriority").isin("2-HIGH", "3-MEDIUM"))
          .select(col("o_orderpriority").as("seg"),
            round(col("o_totalprice")).cast("long").as("x"))
        val m = o.groupBy(col("seg"))
          // Σx² widened to DECIMAL — same rationale as
          // quality_welch_ttest (long wraps near 3.7e7 rows)
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("x").cast("decimal(19,0)") *
              col("x").cast("decimal(19,0)")).as("sxx"))
          .select(col("seg"), col("n"),
            (col("sx") / col("n").cast("double")).as("mean"),
            // sx cast to double BEFORE the square: the long×long
            // product overflows past ~3e9 total (sf0.1 upward)
            ((col("sxx").cast("double") - col("sx").cast("double") * col("sx") /
              col("n").cast("double")) /
              (col("n") - 1).cast("double")).as("v"))
        val a = m.filter(col("seg") === "2-HIGH")
          .select(col("n").as("n1"), col("mean").as("m1"), col("v").as("v1"))
        val b = m.filter(col("seg") === "3-MEDIUM")
          .select(col("n").as("n2"), col("mean").as("m2"), col("v").as("v2"))
        val margin = lit(1000.0)
        a.crossJoin(b)
          .withColumn("se",
            sqrt(col("v1") / col("n1") + col("v2") / col("n2")))
          .withColumn("t_lower",
            round((col("m1") - col("m2") + margin) / col("se"), 6))
          .withColumn("t_upper",
            round((margin - (col("m1") - col("m2"))) / col("se"), 6))
          .select(col("n1"), col("n2"),
            round(col("m1") - col("m2"), 4).as("mean_diff"),
            col("t_lower"), col("t_upper"),
            when(col("t_lower") > 1.644854 && col("t_upper") > 1.644854,
              1L).otherwise(0L).as("equivalent"))
      },
      Some("""WITH o AS (
             |  SELECT o_orderpriority AS seg,
             |    CAST(round(o_totalprice) AS BIGINT) AS x
             |  FROM orders WHERE o_orderpriority IN ('2-HIGH', '3-MEDIUM')),
             |mm AS (
             |  SELECT seg, CAST(count(*) AS BIGINT) AS n,
             |    sum(x) / CAST(count(*) AS DOUBLE) AS mean,
             |    (sum(x * x) - CAST(sum(x) AS DOUBLE) * sum(x)
             |      / CAST(count(*) AS DOUBLE))
             |      / CAST(count(*) - 1 AS DOUBLE) AS v
             |  FROM o GROUP BY 1),
             |a AS (SELECT n AS n1, mean AS m1, v AS v1 FROM mm
             |      WHERE seg = '2-HIGH'),
             |b AS (SELECT n AS n2, mean AS m2, v AS v2 FROM mm
             |      WHERE seg = '3-MEDIUM'),
             |t AS (
             |  SELECT n1, n2, m1, m2,
             |    sqrt(v1 / n1 + v2 / n2) AS se
             |  FROM a, b)
             |SELECT n1, n2, round(m1 - m2, 4) AS mean_diff,
             |  round((m1 - m2 + 1000.0) / se, 6) AS t_lower,
             |  round((1000.0 - (m1 - m2)) / se, 6) AS t_upper,
             |  CAST(CASE WHEN round((m1 - m2 + 1000.0) / se, 6) > 1.644854
             |        AND round((1000.0 - (m1 - m2)) / se, 6) > 1.644854
             |       THEN 1 ELSE 0 END AS BIGINT) AS equivalent
             |FROM t""".stripMargin),
      "TOST equivalence on order totals (±$1000 margin): two one-sided " +
        "Welch statistics from exact integer moments, verdict on " +
        "6dp-rounded compares — one rollup + a 1-row cross join"),

    // PERMUTATION TEST at corpus scale — the distribution-free answer
    // when no z/t approximation is trusted: the null distribution is
    // built from 32 hash-derived pseudo-random re-assignments of the
    // treatment label, each a deterministic md5 salt, all evaluated in
    // ONE pass via a 33-way replicate explode (map-side) + a 66-group
    // integer-moment agg — no loop over the data, no driver state; the
    // pattern scales because R is fixed while the data streams once.
    // Every replicate statistic is |mean diff| from exact integer
    // sums (single-division chains, compared UNROUNDED — identical
    // IEEE ops both engines); p = (1 + #{stat_r ≥ stat_obs}) / (R+1),
    // the standard add-one permutation p-value.
    Q("quality_permutation_test",
      (s, d) => {
        val o = load(s, d, "orders").select(
          col("o_orderkey").cast("string").as("k"),
          round(col("o_totalprice")).cast("long").as("x"))
        val reps = o
          .select(col("k"), col("x"),
            explode(sequence(lit(0), lit(32))).as("r"))
          .withColumn("arm",
            substring(md5(concat(col("k"),
              when(col("r") === 32, lit(":obs"))
                .otherwise(concat(lit(":p"), col("r").cast("string"))))),
              1, 1) < "8")
        val arms = reps.groupBy(col("r"), col("arm"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        val stats = arms.groupBy(col("r")).agg(
          abs(max(when(col("arm"), col("sx"))).cast("double") /
            max(when(col("arm"), col("n"))) -
            max(when(!col("arm"), col("sx"))).cast("double") /
              max(when(!col("arm"), col("n")))).as("stat"))
        val obs = stats.filter(col("r") === 32)
          .select(col("stat").as("stat_obs"))
        stats.filter(col("r") < 32).crossJoin(broadcast(obs))
          .agg(count(lit(1)).as("n_reps"),
            sum(when(col("stat") >= col("stat_obs"), 1L).otherwise(0L))
              .as("n_ge"),
            max(col("stat_obs")).as("so"))
          .select(col("n_reps"), round(col("so"), 4).as("stat_obs"),
            col("n_ge"),
            ((col("n_ge") + 1L).cast("double") / lit(33.0)).as("p_value"))
      },
      Some("""WITH o AS (
             |  SELECT CAST(o_orderkey AS VARCHAR) AS k,
             |    CAST(round(o_totalprice) AS BIGINT) AS x
             |  FROM orders),
             |reps AS (
             |  SELECT k, x, r,
             |    substr(md5(k || CASE WHEN r = 32 THEN ':obs'
             |      ELSE ':p' || CAST(r AS VARCHAR) END), 1, 1) < '8'
             |      AS arm
             |  FROM o CROSS JOIN generate_series(0, 32) g(r)),
             |arms AS (
             |  SELECT r, arm, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx
             |  FROM reps GROUP BY 1, 2),
             |stats AS (
             |  SELECT r,
             |    abs(CAST(max(CASE WHEN arm THEN sx END) AS DOUBLE)
             |        / max(CASE WHEN arm THEN n END) -
             |      CAST(max(CASE WHEN NOT arm THEN sx END) AS DOUBLE)
             |        / max(CASE WHEN NOT arm THEN n END)) AS stat
             |  FROM arms GROUP BY 1),
             |obs AS (SELECT stat AS stat_obs FROM stats WHERE r = 32)
             |SELECT CAST(count(*) AS BIGINT) AS n_reps,
             |  round(max(stat_obs), 4) AS stat_obs,
             |  CAST(sum(CASE WHEN stat >= stat_obs THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_ge,
             |  CAST(sum(CASE WHEN stat >= stat_obs THEN 1 ELSE 0 END) + 1
             |    AS DOUBLE) / 33.0 AS p_value
             |FROM stats CROSS JOIN obs WHERE r < 32""".stripMargin),
      "permutation test via 33-way hash-replicate explode: one data " +
        "pass, 66-group integer moments, unrounded |mean diff| " +
        "compares, add-one p-value — R fixed, data streamed once"),

    // KEY-GAP detection — the replication-integrity question the
    // MAX(id)/COUNT probes can't answer: WHERE did keys go missing?
    // A global sort + lag over the key column would be the naive
    // formulation (row-grain, forbidden); instead keys bucket into
    // 4096-key density cells map-side and each cell compares its count
    // to the cell's key-domain width — one hash agg, output ∝ cells,
    // and a dropped key RANGE shows up as a low-density cell without
    // the engine ever sorting rows. Orders' key domain is sparse by
    // construction (TPC-H populates 1 in 4), so expected density is
    // checked as an exact integer ratio against the observed count;
    // the fixture's own sparseness is the "gap" under test.
    Q("quality_key_gaps",
      (s, d) => {
        val o = load(s, d, "orders")
          .select(expr("o_orderkey div 4096").as("cell"),
            col("o_orderkey"))
        val tot = o.agg(max(col("o_orderkey")).as("mk"))
        o.groupBy(col("cell"))
          .agg(count(lit(1)).as("n_keys"),
            min(col("o_orderkey")).as("lo"),
            max(col("o_orderkey")).as("hi"))
          .crossJoin(broadcast(tot))
          .select(col("cell"), col("n_keys"),
            // domain width of the cell, clipped at the table max
            (least((col("cell") + 1) * 4096 - 1, col("mk")) -
              col("cell") * 4096 + 1).as("domain"),
            (least((col("cell") + 1) * 4096 - 1, col("mk")) -
              col("cell") * 4096 + 1 - col("n_keys")).as("n_missing"),
            col("lo"), col("hi"))
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey // 4096 AS cell, o_orderkey
             |  FROM orders),
             |t AS (SELECT max(o_orderkey) AS mk FROM o)
             |SELECT cell, CAST(count(*) AS BIGINT) AS n_keys,
             |  least((cell + 1) * 4096 - 1, mk) - cell * 4096 + 1
             |    AS domain,
             |  least((cell + 1) * 4096 - 1, mk) - cell * 4096 + 1
             |    - count(*) AS n_missing,
             |  min(o_orderkey) AS lo, max(o_orderkey) AS hi
             |FROM o CROSS JOIN t
             |GROUP BY cell, mk""".stripMargin),
      "key-gap detection via 4096-key density cells: one map-side " +
        "bucket + hash agg localizes dropped key ranges without any " +
        "row sort — the WHERE to the MAX(id) probe's WHETHER"))
}
