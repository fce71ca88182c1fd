package graft.operators

import org.apache.spark.sql.functions._

import graft.core.Tables.load

/** Observability queries — the Airflow DAG analytics re-expressed as
  * data-parallel Spark queries (SURVEY §2.3-§2.4, EP2/EP3). The table /
  * topic list is just rows in a DataFrame, so "dynamic task mapping"
  * (cdc_health_check_dynamic_dag.py:55-63) becomes a groupBy.
  */
object Monitors {

  def queries: Seq[Q] = Seq(
    // J2: consumer-lag = latest offset − committed offset, per topic.
    // `events` stands in for the offset log: value<100 marks "consumed".
    Q("mon_consumer_lag",
      (s, d) => load(s, d, "events")
        .groupBy(col("event_type").as("topic"))
        .agg(
          max(col("event_id")).as("latest_offset"),
          coalesce(max(when(col("value") < 100, col("event_id"))), lit(0L))
            .as("committed_offset"))
        .select(col("topic"), col("latest_offset"), col("committed_offset"),
          (col("latest_offset") - col("committed_offset")).as("lag"))
        .withColumn("critical", col("lag") > 500),
      Some("""SELECT topic, latest_offset, committed_offset,
             |  latest_offset - committed_offset AS lag,
             |  latest_offset - committed_offset > 500 AS critical
             |FROM (SELECT event_type AS topic,
             |        max(event_id) AS latest_offset,
             |        coalesce(max(event_id) FILTER (WHERE value < 100), 0) AS committed_offset
             |      FROM events GROUP BY 1)""".stripMargin),
      "J2/ST7 lag vs MAX_LAG_THRESHOLD=500 (kafka_latency_monitor.py:60-84)"),

    // ST8 external probe verdicts: the Connect status-check logic
    // (connector AND first task RUNNING; unreachable/unparseable are
    // verdicts) over a deterministic response table, derived
    // independently by DuckDB's JSON functions from the SAME bodies —
    // the probe's decision logic is hash-gated, not just spec'd.
    Q("mon_probe_status",
      (s, d) => {
        import s.implicits._
        Seq(
          ("garbage", "not json", ""),
          ("gone", null: String, "java.net.ConnectException: refused"),
          ("mysql-connector",
            """{"connector":{"state":"RUNNING"},"tasks":[{"id":0,"state":"RUNNING"}]}""",
            ""),
          ("paused-conn",
            """{"connector":{"state":"PAUSED"},"tasks":[{"id":0,"state":"RUNNING"}]}""",
            ""),
          ("postgres-sink",
            """{"connector":{"state":"RUNNING"},"tasks":[{"id":0,"state":"FAILED"}]}""",
            ""),
          ("taskless",
            """{"connector":{"state":"RUNNING"},"tasks":[]}""", ""))
          .toDF("component", "body", "err")
          .select(col("component"),
            graft.streaming.StatusProbe.verdict(col("body"), col("err"))
              .as("state"))
          .orderBy("component")
      },
      Some("""SELECT component,
             |  CASE
             |    WHEN err <> '' THEN 'UNREACHABLE'
             |    WHEN json_extract_string(jbody, '$.connector.state') IS NULL
             |      THEN 'UNPARSEABLE'
             |    WHEN json_extract_string(jbody, '$.connector.state') = 'RUNNING'
             |      AND coalesce(json_extract_string(jbody, '$.tasks[0].state'),
             |                   'MISSING') = 'RUNNING'
             |      THEN 'RUNNING'
             |    ELSE coalesce(
             |      CASE WHEN json_extract_string(jbody, '$.connector.state')
             |                <> 'RUNNING'
             |           THEN json_extract_string(jbody, '$.connector.state') END,
             |      json_extract_string(jbody, '$.tasks[0].state'),
             |      'DEGRADED')
             |  END AS state
             |FROM (SELECT component, err,
             |        CASE WHEN coalesce(json_valid(body), FALSE) THEN body END
             |          AS jbody
             |      FROM (VALUES
             |  ('garbage', 'not json', ''),
             |  ('gone', NULL, 'java.net.ConnectException: refused'),
             |  ('mysql-connector', '{"connector":{"state":"RUNNING"},"tasks":[{"id":0,"state":"RUNNING"}]}', ''),
             |  ('paused-conn', '{"connector":{"state":"PAUSED"},"tasks":[{"id":0,"state":"RUNNING"}]}', ''),
             |  ('postgres-sink', '{"connector":{"state":"RUNNING"},"tasks":[{"id":0,"state":"FAILED"}]}', ''),
             |  ('taskless', '{"connector":{"state":"RUNNING"},"tasks":[]}', '')
             |) AS t(component, body, err)) v
             |ORDER BY component""".stripMargin),
      "ST8 external status-probe verdict logic, derived independently " +
        "in DuckDB JSON from the same response bodies"),

    // ST8/A6: health = every task of a connector RUNNING.
    Q("mon_health_rollup",
      (s, d) => load(s, d, "events")
        .groupBy(col("user_id").as("connector_id"))
        .agg(
          bool_and(col("event_type") =!= "error").as("all_running"),
          count(when(col("event_type") === "error", 1)).as("n_failed_tasks")),
      Some("""SELECT user_id AS connector_id,
             |  bool_and(event_type <> 'error') AS all_running,
             |  count(*) FILTER (WHERE event_type = 'error') AS n_failed_tasks
             |FROM events GROUP BY 1""".stripMargin),
      "ST8 connector/task health predicate (cdc_health_check_dynamic_dag.py:44-47)"),

    // ST9/A7: alert fan-in — one row per failure class, ANY-failure flag.
    Q("mon_alert_fanin",
      (s, d) => {
        val lagAlerts = load(s, d, "events")
          .groupBy(col("event_type").as("entity"))
          .agg(max(col("value")).as("metric"))
          .filter(col("metric") > 199)
          .withColumn("alert_kind", lit("lag"))
        val healthAlerts = load(s, d, "events")
          .filter(col("event_type") === "error")
          .groupBy(col("user_id").cast("string").as("entity"))
          .agg(round(sum(col("value")), 2).as("metric"))
          .withColumn("alert_kind", lit("health"))
        lagAlerts.unionByName(healthAlerts)
          .select(col("alert_kind"), col("entity"), col("metric"))
      },
      Some("""SELECT 'lag' AS alert_kind, event_type AS entity, max(value) AS metric
             |FROM events GROUP BY 2 HAVING max(value) > 199
             |UNION ALL
             |SELECT 'health', CAST(user_id AS VARCHAR), round(sum(value), 2)
             |FROM events WHERE event_type = 'error' GROUP BY 2""".stripMargin),
      "ST9 ONE_FAILED alert fan-in across monitor families (cdc_health_check_dag.py:83-87)"),

    // Adaptive lag anomaly detection — the evolution of the reference's
    // FIXED threshold (MAX_LAG_THRESHOLD=500, kafka_latency_monitor
    // .py:15): a static threshold misfires when topics have different
    // baseline lag, so each topic's per-minute lag sample is scored
    // against ITS OWN trailing 6-sample mean/stddev and flagged past
    // 2σ. One aggregation (per-topic-minute samples) + one window pass
    // — the window partitions by topic, so at 1000 topics the state is
    // 6 numbers per topic, never the raw event history. Warmup rows
    // (fewer than 2 prior samples / zero variance) are excluded; the
    // z-score is rounded 4 dp on BOTH sides before the 2σ compare so
    // the flag can't diverge on sum-order ulps.
    Q("mon_lag_anomaly",
      (s, d) => {
        val samples = load(s, d, "events")
          .groupBy(col("event_type").as("topic"),
            date_trunc("minute", col("ts")).as("w"))
          .agg((max(col("event_id")) -
            coalesce(max(when(col("value") < 100, col("event_id"))), lit(0L)))
            .as("lag"))
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy("topic").orderBy("w").rowsBetween(-6, -1)
        samples
          .withColumn("mu", avg(col("lag")).over(win))
          .withColumn("sigma", stddev_samp(col("lag")).over(win))
          .filter(col("sigma").isNotNull && col("sigma") > 0)
          .withColumn("z", round((col("lag") - col("mu")) / col("sigma"), 4))
          .select(col("topic"), col("w"), col("lag"), col("z"),
            (abs(col("z")) > 2.0).as("anomaly"))
      },
      Some("""WITH samples AS (
             |  SELECT event_type AS topic, date_trunc('minute', ts) AS w,
             |    max(event_id) - coalesce(max(event_id) FILTER (WHERE value < 100), 0)
             |      AS lag
             |  FROM events GROUP BY 1, 2)
             |SELECT topic, w, lag, round((lag - mu) / sigma, 4) AS z,
             |  abs(round((lag - mu) / sigma, 4)) > 2.0 AS anomaly
             |FROM (
             |  SELECT topic, w, lag,
             |    avg(lag) OVER win AS mu,
             |    stddev_samp(lag) OVER win AS sigma
             |  FROM samples
             |  WINDOW win AS (PARTITION BY topic ORDER BY w
             |                 ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))
             |WHERE sigma IS NOT NULL AND sigma > 0""".stripMargin),
      "per-topic self-baselining lag anomaly: trailing-window z-score " +
        "past 2σ — adaptive replacement for the fixed 500-message threshold"),

    // Multi-window error-budget burn rate — the SRE-workbook alert
    // shape the reference's fixed threshold (MAX_LAG_THRESHOLD=500)
    // grows into: page only when BOTH a fast window (last 10 events,
    // catches a spike quickly) and a slow window (last 50, proves it
    // is sustained) burn the 5% error budget above their multipliers
    // — a transient blip trips neither, a slow leak trips the slow
    // window. Same scale shape as the anomaly query: one
    // topic-partitioned ordered window pass, state per topic = the
    // trailing counters, never the raw history twice. Rates are exact
    // int/int divisions (deterministic unrounded across engines); the
    // full-fast-window warmup cut keeps the row set deterministic.
    Q("mon_slo_burn",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = load(s, d, "events").select(
          col("event_type").as("topic"), col("ts"), col("event_id"),
          when(col("value") > 150, 1L).otherwise(0L).as("err"))
        val wf = Window.partitionBy("topic")
          .orderBy(col("ts"), col("event_id")).rowsBetween(-9, 0)
        val ws = Window.partitionBy("topic")
          .orderBy(col("ts"), col("event_id")).rowsBetween(-49, 0)
        ev.withColumn("sf", sum(col("err")).over(wf))
          .withColumn("cf", count(lit(1)).over(wf))
          .withColumn("ss", sum(col("err")).over(ws))
          .withColumn("cs", count(lit(1)).over(ws))
          .filter(col("cf") === 10)
          .select(col("topic"), col("ts"),
            ((col("sf") / col("cf")) / 0.05).as("burn_fast"),
            ((col("ss") / col("cs")) / 0.05).as("burn_slow"),
            ((col("sf") / col("cf")) / 0.05 > 2.0 &&
              (col("ss") / col("cs")) / 0.05 > 1.0).as("page"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type AS topic, ts, event_id,
             |    CASE WHEN value > 150 THEN 1 ELSE 0 END AS err
             |  FROM events),
             |w AS (
             |  SELECT topic, ts,
             |    sum(err) OVER wf AS sf, count(*) OVER wf AS cf,
             |    sum(err) OVER ws AS ss, count(*) OVER ws AS cs
             |  FROM ev
             |  WINDOW wf AS (PARTITION BY topic ORDER BY ts, event_id
             |                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
             |         ws AS (PARTITION BY topic ORDER BY ts, event_id
             |                ROWS BETWEEN 49 PRECEDING AND CURRENT ROW))
             |SELECT topic, ts,
             |  (CAST(sf AS DOUBLE) / cf) / 0.05 AS burn_fast,
             |  (CAST(ss AS DOUBLE) / cs) / 0.05 AS burn_slow,
             |  (CAST(sf AS DOUBLE) / cf) / 0.05 > 2.0 AND
             |    (CAST(ss AS DOUBLE) / cs) / 0.05 > 1.0 AS page
             |FROM w WHERE cf = 10""".stripMargin),
      "multi-window SLO burn-rate alert: fast (10-event) AND slow " +
        "(50-event) windows must both burn the 5% error budget — one " +
        "topic-keyed window pass, exact int-ratio arithmetic"),

    // Predictive monitoring: one-step EWMA forecast of the per-topic
    // lag series, spike-flagged when the actual sample exceeds twice
    // the forecast. α = 1/2 is chosen deliberately: the trailing-8
    // truncation's weights are DYADIC (2^-1 … 2^-7, tail 2^-7 — they
    // sum to exactly 1), so every product lag·2^-k and their sum are
    // IEEE-exact in any order and the forecast hash-checks UNROUNDED
    // across engines — a forecasting query with zero float tolerance.
    // Shape: the same per-minute lag rollup the anomaly query uses,
    // then eight lag() taps over one topic-keyed ordered window pass
    // (state per topic = 8 numbers at 1000 topics, never raw history).
    Q("mon_lag_ewma",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val samples = load(s, d, "events")
          .groupBy(col("event_type").as("topic"),
            date_trunc("minute", col("ts")).as("w"))
          .agg((max(col("event_id")) -
            coalesce(max(when(col("value") < 100, col("event_id"))), lit(0L)))
            .as("lag"))
        val win = Window.partitionBy("topic").orderBy("w")
        val taps = (1 to 8).map(i => lag(col("lag"), i).over(win).as(s"l$i"))
        val withTaps = samples.select(
          col("topic") +: col("w") +: col("lag") +: taps: _*)
        // weights 2^-1..2^-7 and a 2^-7 tail weight on the 8th tap
        val forecast = (1 to 7).map(i =>
          col(s"l$i") * lit(math.pow(2, -i))).reduce(_ + _) +
          col("l8") * lit(math.pow(2, -7))
        withTaps.filter(col("l8").isNotNull) // full-history warmup cut
          .select(col("topic"), col("w"), col("lag"),
            forecast.as("forecast"),
            (col("lag") > forecast * 2).as("spike"))
      },
      Some("""WITH samples AS (
             |  SELECT event_type AS topic, date_trunc('minute', ts) AS w,
             |    max(event_id) - coalesce(max(event_id) FILTER (WHERE value < 100), 0)
             |      AS lag
             |  FROM events GROUP BY 1, 2),
             |taps AS (
             |  SELECT topic, w, lag,
             |    lag(lag, 1) OVER win AS l1, lag(lag, 2) OVER win AS l2,
             |    lag(lag, 3) OVER win AS l3, lag(lag, 4) OVER win AS l4,
             |    lag(lag, 5) OVER win AS l5, lag(lag, 6) OVER win AS l6,
             |    lag(lag, 7) OVER win AS l7, lag(lag, 8) OVER win AS l8
             |  FROM samples
             |  WINDOW win AS (PARTITION BY topic ORDER BY w))
             |SELECT topic, w, lag,
             |  l1 * 0.5::DOUBLE + l2 * 0.25::DOUBLE + l3 * 0.125::DOUBLE
             |    + l4 * 0.0625::DOUBLE + l5 * 0.03125::DOUBLE
             |    + l6 * 0.015625::DOUBLE + l7 * 0.0078125::DOUBLE
             |    + l8 * 0.0078125::DOUBLE AS forecast,
             |  lag > (l1 * 0.5::DOUBLE + l2 * 0.25::DOUBLE + l3 * 0.125::DOUBLE
             |    + l4 * 0.0625::DOUBLE + l5 * 0.03125::DOUBLE
             |    + l6 * 0.015625::DOUBLE + l7 * 0.0078125::DOUBLE
             |    + l8 * 0.0078125::DOUBLE) * 2 AS spike
             |FROM taps WHERE l8 IS NOT NULL""".stripMargin),
      "one-step EWMA lag forecast (dyadic α=1/2 weights — exact " +
        "unrounded cross-engine) + 2× spike flag; eight lag() taps " +
        "over one topic-keyed window pass"))
}
