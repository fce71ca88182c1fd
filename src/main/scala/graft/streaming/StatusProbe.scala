package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External-component health probe — reference parity for the Connect
  * REST status poll (`/connectors/{name}/status`,
  * cdc_health_check_dag.py:51-66): the engine monitors its OWN queries
  * push-based ([[Monitoring]]), but a deployment also fronts
  * third-party components (connectors, brokers, sinks) that only
  * expose a pull API. A probe turns those into rows in the SAME health
  * shape [[Monitoring.lifecycleDf]] uses, so external components join
  * the health rollup and [[AlertDispatcher]] fan-in unchanged.
  *
  * The verdict matches the reference's check exactly
  * (cdc_health_check_dag.py:17-33): HEALTHY iff the connector state
  * AND the first task state are both RUNNING; a parse failure or an
  * unreachable endpoint is a failed check, not an exception — probing
  * must never take the monitor down with the component.
  *
  * Transport is injectable: production passes [[StatusProbe.httpGet]];
  * tests and this egress-less sandbox inject a stub. Probe count is
  * #components (driver-side, tiny); the JSON decode runs through the
  * engine's own from_json so the parse is the tested Spark path.
  */
final class StatusProbe(targets: Seq[StatusProbe.Target],
                        fetch: String => String = StatusProbe.httpGet) {
  import StatusProbe._

  /** One row per target: (component, state, detail). State is the
    * worst of connector/task states, UNREACHABLE when the transport
    * failed, UNPARSEABLE when the body wasn't status JSON. */
  def statuses(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val raw = targets.map { t =>
      try (t.name, fetch(t.url), "")
      catch { case scala.util.control.NonFatal(e) =>
        (t.name, null: String, e.toString)
      }
    }
    raw.toDF("component", "body", "err")
      .select(col("component"),
        StatusProbe.verdict(col("body"), col("err")).as("state"),
        when(col("err") =!= "", col("err"))
          .otherwise(coalesce(col("body"), lit(""))).as("detail"))
  }

  /** Probe rows in [[Monitoring.lifecycleDf]]'s (query_name, event,
    * detail) shape, non-RUNNING only — union these with the engine's
    * own health rows and the rollup/fan-in path treats an external
    * FAILED connector like a terminated query. */
  def healthRows(spark: SparkSession): DataFrame =
    statuses(spark).filter(col("state") =!= "RUNNING")
      .select(col("component").as("query_name"),
        lit("probe").as("event"),
        concat(col("state"), lit(": "), col("detail")).as("detail"))

  /** Alert per non-RUNNING component, keyed by (component, state) so a
    * component stuck DEGRADED alerts once per dispatcher — and a later
    * transition (FAILED, say) is a NEW condition that alerts again.
    * Feed to [[AlertDispatcher.dispatchAlerts]]. */
  def alerts(spark: SparkSession): Seq[AlertSink.Alert] =
    statuses(spark).filter(col("state") =!= "RUNNING").collect().map { r =>
      val name = r.getString(0)
      val state = r.getString(1)
      AlertSink.Alert(s"probe:$name:$state", "error",
        s"connector $name is $state",
        s"status probe for $name returned $state: ${r.getString(2)}")
    }.toSeq
}

object StatusProbe {

  /** A probed component: display name + status endpoint. */
  final case class Target(name: String, url: String)

  /** Connect-convention targets for a list of connector names
    * (`/connectors/{name}/status`, cdc_health_check_dag.py:52,63). */
  def connectTargets(baseUrl: String, connectors: Seq[String]): Seq[Target] =
    connectors.map(c => Target(c, s"$baseUrl/connectors/$c/status"))

  /** The status verdict as a Column over a fetched (body, err) pair —
    * the reference's check (connector AND first task RUNNING,
    * cdc_health_check_dag.py:17-33) with failure-shaped verdicts for
    * unreachable/unparseable responses. Shared by [[StatusProbe]] and
    * the oracled `mon_probe_status` catalog query. */
  def verdict(body: org.apache.spark.sql.Column,
              err: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val schema = "STRUCT<connector: STRUCT<state: STRING>, " +
      "tasks: ARRAY<STRUCT<id: INT, state: STRING>>>"
    val j = from_json(body, schema, Map.empty[String, String])
    val connState = j.getField("connector").getField("state")
    // try_element_at: a taskless connector response has an EMPTY tasks
    // array — ANSI element_at would throw, the reference treats it as a
    // failed check (task_state None, cdc_health_check_dag.py:23)
    val taskState = try_element_at(j.getField("tasks"), lit(1))
      .getField("state")
    when(err =!= "", lit("UNREACHABLE"))
      .when(connState.isNull, lit("UNPARSEABLE"))
      .when(connState === "RUNNING" &&
        coalesce(taskState, lit("MISSING")) === "RUNNING", lit("RUNNING"))
      .otherwise(coalesce(
        when(connState =!= "RUNNING", connState),
        taskState,
        lit("DEGRADED")))
  }

  /** Default GET transport (java.net, no extra dependency). */
  def httpGet(url: String): String = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    try {
      val in = conn.getInputStream
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    } finally conn.disconnect()
  }
}
