package graft.streaming

import graft.SparkSpec

/** External-connector status probe: Connect-style JSON verdicts, the
  * health-row shape shared with the engine's own monitors, transport
  * failure tolerance, and exactly-one-alert-per-condition through the
  * dispatcher. */
class StatusProbeSpec extends SparkSpec {
  import StatusProbe._

  private def running(name: String) =
    s"""{"name":"$name","connector":{"state":"RUNNING"},
       |"tasks":[{"id":0,"state":"RUNNING"}]}""".stripMargin
  private def failedTask(name: String) =
    s"""{"name":"$name","connector":{"state":"RUNNING"},
       |"tasks":[{"id":0,"state":"FAILED"}]}""".stripMargin
  private def pausedConnector(name: String) =
    s"""{"name":"$name","connector":{"state":"PAUSED"},
       |"tasks":[{"id":0,"state":"RUNNING"}]}""".stripMargin

  private val targets = connectTargets("http://connect.invalid:8083",
    Seq("mysql-connector", "postgres-sink", "gone"))

  test("connect-convention targets build the reference's status URLs") {
    assert(targets.head ==
      Target("mysql-connector",
        "http://connect.invalid:8083/connectors/mysql-connector/status"))
  }

  test("verdicts: RUNNING needs connector AND first task running; " +
    "transport/parse failures are verdicts, not exceptions") {
    val probe = new StatusProbe(targets, fetch = url =>
      if (url.contains("mysql")) running("mysql-connector")
      else if (url.contains("postgres")) failedTask("postgres-sink")
      else sys.error("connection refused"))
    val st = probe.statuses(spark).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(st == Map("mysql-connector" -> "RUNNING",
      "postgres-sink" -> "FAILED", "gone" -> "UNREACHABLE"))

    val paused = new StatusProbe(Seq(targets.head),
      fetch = _ => pausedConnector("mysql-connector"))
    assert(paused.statuses(spark).head().getString(1) == "PAUSED")

    val garbage = new StatusProbe(Seq(targets.head), fetch = _ => "not json")
    assert(garbage.statuses(spark).head().getString(1) == "UNPARSEABLE")
  }

  test("healthRows carry the lifecycleDf shape so externals join the " +
    "engine's health rollup") {
    val probe = new StatusProbe(targets.take(2), fetch = url =>
      if (url.contains("mysql")) running("mysql-connector")
      else failedTask("postgres-sink"))
    val rows = probe.healthRows(spark)
    assert(rows.columns.toSeq == Seq("query_name", "event", "detail"))
    val r = rows.collect()
    assert(r.length == 1, "RUNNING components produce no health row")
    assert(r.head.getString(0) == "postgres-sink")
    assert(r.head.getString(2).startsWith("FAILED: "))

    // unions cleanly with the engine's own health frame
    val mon = Monitoring.attach(spark)
    assert(mon.healthAlerts.unionByName(rows).count() == 1)
  }

  test("a DEGRADED probe yields exactly one dispatched alert; recovery " +
    "then a NEW state re-alerts") {
    var state: String => String = _ => failedTask("postgres-sink")
    val probe = new StatusProbe(targets.slice(1, 2), url => state(url))
    val sink = new AlertSink.InMemorySink
    val dispatcher = new AlertDispatcher(Seq(sink))

    // three polls of the same degraded state: ONE alert
    assert(dispatcher.dispatchAlerts(probe.alerts(spark)) == 1)
    assert(dispatcher.dispatchAlerts(probe.alerts(spark)) == 0)
    assert(dispatcher.dispatchAlerts(probe.alerts(spark)) == 0)
    assert(sink.delivered.size == 1)
    assert(sink.delivered.head.key == "probe:postgres-sink:FAILED")
    assert(sink.delivered.head.subject == "connector postgres-sink is FAILED")

    // recovery: no alert rows at all
    state = _ => running("postgres-sink")
    assert(probe.alerts(spark).isEmpty)

    // a different failure state is a NEW condition — alerts again
    state = _ => pausedConnector("postgres-sink")
    assert(dispatcher.dispatchAlerts(probe.alerts(spark)) == 1)
    assert(sink.delivered.size == 2)
  }
}
