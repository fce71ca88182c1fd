package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class AlertSinkSpec extends SparkSpec {
  import AlertSink._

  private def awaitNonEmpty(f: => Boolean): Unit = {
    // the streaming listener bus is async — allow it to drain
    val deadline = System.nanoTime() + 10000000000L
    while (!f && System.nanoTime() < deadline) Thread.sleep(50)
  }

  test("webhook sink posts the JSON payload; non-2xx is an error") {
    val posted = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val ok = new WebhookSink("http://alerts.invalid/hook",
      (u, b) => { posted += ((u, b)); 200 })
    ok.deliver(Alert("health:q1", "error", "query q1 terminated", "boom \"x\""))
    assert(posted.size == 1)
    assert(posted.head._1 == "http://alerts.invalid/hook")
    assert(posted.head._2 ==
      """{"key":"health:q1","severity":"error","subject":"query q1 terminated","body":"boom \"x\""}""")

    val down = new WebhookSink("http://alerts.invalid/hook", (_, _) => 503)
    intercept[RuntimeException] {
      down.deliver(Alert("k", "warn", "s", "b"))
    }
  }

  test("email channel renders the reference's subject/body format and " +
    "delivers once per condition") {
    val sent = scala.collection.mutable.ArrayBuffer.empty[Email]
    val email = new EmailSink(Seq("ops@example.invalid"), "graft@local",
      sent += _)
    val dispatcher = new AlertDispatcher(Seq(email))
    val alert = Alert("probe:mysql-connector:FAILED", "error",
      "connector mysql-connector is FAILED", "task 0 threw")
    assert(dispatcher.dispatchAlerts(Seq(alert)) == 1)
    // re-dispatching the same condition sends NOTHING more (the
    // reference's one-email-per-failed-run)
    assert(dispatcher.dispatchAlerts(Seq(alert)) == 0)
    assert(sent.size == 1)
    val m = sent.head
    assert(m.to == Seq("ops@example.invalid"))
    assert(m.subject == "[ALERT][ERROR] connector mysql-connector is FAILED")
    assert(m.htmlBody.contains("<h3>connector mysql-connector is FAILED</h3>"))
    assert(m.htmlBody.contains("<p>task 0 threw</p>"))
    assert(m.htmlBody.contains("probe:mysql-connector:FAILED"))
    // RFC-822-ish serialization carries headers then body
    assert(m.serialized.startsWith("From: graft@local\nTo: ops@example.invalid\n"))

    // file transport: one .eml per message; identical redelivery
    // overwrites (content-hash name) instead of accreting
    val dir = java.nio.file.Files.createTempDirectory("graft-eml").toString
    val fileSink = new EmailSink(Seq("ops@example.invalid"), "graft@local",
      EmailSink.fileTransport(dir))
    fileSink.deliver(alert)
    fileSink.deliver(alert)
    val files = new java.io.File(dir).listFiles()
    assert(files.length == 1 && files.head.getName.endsWith(".eml"))
    val content = scala.io.Source.fromFile(files.head).mkString
    assert(content.contains("Subject: [ALERT][ERROR] connector mysql-connector is FAILED"))
  }

  test("a failing channel is retried on the next dispatch and never " +
    "suppresses the alert or its sibling channels") {
    val good = new InMemorySink
    var webhookUp = false
    val flakyDelivered = scala.collection.mutable.ArrayBuffer.empty[Alert]
    val flaky = new AlertSink {
      // same failure mode as WebhookSink on a non-2xx response
      override def deliver(a: Alert): Unit = {
        if (!webhookUp) sys.error("webhook delivery failed: HTTP 503")
        flakyDelivered += a
      }
    }
    val dispatcher = new AlertDispatcher(Seq(good, flaky))
    val a1 = Alert("health:q1", "error", "q1 down", "boom")
    val a2 = Alert("health:q2", "error", "q2 down", "boom")

    // webhook down: the healthy channel still gets BOTH alerts (one bad
    // delivery must not abort the rest of the batch), nothing is fully
    // delivered, and the keys are NOT burned
    assert(dispatcher.dispatchAlerts(Seq(a1, a2)) == 0)
    assert(good.delivered.map(_.key) == Seq("health:q1", "health:q2"))
    assert(flakyDelivered.isEmpty)

    // webhook back up: the retry delivers both alerts on the flaky
    // channel WITHOUT re-notifying the healthy one
    webhookUp = true
    assert(dispatcher.dispatchAlerts(Seq(a1, a2)) == 2)
    assert(good.delivered.size == 2, "already-delivered channel not re-notified")
    assert(flakyDelivered.map(_.key).toSeq == Seq("health:q1", "health:q2"))

    // steady state: nothing re-fires anywhere
    assert(dispatcher.dispatchAlerts(Seq(a1, a2)) == 0)
    assert(good.delivered.size == 2 && flakyDelivered.size == 2)
  }

  test("concurrent dispatches of the same alert deliver exactly once " +
    "per channel (atomic claim)") {
    val mem = new InMemorySink
    val dispatcher = new AlertDispatcher(Seq(mem))
    val alert = Alert("health:race", "error", "down", "boom")
    val threads = (1 to 8).map(_ => new Thread(() => {
      dispatcher.dispatchAlerts(Seq(alert)); ()
    }))
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(mem.delivered.size == 1,
      s"atomic claim violated: ${mem.delivered.size} deliveries")
  }

  test("a failed streaming query delivers exactly one alert; " +
    "redispatch and replays deliver nothing") {
    val mon = Monitoring.attach(spark)
    val mem = new InMemorySink
    val dispatcher = new AlertDispatcher(Seq(mem, new LogSink))
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    try {
      val ms = MemoryStream[Long]
      val q = ms.toDS().map { x =>
        if (x >= 0) throw new RuntimeException("poison record") else x
      }.writeStream.format("noop")
        .queryName("alert_e2e")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("alert-ckpt").toString)
        .start()
      ms.addData(1L)
      intercept[Exception] { q.processAllAvailable() }
      awaitNonEmpty(!mon.healthAlerts.isEmpty)

      assert(dispatcher.dispatch(mon) == 1, "first dispatch delivers the failure")
      assert(mem.delivered.size == 1)
      val a = mem.delivered.head
      assert(a.severity == "error")
      assert(a.body.contains("poison record"))

      // every later trigger re-dispatches; the condition must not re-fire
      assert(dispatcher.dispatch(mon) == 0)
      assert(mem.delivered.size == 1)
    } finally spark.streams.removeListener(mon)
  }

  test("lag SLO breach alerts once per (query, batch)") {
    val mon = Monitoring.attach(spark)
    val mem = new InMemorySink
    val dispatcher = new AlertDispatcher(Seq(mem), lagThreshold = 100)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    try {
      val ms = MemoryStream[Long]
      val q = ms.toDS().writeStream.format("noop")
        .queryName("lag_e2e")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("lag-ckpt").toString)
        .start()
      try {
        ms.addData(0L until 600L: _*)
        q.processAllAvailable()
        awaitNonEmpty(!mon.lagAlerts(100).isEmpty)

        val n = dispatcher.dispatch(mon)
        assert(n >= 1, "oversized batch must trip the lag SLO")
        assert(mem.delivered.exists(a =>
          a.severity == "warn" && a.subject.contains("lag_e2e")))
        assert(dispatcher.dispatch(mon) == 0)
      } finally q.stop()
    } finally spark.streams.removeListener(mon)
  }
}
