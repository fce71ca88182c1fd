package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

/** Alert delivery channel (ST9 tail) — the reference's failure path is
  * an email task gated ONE_FAILED (cdc_health_check_dag.py:71-87, SMTP
  * relay in docker-compose.yml:42-48). The engine computes the alert
  * ROWS ([[Monitoring.lagAlerts]]/[[Monitoring.healthAlerts]]); a sink
  * is purely the delivery concern, so channels are pluggable and the
  * dispatcher is channel-agnostic.
  */
trait AlertSink {
  def deliver(alert: AlertSink.Alert): Unit
}

object AlertSink {

  /** One delivered notification. `key` identifies the underlying
    * condition — the dispatcher guarantees at-most-once delivery per
    * key per dispatcher (Airflow's one-email-per-failed-run analog). */
  final case class Alert(key: String, severity: String, subject: String,
                         body: String)

  /** Log-channel sink (always available; the container has no SMTP
    * relay or network egress). */
  final class LogSink extends AlertSink {
    private val log = org.apache.logging.log4j.LogManager.getLogger("graft.alerts")
    override def deliver(a: Alert): Unit =
      log.warn(s"[${a.severity}] ${a.subject} — ${a.body}")
  }

  /** Webhook sink: POSTs a JSON payload. The HTTP transport is
    * injectable — production uses [[httpPost]]; tests (and this
    * egress-less container) inject a recorder. The payload shape matches
    * what an SMTP bridge or chat-ops webhook consumes, standing in for
    * the reference's email channel. */
  final class WebhookSink(url: String,
                          post: (String, String) => Int = httpPost)
      extends AlertSink {
    override def deliver(a: Alert): Unit = {
      val code = post(url, payload(a))
      if (code < 200 || code >= 300)
        sys.error(s"webhook delivery failed: HTTP $code for ${a.key}")
    }
  }

  /** JSON payload for [[WebhookSink]]. */
  def payload(a: Alert): String = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    s"""{"key":${q(a.key)},"severity":${q(a.severity)},""" +
      s""""subject":${q(a.subject)},"body":${q(a.body)}}"""
  }

  /** Default webhook transport (java.net, no extra dependency). */
  def httpPost(url: String, body: String): Int = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", "application/json")
    conn.setDoOutput(true)
    val out = conn.getOutputStream
    try out.write(body.getBytes("UTF-8")) finally out.close()
    try conn.getResponseCode finally conn.disconnect()
  }

  /** Recording sink for tests and for draining alerts programmatically. */
  final class InMemorySink extends AlertSink {
    private val q = new ConcurrentLinkedQueue[Alert]()
    override def deliver(a: Alert): Unit = q.add(a)
    def delivered: Seq[Alert] = q.asScala.toSeq
  }

  /** A rendered email, transport-agnostic. */
  final case class Email(from: String, to: Seq[String], subject: String,
                         htmlBody: String) {
    /** RFC-822-shaped serialization (what a file/log transport records
      * and an SMTP transport would put on the wire). */
    def serialized: String =
      s"""From: $from
         |To: ${to.mkString(", ")}
         |Subject: $subject
         |Content-Type: text/html; charset=UTF-8
         |
         |$htmlBody
         |""".stripMargin
  }

  /** SMTP-shaped channel — the reference's terminal alert action is an
    * email task (subject + html body, cdc_health_check_dag.py:71-84;
    * SMTP relay in docker-compose). The sink owns the RENDERING (the
    * EmailOperator analog); delivery goes through a pluggable transport
    * — an SMTP client in production, [[EmailSink.fileTransport]] in
    * this relay-less sandbox. A transport that throws fails the
    * delivery, so the dispatcher's per-(alert,channel) retry semantics
    * apply unchanged. */
  final class EmailSink(to: Seq[String], from: String = "graft-alerts@local",
                        send: Email => Unit) extends AlertSink {
    override def deliver(a: Alert): Unit = send(EmailSink.render(a, to, from))
  }

  object EmailSink {

    /** The reference's email format: flagged subject, h3 headline,
      * body lines as paragraphs, provenance footer
      * (cdc_health_check_dag.py:73-84). */
    def render(a: Alert, to: Seq[String], from: String): Email = Email(
      from, to,
      subject = s"[ALERT][${a.severity.toUpperCase}] ${a.subject}",
      htmlBody =
        s"""<h3>${a.subject}</h3>
           |<p>${a.body}</p>
           |<p><strong>Condition:</strong> ${a.key}</p>
           |<br><small>Sent automatically by the graft alert dispatcher.</small>""".stripMargin)

    /** File transport: one file per message under `dir` (named by a
      * content hash, so a redelivered identical message overwrites
      * instead of accreting). The sandbox stand-in for an SMTP client. */
    def fileTransport(dir: String): Email => Unit = { m =>
      val path = new java.io.File(dir)
      path.mkdirs()
      val name = java.util.UUID.nameUUIDFromBytes(
        m.serialized.getBytes("UTF-8")).toString
      val f = new java.io.File(path, s"$name.eml")
      val w = new java.io.FileWriter(f)
      try w.write(m.serialized) finally w.close()
    }
  }
}

/** Fans alert rows out to the configured channels, at most once per
  * alert key PER CHANNEL: repeated dispatch calls (every trigger, say)
  * re-deliver nothing for conditions already notified — exactly the
  * reference's one-email-per-failed-run behavior (TriggerRule.ONE_FAILED
  * fires once per DAG run, cdc_health_check_dag.py:83-87).
  *
  * Delivery failures are NOT committed: a sink that throws (webhook
  * outage, say) is retried on the next dispatch, and only that sink —
  * channels that already delivered the key are never re-notified. A
  * failure is also isolated to its (alert, sink) pair: the remaining
  * sinks and remaining alerts of the same dispatch still run (the
  * reference's email task is likewise retried per task instance, not
  * dropped, and one failed notification never cancels the others).
  *
  * Alert volume is listener-event-bounded (queries × batches), never
  * data-bounded, so the driver-side delivered-set is O(small × channels)
  * by construction.
  */
final class AlertDispatcher(sinks: Seq[AlertSink], lagThreshold: Long = 500) {
  import AlertSink.Alert

  private val log = org.apache.logging.log4j.LogManager.getLogger("graft.alerts")
  // (alert key, sink index) pairs whose delivery SUCCEEDED; a key is
  // committed per channel only after that channel accepted it.
  private val delivered = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Int)]()

  private def fullyDelivered(key: String): Boolean =
    sinks.indices.forall(i => delivered.contains((key, i)))

  /** Attempt every not-yet-successful channel for `a`; returns true iff
    * the alert is now delivered on all channels. The ConcurrentHashMap
    * `add` is an ATOMIC claim taken before delivering (and released on
    * failure so the next dispatch retries) — concurrent dispatches of
    * the same key therefore can't double-deliver on a channel. */
  private def emit(a: Alert): Boolean = {
    sinks.zipWithIndex.foreach { case (sink, i) =>
      if (delivered.add((a.key, i))) {
        try sink.deliver(a)
        catch {
          case scala.util.control.NonFatal(e) =>
            delivered.remove((a.key, i))
            log.warn(s"delivery of ${a.key} to sink #$i failed, " +
              s"will retry next dispatch: $e")
        }
      }
    }
    fullyDelivered(a.key)
  }

  /** Collect current alert rows from `mon` and deliver the new ones.
    * Returns the number of alerts that became fully delivered (all
    * channels) by THIS call. */
  def dispatch(mon: Monitoring): Int = {
    val lag = mon.lagAlerts(lagThreshold).collect().map { r =>
      val q = r.getAs[String]("query_name")
      val b = r.getAs[Long]("batch_id")
      Alert(s"lag:$q:$b", "warn",
        s"lag SLO breach in $q",
        s"batch $b queued ${r.getAs[Long]("lag")} rows " +
          s"(threshold ${r.getAs[Long]("threshold")})")
    }
    val health = mon.healthAlerts.collect().map { r =>
      val q = r.getAs[String]("query_name")
      val detail = r.getAs[String]("detail")
      Alert(s"health:$q", "error", s"query $q terminated abnormally", detail)
    }
    dispatchAlerts(lag ++ health)
  }

  /** Deliver a batch of already-collected alerts (the channel-facing
    * half of [[dispatch]]). Returns the number that became fully
    * delivered by this call. */
  def dispatchAlerts(alerts: Seq[Alert]): Int =
    alerts.count { a =>
      val before = fullyDelivered(a.key)
      emit(a) && !before
    }
}
