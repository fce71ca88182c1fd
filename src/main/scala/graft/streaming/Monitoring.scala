package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Push-based observability engine — replaces the reference's polling
  * DAGs (EP3). Where the reference polls Kafka every 2 minutes for
  * consumer lag (kafka_latency_monitor.py:106) and the Connect REST API
  * every 5 for health (cdc_health_check_dag.py:43), Spark *pushes*
  * progress after every micro-batch through StreamingQueryListener —
  * metric freshness is one trigger interval (≈500 ms), not minutes.
  */
class Monitoring(spark: SparkSession) extends StreamingQueryListener {
  import Monitoring.{Lifecycle, Progress}

  private val progress = new ConcurrentLinkedQueue[Progress]()
  private val lifecycle = new ConcurrentLinkedQueue[Lifecycle]()

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    lifecycle.add(Lifecycle(e.name, "started", e.id.toString))

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    progress.add(Progress(
      Option(p.name).getOrElse(""), p.batchId, p.timestamp,
      p.numInputRows,
      if (p.inputRowsPerSecond.isNaN) 0d else p.inputRowsPerSecond,
      if (p.processedRowsPerSecond.isNaN) 0d else p.processedRowsPerSecond,
      p.batchDuration))
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    lifecycle.add(Lifecycle(e.id.toString, "terminated",
      e.exception.getOrElse("")))

  /** Metrics as a DataFrame — the same shape the reference's monitors
    * build by polling (ST4/ST7). */
  def progressDf: DataFrame = {
    import spark.implicits._
    progress.asScala.toSeq.toDF()
  }

  def lifecycleDf: DataFrame = {
    import spark.implicits._
    lifecycle.asScala.toSeq.toDF()
  }

  /** ST7 backpressure alert: batches whose input exceeded the lag SLO
    * (MAX_LAG_THRESHOLD=500, kafka_latency_monitor.py:15) — with a
    * push-based listener, "lag" is rows queued beyond one trigger. */
  def lagAlerts(threshold: Long = 500): DataFrame =
    progressDf.filter(col("num_input_rows") > threshold)
      .select(col("query_name"), col("batch_id"),
        col("num_input_rows").as("lag"),
        lit(threshold).as("threshold"))

  /** ST8 health: queries that terminated with an exception. */
  def healthAlerts: DataFrame =
    lifecycleDf.filter(col("event") === "terminated" && col("detail") =!= "")

  /** ST9 alert fan-in: ANY failure across monitor families
    * (TriggerRule.ONE_FAILED, cdc_health_check_dag.py:83-87). */
  def anyAlert(threshold: Long = 500): Boolean =
    !lagAlerts(threshold).isEmpty || !healthAlerts.isEmpty
}

object Monitoring {
  // top-level case classes so Encoders can be derived without an outer
  // instance in scope
  final case class Progress(
      query_name: String, batch_id: Long, timestamp: String,
      num_input_rows: Long, input_rows_per_second: Double,
      process_rows_per_second: Double, batch_duration_ms: Long)
  final case class Lifecycle(query_name: String, event: String,
                             detail: String)

  /** Attach a fresh monitoring listener to the session. */
  def attach(spark: SparkSession): Monitoring = {
    val m = new Monitoring(spark)
    spark.streams.addListener(m)
    m
  }
}
