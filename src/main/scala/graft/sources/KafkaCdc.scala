package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Production Kafka source wiring for the CDC pipeline (S1) — the
  * stream the reference's Connect workers consume
  * (register-postgres-sink.json:9 topics list;
  * register-mysql-connector.json:10 topic naming).
  *
  * Emits exactly the Kafka-shaped frame `CdcPipeline.start` expects:
  * (topic, key, value, partition, offset).
  *
  * The option map and the post-load projection are factored out as pure
  * functions so the source CONTRACT is testable in this container: no
  * broker (and no spark-sql-kafka connector jar) exists here, so
  * `format("kafka").load()` itself cannot run — `KafkaCdcSpec` asserts
  * the options and the projection shape instead, and the pipeline
  * behind the projection is e2e-tested through MemoryStream with the
  * same schema. This module is the swap-in production path.
  */
object KafkaCdc {

  /** Source options for a fixed topic list.
    *
    * @param maxOffsetsPerTrigger backpressure cap — the analog of the
    *   sink's 20k in-flight buffer (register-postgres-sink.json:8)
    */
  def subscribeOptions(bootstrapServers: String, topics: Seq[String],
                       maxOffsetsPerTrigger: Long = 20000L,
                       startingOffsets: String = "earliest"): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> startingOffsets,
      "maxOffsetsPerTrigger" -> maxOffsetsPerTrigger.toString,
      // the mirror merge is idempotent per key-version, so a reset topic
      // must not kill the query (at-least-once + idempotent = exactly-once)
      "failOnDataLoss" -> "false")

  /** Source options for the include-list pattern form
    * (`mysql-server.pos_bi_db.*`, register-mysql-connector.json:11-12). */
  def patternOptions(bootstrapServers: String, topicPattern: String,
                     maxOffsetsPerTrigger: Long = 20000L,
                     startingOffsets: String = "earliest"): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribePattern" -> topicPattern,
      "startingOffsets" -> startingOffsets,
      "maxOffsetsPerTrigger" -> maxOffsetsPerTrigger.toString,
      "failOnDataLoss" -> "false")

  /** Kafka's wire frame → the pipeline's envelope frame: keys/values
    * arrive as binary (Debezium JSON bytes) and are decoded to UTF-8
    * strings; partition/offset ride along for lag accounting and
    * version ordering. */
  def envelopeProjection(kafkaFrame: DataFrame): DataFrame =
    kafkaFrame.select(col("topic"),
      col("key").cast("string").as("key"),
      col("value").cast("string").as("value"),
      col("partition"), col("offset"))

  /** Subscribe to the per-table CDC topics. */
  def stream(spark: SparkSession, bootstrapServers: String,
             topics: Seq[String],
             maxOffsetsPerTrigger: Long = 20000L,
             startingOffsets: String = "earliest"): DataFrame =
    envelopeProjection(spark.readStream.format("kafka")
      .options(subscribeOptions(bootstrapServers, topics,
        maxOffsetsPerTrigger, startingOffsets))
      .load())

  /** Subscribe by pattern — the include-list form. */
  def streamPattern(spark: SparkSession, bootstrapServers: String,
                    topicPattern: String,
                    maxOffsetsPerTrigger: Long = 20000L): DataFrame =
    envelopeProjection(spark.readStream.format("kafka")
      .options(patternOptions(bootstrapServers, topicPattern,
        maxOffsetsPerTrigger))
      .load())
}
