package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Production Kafka source wiring for the CDC pipeline (S1) — the
  * stream the reference's Connect workers consume
  * (register-postgres-sink.json:9 topics list;
  * register-mysql-connector.json:10 topic naming).
  *
  * Emits exactly the Kafka-shaped frame `CdcPipeline.start` expects:
  * (topic, key, value, partition, offset). In this container there is
  * no broker, so tests drive the pipeline through MemoryStream with the
  * same schema; this module is the swap-in production path.
  */
object KafkaCdc {

  /** Subscribe to the per-table CDC topics.
    *
    * @param maxOffsetsPerTrigger backpressure cap — the analog of the
    *   sink's 20k in-flight buffer (register-postgres-sink.json:8)
    */
  def stream(spark: SparkSession, bootstrapServers: String,
             topics: Seq[String],
             maxOffsetsPerTrigger: Long = 20000L,
             startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .option("failOnDataLoss", "false")
      .load()
      .select(col("topic"), col("key").cast("string").as("key"),
        col("value").cast("string").as("value"),
        col("partition"), col("offset"))

  /** Subscribe by pattern — the include-list form
    * (`mysql-server.pos_bi_db.*`, register-mysql-connector.json:11-12). */
  def streamPattern(spark: SparkSession, bootstrapServers: String,
                    topicPattern: String,
                    maxOffsetsPerTrigger: Long = 20000L): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribePattern", topicPattern)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .option("failOnDataLoss", "false")
      .load()
      .select(col("topic"), col("key").cast("string").as("key"),
        col("value").cast("string").as("value"),
        col("partition"), col("offset"))
}
