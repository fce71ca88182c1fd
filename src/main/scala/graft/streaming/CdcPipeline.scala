package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.cdc.{Envelope, Materialize}

/** The CDC replication pipeline as a Structured Streaming job — the
  * Spark-native equivalent of the reference's Kafka Connect sink chain
  * (EP1): envelope stream → parse → DLQ split → unwrap → route →
  * per-table upsert-merge into current-state mirrors.
  *
  * Semantics carried over from the reference:
  *   - at-least-once delivery + idempotent keyed merge = effectively-once
  *     (register-postgres-sink.json:15 upsert is the idempotency
  *     mechanism; our checkpoint replaces Connect's offset topics);
  *   - micro-batch trigger ≈ `linger.ms: 500`
  *     (register-postgres-sink.json:7);
  *   - poison records never stall the stream: they land in the DLQ table
  *     (errors.tolerance=all + DLQ topic, register-postgres-sink.json:18-21);
  *   - additive schema evolution on the mirrors (auto.evolve=true,
  *     register-postgres-sink.json:14).
  *
  * Scale design: the per-batch merge is one hash aggregation keyed by PK
  * per table; shuffle volume is bounded by batch size + mirror size. At
  * 100 TB the mirror read/rewrite would be a Delta/Iceberg MERGE (or
  * JDBC upsert, matching the reference) — the batch-side plan is
  * identical, only the sink swaps, so the merge logic stays shared with
  * [[graft.cdc.Materialize]].
  */
object CdcPipeline {

  // bounded pool for concurrent per-table merge jobs (scheduler-level
  // parallelism; the work itself runs on executors either way)
  private lazy val mergeEc = scala.concurrent.ExecutionContext.fromExecutor(
    java.util.concurrent.Executors.newFixedThreadPool(8, r => {
      val th = new Thread(r, "graft-merge")
      th.setDaemon(true)
      th
    }))

  /** @param bucketCount when set, mirrors are written partitioned by
    *   `_bucket = pmod(hash(keys), n)` — at 100 TB this is what makes a
    *   key lookup a partition-pruned read instead of a full scan, and a
    *   mirror-vs-batch merge a co-partitioned join. */
  final case class Config(
      rowSchema: StructType,
      keyCols: Seq[String],
      mirrorRoot: String,
      dlqDir: String,
      checkpointDir: String,
      triggerMs: Long = 500L,
      bucketCount: Option[Int] = None)

  private def bucketCol(cfg: Config) =
    pmod(hash(cfg.keyCols.map(col): _*), lit(cfg.bucketCount.getOrElse(1)))

  /** Start the pipeline on a streaming DataFrame of Kafka-shaped records
    * (topic, key, value, partition, offset) — from
    * `spark.readStream.format("kafka")` in production, MemoryStream in
    * tests. */
  def start(records: DataFrame, cfg: Config): StreamingQuery =
    records.writeStream
      .queryName("cdc-replication")
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(Trigger.ProcessingTime(cfg.triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, cfg)
      }
      .start()

  /** One micro-batch: DLQ split + per-table merge. Runs on the driver
    * but every DataFrame op inside is distributed; the only driver-side
    * data is the list of table names present in the batch (≤ #tables). */
  def processBatch(batch: DataFrame, batchId: Long, cfg: Config): Unit = {
    val spark = batch.sparkSession
    val parsed = Envelope.parse(batch, cfg.rowSchema).persist()
    try {
      // DLQ path first: append-only raw strings (register-dlq-sink.json:16-17)
      val dlq = Envelope.dlq(parsed)
      dlq.write.mode("append").parquet(cfg.dlqDir)

      val unwrapped = Envelope.unwrap(Envelope.wellFormed(parsed), cfg.keyCols)
        .withColumn("table_name", Envelope.route(col("topic")))
        .persist()
      try {
        // Driver-side loop over *table names only* — the reference routes
        // per-topic the same way (RegexRouter → per-table sink tables).
        // Merges are submitted concurrently: each is an independent Spark
        // job, so small per-table batches don't serialize on the driver.
        val tables = unwrapped.select("table_name").distinct()
          .collect().map(_.getString(0)).filter(_.nonEmpty)
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: ExecutionContext = mergeEc
        val jobs = tables.toSeq.map { t =>
          Future {
            val changes = unwrapped.filter(col("table_name") === t).drop("table_name")
            mergeIntoMirror(spark, changes, t, cfg)
          }
        }
        jobs.foreach(Await.result(_, Duration.Inf))
      } finally unwrapped.unpersist()
    } finally parsed.unpersist()
  }

  /** Keyed merge of one table's changes into its parquet mirror with an
    * atomic staging-dir swap (a stand-in for a transactional sink). */
  def mergeIntoMirror(spark: SparkSession, changes: DataFrame, table: String,
                      cfg: Config): Unit = {
    val live = new Path(s"${cfg.mirrorRoot}/$table/live")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(live)) Materialize.merge(
        spark.read.parquet(live.toString).drop("_bucket"), changes, cfg.keyCols)
      else Materialize.versionedState(changes, cfg.keyCols)
    val staging = new Path(s"${cfg.mirrorRoot}/$table/.staging")
    fs.delete(staging, true)
    val writer = cfg.bucketCount match {
      case Some(n) => merged
        .withColumn("_bucket", bucketCol(cfg))
        .repartition(n, col("_bucket"))
        .write.partitionBy("_bucket")
      case None => merged.write
    }
    writer.mode("overwrite").parquet(staging.toString)
    val old = new Path(s"${cfg.mirrorRoot}/$table/.old")
    fs.delete(old, true)
    if (fs.exists(live)) fs.rename(live, old)
    fs.rename(staging, live)
    fs.delete(old, true)
  }

  /** Read a table's current (live, unversioned) mirror state. */
  def mirror(spark: SparkSession, cfg: Config, table: String): DataFrame =
    Materialize.stripVersions(
      spark.read.parquet(s"${cfg.mirrorRoot}/$table/live"))
      .drop("_bucket")

  /** Point lookup by primary key: on a bucketed mirror the `_bucket`
    * predicate prunes to one partition directory. */
  def lookup(spark: SparkSession, cfg: Config, table: String,
             keyValues: Seq[Any]): DataFrame = {
    val base = spark.read.parquet(s"${cfg.mirrorRoot}/$table/live")
    val keyed = cfg.keyCols.zip(keyValues).foldLeft(
      cfg.bucketCount match {
        case Some(n) => base.filter(col("_bucket") ===
          pmod(hash(keyValues.map(lit): _*), lit(n)))
        case None => base
      })((df, kv) => df.filter(col(kv._1) === lit(kv._2)))
    Materialize.stripVersions(keyed).drop("_bucket")
  }

  /** Read the dead-letter table. */
  def deadLetters(spark: SparkSession, cfg: Config): DataFrame =
    spark.read.parquet(cfg.dlqDir)
}
