package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sinks.MirrorSink

/** Stream-static enrichment against a CDC-MAINTAINED dimension: each
  * micro-batch left-joins the dimension mirror's CURRENT state, so
  * upstream dimension changes (the reference's replicated tables)
  * reach the enriched stream at the next trigger without restarting
  * it — the lambda join every downstream consumer of the reference's
  * mirrors runs (facts from Kafka, dims from the replicated DB).
  *
  * Semantics:
  *   - the mirror is RE-RESOLVED per batch (mirror reads resolve the
  *     newest committed manifest/swap, so each trigger sees a
  *     consistent point-in-time dimension — never a torn write);
  *   - rows whose dimension key was DELETED upstream enrich to null
  *     (left join) — deletions propagate, they don't drop facts;
  *   - output lands batch-partitioned with dynamic overwrite, the
  *     repo's replay-idempotence pattern: a foreachBatch retry
  *     rewrites its own partition instead of duplicating it.
  *
  * Scale: the dim side wears an explicit `broadcast` hint — a
  * dimension that fits the broadcast threshold never shuffles the
  * fact stream (the common case: dims are small relative to facts).
  * For a dimension too big to broadcast, drop the hint and give the
  * mirror a bucketed layout so the per-batch join prunes; the
  * per-batch plan is ordinary Catalyst either way.
  */
object MirrorEnrich {

  /** Partition column stamped on the enriched output. */
  val batchCol = "_batch_id"

  /** Start the enrichment stream. `dimCols` selects which mirror
    * columns to carry (key columns always join; pass Nil for all). */
  def start(facts: DataFrame, dimRoot: String, dimSink: MirrorSink,
            joinKeys: Seq[String], outDir: String, checkpointDir: String,
            dimCols: Seq[String] = Nil,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    facts.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val dimAll = dimSink.read(spark, dimRoot)
        val dim = if (dimCols.isEmpty) dimAll
          else dimAll.select((joinKeys ++ dimCols).distinct.map(col): _*)
        batch
          .join(broadcast(dim), joinKeys, "left")
          .withColumn(batchCol, lit(batchId))
          .write
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(batchCol)
          .mode("overwrite")
          .parquet(outDir)
        ()
      }
      .start()

  /** The enriched output without the bookkeeping partition column. */
  def read(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).drop(batchCol)
}
