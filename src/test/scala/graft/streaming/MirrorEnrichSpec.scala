package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sinks.{LogMirror, LogMirrorSink}

/** Stream-static enrichment against a CDC-maintained dimension mirror:
  * per-trigger freshness (dim updates visible at the NEXT trigger),
  * delete-to-null propagation, broadcast join shape, and replay
  * idempotence of the batch-partitioned output. */
case class Fact(fact_id: Long, dim_id: Long)

class MirrorEnrichSpec extends SparkSpec {
  import spark.implicits._

  private val keyCols = Seq("id")

  private def dimChanges(rows: (Long, String, String, Long, Long)*): DataFrame =
    rows.toDF("id", "v", "op", "ts_ms", "offset")
      .selectExpr("id", "v", "op", "ts_ms", "'t' AS topic",
        "0 AS partition", "offset")

  test("each trigger joins the dimension's CURRENT state: updates and " +
    "deletes land at the next trigger; missing dims enrich to null") {
    val root = Files.createTempDirectory("me").toString
    val dimRoot = s"$root/dim"
    LogMirror.merge(spark, dimRoot,
      dimChanges((10L, "gold", "r", 1000L, 0L), (20L, "silver", "r", 1000L, 1L)),
      keyCols, 0L, 16, None)

    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Fact]
    val facts = ms.toDF().withColumnRenamed("dim_id", "id")
    def runOnce(): Unit = {
      val q = MirrorEnrich.start(facts, dimRoot, LogMirrorSink(), keyCols,
        s"$root/out", s"$root/ckpt", trigger = Trigger.AvailableNow())
      try q.awaitTermination() finally q.stop()
    }

    ms.addData(Fact(1L, 10L), Fact(2L, 20L), Fact(3L, 99L))
    runOnce()
    def enriched: Map[Long, Option[String]] =
      MirrorEnrich.read(spark, s"$root/out").select("fact_id", "v")
        .as[(Long, Option[String])].collect().toMap
    assert(enriched == Map(1L -> Some("gold"), 2L -> Some("silver"),
      3L -> None))

    // dim 10 renamed, dim 20 deleted upstream — next trigger sees both
    LogMirror.merge(spark, dimRoot,
      dimChanges((10L, "platinum", "u", 2000L, 2L), (20L, "", "d", 2000L, 3L)),
      keyCols, 1L, 16, None)
    ms.addData(Fact(4L, 10L), Fact(5L, 20L))
    runOnce()
    val all = enriched
    assert(all(4L).contains("platinum"), "update must reach the next trigger")
    assert(all(5L).isEmpty, "deleted dim must enrich to null, not drop the fact")
    assert(all(1L).contains("gold"), "earlier batches are immutable")
  }

  test("the per-batch join broadcasts the dim side and a replayed " +
    "batch overwrites its own partition instead of duplicating") {
    val root = Files.createTempDirectory("me-replay").toString
    val dimRoot = s"$root/dim"
    LogMirror.merge(spark, dimRoot,
      dimChanges((10L, "gold", "r", 1000L, 0L)), keyCols, 0L, 16, None)

    // broadcast shape: the same join MirrorEnrich builds per batch
    val dim = LogMirrorSink().read(spark, dimRoot)
    val plan = Seq(Fact(1L, 10L)).toDF().withColumnRenamed("dim_id", "id")
      .join(org.apache.spark.sql.functions.broadcast(dim), keyCols, "left")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"dim join must broadcast:\n$plan")

    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Fact]
    val facts = ms.toDF().withColumnRenamed("dim_id", "id")
    ms.addData(Fact(1L, 10L), Fact(2L, 10L))
    val q = MirrorEnrich.start(facts, dimRoot, LogMirrorSink(), keyCols,
      s"$root/out", s"$root/ckpt", trigger = Trigger.AvailableNow())
    try q.awaitTermination() finally q.stop()
    assert(MirrorEnrich.read(spark, s"$root/out").count() == 2)

    // foreachBatch replay: fresh checkpoint replays offsets from zero;
    // dynamic overwrite of _batch_id=0 must leave exactly 2 rows
    val ms2 = MemoryStream[Fact]
    ms2.addData(Fact(1L, 10L), Fact(2L, 10L))
    val q2 = MirrorEnrich.start(
      ms2.toDF().withColumnRenamed("dim_id", "id"), dimRoot, LogMirrorSink(),
      keyCols, s"$root/out", s"$root/ckpt2", trigger = Trigger.AvailableNow())
    try q2.awaitTermination() finally q2.stop()
    assert(MirrorEnrich.read(spark, s"$root/out").count() == 2,
      "replayed batch must overwrite its partition, not append")
  }
}
