package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Cross-table consistent snapshots: torn-batch prevention (a reader
  * through the snapshot never sees table A at batch N with table B at
  * N-1), crash fallback to the previous complete cut, carry-forward of
  * untouched tables, replay idempotence, and live-read fallback. */
class SnapshotCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val keyCols = Seq("id")

  private def changes(rows: (Long, String, String, Long, Long)*): DataFrame =
    rows.toDF("id", "v", "op", "ts_ms", "offset")
      .selectExpr("id", "v", "op", "ts_ms", "'t' AS topic",
        "0 AS partition", "offset")

  private def merge(group: String, table: String, c: DataFrame,
                    batchId: Long): Unit =
    LogMirror.merge(spark, s"$group/$table", c, keyCols, batchId, 16, None)

  private def snapState(group: String, table: String): Map[Long, String] =
    SnapshotCatalog.readTable(spark, group, table).select("id", "v")
      .as[(Long, String)].collect().toMap

  test("snapshot reader never sees a torn batch; crash before the " +
    "snapshot commit falls back to the previous complete cut") {
    val group = Files.createTempDirectory("graft-snap").toString
    // batch 0: both tables, snapshot committed
    merge(group, "a", changes((1L, "a0", "r", 1000L, 1L)), 0L)
    merge(group, "b", changes((1L, "b0", "r", 1000L, 1L)), 0L)
    SnapshotCatalog.commit(spark, group, 0L, Seq("a", "b"))
    // batch 1: table a merged, then CRASH — b never merged, no snapshot
    merge(group, "a", changes((1L, "a1", "u", 2000L, 2L)), 1L)
    // live reads are torn (new a, old b)...
    assert(LogMirror.read(spark, s"$group/a").select("v")
      .as[String].collect().toSeq == Seq("a1"))
    // ...snapshot reads are not: BOTH tables at the batch-0 cut
    assert(snapState(group, "a") == Map(1L -> "a0"))
    assert(snapState(group, "b") == Map(1L -> "b0"))
    // recovery: the batch replays fully and commits its snapshot
    merge(group, "b", changes((1L, "b1", "u", 2000L, 2L)), 1L)
    SnapshotCatalog.commit(spark, group, 1L, Seq("a", "b"))
    assert(snapState(group, "a") == Map(1L -> "a1"))
    assert(snapState(group, "b") == Map(1L -> "b1"))
  }

  test("untouched tables carry their pinned version forward") {
    val group = Files.createTempDirectory("graft-snap").toString
    merge(group, "a", changes((1L, "a0", "r", 1000L, 1L)), 0L)
    merge(group, "b", changes((1L, "b0", "r", 1000L, 1L)), 0L)
    SnapshotCatalog.commit(spark, group, 0L, Seq("a", "b"))
    // batch 1 touches only a
    merge(group, "a", changes((2L, "a1", "r", 2000L, 2L)), 1L)
    val pins = SnapshotCatalog.commit(spark, group, 1L, Seq("a"))
    assert(pins.keySet == Set("a", "b"))
    assert(snapState(group, "a") == Map(1L -> "a0", 2L -> "a1"))
    assert(snapState(group, "b") == Map(1L -> "b0"))
  }

  test("replaying a snapshot commit is idempotent; latest returns the " +
    "highest id") {
    val group = Files.createTempDirectory("graft-snap").toString
    merge(group, "a", changes((1L, "a0", "r", 1000L, 1L)), 0L)
    SnapshotCatalog.commit(spark, group, 0L, Seq("a"))
    val first = SnapshotCatalog.latest(spark, group)
    SnapshotCatalog.commit(spark, group, 0L, Seq("a")) // replay
    assert(SnapshotCatalog.latest(spark, group) == first)
    merge(group, "a", changes((1L, "a1", "u", 2000L, 2L)), 1L)
    SnapshotCatalog.commit(spark, group, 1L, Seq("a"))
    assert(SnapshotCatalog.latest(spark, group).map(_._1).contains(1L))
  }

  test("historical snapshot reads are group-consistent; sweep bounds " +
    "the snapshot file count and how far back reads reach") {
    val group = Files.createTempDirectory("graft-snap").toString
    // four batches, keep=2
    (0 to 3).foreach { b =>
      merge(group, "a", changes((1L, s"a$b", if (b == 0) "r" else "u",
        1000L * (b + 1), b + 1L)), b.toLong)
      SnapshotCatalog.commit(spark, group, b.toLong, Seq("a"), keep = 2)
    }
    // snapshots 0 and 1 swept, 2 and 3 retained
    assert(SnapshotCatalog.at(spark, group, 0L).isEmpty)
    assert(SnapshotCatalog.at(spark, group, 1L).isEmpty)
    assert(SnapshotCatalog.readTableAt(spark, group, "a", 2L)
      .select("v").as[String].collect().toSeq == Seq("a2"))
    assert(SnapshotCatalog.readTableAt(spark, group, "a", 3L)
      .select("v").as[String].collect().toSeq == Seq("a3"))
    intercept[LogMirror.RetentionLostException] {
      SnapshotCatalog.readTableAt(spark, group, "a", 0L)
    }
    intercept[RuntimeException] {
      SnapshotCatalog.readTableAt(spark, group, "unknown", 3L)
    }
  }

  test("groups without a snapshot fall back to the live read") {
    val group = Files.createTempDirectory("graft-snap").toString
    merge(group, "a", changes((1L, "a0", "r", 1000L, 1L)), 0L)
    assert(snapState(group, "a") == Map(1L -> "a0"))
  }

  test("pipeline integration: consistentSnapshots commits one snapshot " +
    "per batch covering every table it touched") {
    val group = Files.createTempDirectory("graft-snap-pipe").toString
    val cfg = graft.streaming.CdcPipeline.Config(
      rowSchema = graft.cdc.Fixture.rowSchema,
      keyCols = Seq("id"),
      mirrorRoot = group,
      dlqDir = s"$group/_dlq",
      checkpointDir = s"$group/_ckpt",
      sinkOverride = Some(LogMirrorSink()),
      consistentSnapshots = true)
    val events = graft.cdc.Fixture.ordersCdcEvents(spark, sf0001)
    graft.streaming.CdcPipeline.processBatch(events, 0L, cfg)
    val snap = SnapshotCatalog.latest(spark, group)
    assert(snap.nonEmpty, "no snapshot committed")
    val (id, pins) = snap.get
    assert(id == 0L)
    assert(pins.nonEmpty)
    // every pinned table resolves consistently through the snapshot
    pins.keys.foreach { t =>
      assert(SnapshotCatalog.readTable(spark, group, t).count() ==
        LogMirror.read(spark, s"$group/$t").count(), s"table $t torn")
    }
  }
}
