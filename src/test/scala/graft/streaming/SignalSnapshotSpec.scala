package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Signal-driven incremental snapshot (Debezium execute-snapshot /
  * DBLog): a signal file starts a chunked backfill from the table's
  * registered truth source, interleaved with live changes batch by
  * batch. Verified: chunk pacing, watermark dedup (in-batch stream
  * changes beat their chunk rows), stale-row repair (backfill outranks
  * pre-signal mirror state), idle-batch progress, replay idempotence,
  * and signal once-only semantics. */
class SignalSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def env(id: Long, v: String, op: String, ts: Long): String =
    s"""{"payload":{"after":{"id":$id,"v":"$v"},"op":"$op","ts_ms":$ts}}"""

  private def rec(id: Long, v: String, op: String, ts: Long, off: Long) =
    Rec("mysql-server.pos_bi_db.ventas", s"""{"payload":{"id":$id}}""",
      env(id, v, op, ts), 0, off)

  test("chunked backfill: watermark dedup, stale repair, idle progress, " +
    "replay idempotence, signal once-only") {
    val root = Files.createTempDirectory("graft-sigsnap").toString
    val source = spark.range(0, 1000).select(col("id"),
      concat(lit("SRC"), col("id")).as("v"))
    val cfg = CdcPipeline.Config(rowSchema, Seq("id"),
      s"$root/mirror", s"$root/dlq", s"$root/ckpt",
      sinkOverride = Some(graft.sinks.LogMirrorSink()),
      signalDir = Some(s"$root/signals"),
      snapshotSources = Map("ventas" -> (() => source)),
      snapshotChunkKeys = 300)
    def mirrorMap() = CdcPipeline.mirror(spark, cfg, "ventas")
      .as[(Long, String)].collect().toMap

    // batch 0: pre-signal history — keys 0..49 with STALE values
    CdcPipeline.processBatch(
      (0L until 50L).map(i => rec(i, s"OLD$i", "r", 1000, i)).toDF(),
      0L, cfg)
    assert(mirrorMap().size == 50 && mirrorMap()(3L) == "OLD3")

    // drop the execute-snapshot signal (Debezium signal-table shape)
    Files.createDirectories(Paths.get(s"$root/signals"))
    Files.write(Paths.get(s"$root/signals/sig1.json"),
      ("""{"id":"sig-1","type":"execute-snapshot",""" +
        """"data":{"data-collections":["ventas"]}}""").getBytes("UTF-8"))

    // batch 1: chunk [0,299] + a live update INSIDE the chunk range —
    // the batch is the watermark window, so key 10 keeps the stream row
    CdcPipeline.processBatch(
      Seq(rec(10, "LIVE10", "u", 2000, 100)).toDF(), 1L, cfg)
    val m1 = mirrorMap()
    assert(m1(10L) == "LIVE10", "in-window stream change must win")
    assert(m1(3L) == "SRC3", "backfill must repair the stale row")
    assert(m1(299L) == "SRC299" && !m1.contains(300L),
      "exactly one 300-key chunk per batch")

    // batch 2: NO events at all — the idle batch still makes progress
    CdcPipeline.processBatch(Seq.empty[Rec].toDF(), 2L, cfg)
    assert(mirrorMap().contains(599L) && !mirrorMap().contains(600L))

    // batch 3: chunk [600,899] + live update at key 700 (deduped)
    CdcPipeline.processBatch(
      Seq(rec(700, "LIVE700", "u", 3000, 101)).toDF(), 3L, cfg)
    assert(mirrorMap()(700L) == "LIVE700")
    assert(mirrorMap()(899L) == "SRC899")

    // foreachBatch REPLAY of batch 3: same outcome, no double work
    CdcPipeline.processBatch(
      Seq(rec(700, "LIVE700", "u", 3000, 101)).toDF(), 3L, cfg)
    val afterReplay = mirrorMap()
    assert(afterReplay(700L) == "LIVE700" && afterReplay.size == 900)

    // batch 4: final chunk [900,999] (short chunk -> done)
    CdcPipeline.processBatch(Seq.empty[Rec].toDF(), 4L, cfg)
    val m4 = mirrorMap()
    assert(m4.size == 1000 && m4(999L) == "SRC999")
    // live rows survived end to end
    assert(m4(10L) == "LIVE10" && m4(700L) == "LIVE700")

    // batch 5: snapshot complete — the same signal never re-executes,
    // and a post-snapshot update still outranks the backfill
    CdcPipeline.processBatch(
      Seq(rec(3, "NEW3", "u", 4000, 102)).toDF(), 5L, cfg)
    val m5 = mirrorMap()
    assert(m5(3L) == "NEW3" && m5.size == 1000)

    // a NEW signal (fresh id) re-snapshots: key 3 goes back to SRC3
    // because the source is (re)declared the current truth
    Files.write(Paths.get(s"$root/signals/sig2.json"),
      ("""{"id":"sig-2","type":"execute-snapshot",""" +
        """"data":{"data-collections":["ventas"]}}""").getBytes("UTF-8"))
    (6L to 9L).foreach(b =>
      CdcPipeline.processBatch(Seq.empty[Rec].toDF(), b, cfg))
    assert(mirrorMap()(3L) == "SRC3",
      "a fresh signal must re-backfill over post-snapshot changes")
  }

  test("equal-ts stream update in a LATER batch beats the backfill " +
    "(signal-time epoch versioning)") {
    val root = Files.createTempDirectory("graft-sigsnap-tie").toString
    val source = spark.range(0, 40).select(col("id"),
      concat(lit("SRC"), col("id")).as("v"))
    val cfg = CdcPipeline.Config(rowSchema, Seq("id"),
      s"$root/mirror", s"$root/dlq", s"$root/ckpt",
      sinkOverride = Some(graft.sinks.LogMirrorSink()),
      signalDir = Some(s"$root/signals"),
      snapshotSources = Map("ventas" -> (() => source)),
      snapshotChunkKeys = 20)
    def mirrorMap() = CdcPipeline.mirror(spark, cfg, "ventas")
      .as[(Long, String)].collect().toMap

    // pre-signal history: the mirror's max version is (5000, 9)
    CdcPipeline.processBatch(
      (0L until 10L).map(i => rec(i, s"OLD$i", "r", 5000, i)).toDF(), 0L, cfg)
    Files.createDirectories(Paths.get(s"$root/signals"))
    Files.write(Paths.get(s"$root/signals/tie.json"),
      ("""{"id":"sig-tie","type":"execute-snapshot",""" +
        """"data":{"data-collections":["ventas"]}}""").getBytes("UTF-8"))
    // batch 1 backfills keys [0,19] at the signal epoch (5000, 10)
    CdcPipeline.processBatch(Seq.empty[Rec].toDF(), 1L, cfg)
    assert(mirrorMap()(3L) == "SRC3", "stale rows repaired at the epoch ts")

    // batch 2: a stream update for an ALREADY-backfilled key arriving
    // with ts_ms EQUAL to the epoch hw (an ms-granularity CDC-burst
    // tie) — its offset (11) is STRICTLY past the epoch (10), so it
    // must win deterministically; versioning chunks at
    // (hw, Long.MaxValue) silently discarded every equal-ts update.
    // (Offset exactly 10 would TIE the epoch — the documented
    // one-record ambiguity max_by resolves arbitrarily, so the spec
    // pins the deterministic region.)
    CdcPipeline.processBatch(
      Seq(rec(3, "TIE3", "u", 5000, 11)).toDF(), 2L, cfg)
    assert(mirrorMap()(3L) == "TIE3",
      "equal-ts later-batch stream update must beat the backfill")
    // and the run keeps going to completion regardless
    CdcPipeline.processBatch(Seq.empty[Rec].toDF(), 3L, cfg)
    val done = mirrorMap()
    assert(done.size == 40 && done(39L) == "SRC39" && done(3L) == "TIE3")
  }

  test("two same-batch signals naming one table start ONE run; " +
    "IntegerType keys chunk without crashing") {
    val root = Files.createTempDirectory("graft-sigsnap-dup").toString
    val intSchema = StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType)))
    // an INT-keyed source: chunk progress must cast, not getLong-crash
    val source = spark.range(0, 25).select(col("id").cast("int").as("id"),
      concat(lit("SRC"), col("id")).as("v"))
    val cfg = CdcPipeline.Config(intSchema, Seq("id"),
      s"$root/mirror", s"$root/dlq", s"$root/ckpt",
      sinkOverride = Some(graft.sinks.LogMirrorSink()),
      signalDir = Some(s"$root/signals"),
      snapshotSources = Map("ventas" -> (() => source)),
      snapshotChunkKeys = 10)
    Files.createDirectories(Paths.get(s"$root/signals"))
    // TWO signals in the same batch naming the same table
    Files.write(Paths.get(s"$root/signals/a.json"),
      ("""{"id":"sig-a","type":"execute-snapshot",""" +
        """"data":{"data-collections":["ventas"]}}""").getBytes("UTF-8"))
    Files.write(Paths.get(s"$root/signals/b.json"),
      ("""{"id":"sig-b","type":"execute-snapshot",""" +
        """"data":{"data-collections":["ventas"]}}""").getBytes("UTF-8"))
    val fs = new org.apache.hadoop.fs.Path(cfg.mirrorRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0L to 2L).foreach { b =>
      CdcPipeline.processBatch(Seq.empty[Rec].toDF(), b, cfg)
      val st = SignalSnapshot.readState(fs, cfg.mirrorRoot, b + 1)
      assert(st.active.count(p => p.table == "ventas" && !p.done) <= 1,
        s"batch $b: duplicate same-batch signals must start one run, " +
          s"got ${st.active}")
      // both signal ids are consumed (neither re-fires later)
      assert(st.processed == Set("sig-a", "sig-b"))
    }
    val m = CdcPipeline.mirror(spark, cfg, "ventas")
      .as[(Int, String)].collect().toMap
    assert(m.size == 25 && m(24) == "SRC24",
      s"int-keyed backfill must complete, got ${m.size} rows")
  }
}
