package graft
import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale e2e for the changefeed/replication path (X25/X26 + X48 —
  * VERDICT r12 item 7): the query-shape catalog runs at sf1 through
  * the density-stress gate, but `ChangefeedReplicator.poll`'s
  * mid-stream fold handling and the retention-lost re-snapshot branch
  * had only sf0.001–0.1 spec evidence. This main drives the REAL
  * pipeline at an arbitrary SF dir and prints one JSON line of phase
  * timings + invariant checks for the gate artifact:
  *
  *   1. streams the fixture's CDC envelopes through
  *      `CdcPipeline.processBatch` in 8 offset-ordered batches into a
  *      log-structured source mirror with maxDeltas=4 — compaction
  *      FOLDS mid-stream several times;
  *   2. polls the replicator after batch 2 (incremental branch), lets
  *      the remaining batches fold past the consumer's checkpoint,
  *      polls again — MUST take the re-snapshot branch;
  *   3. one more source batch + poll — MUST be incremental again;
  *   4. verifies target state == source state DISTRIBUTEDLY (two
  *      anti-join counts — no driver collect at sf grain).
  *
  * Run via tools/sf1_gate.sh (appended after the catalog compare) or
  * standalone: `sbt "runMain graft.ReplicationE2E /tmp/graft_sf1"`.
  */
object ReplicationE2E {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: graft.ReplicationE2E <sfDir>")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-repl-e2e")
      .toString
    val table = "orders_t0"
    val srcTableRoot = s"$root/mirror/$table"
    val dstRoot = s"$root/target"
    val sink = graft.sinks.LogMirrorSink()
    val cfg = graft.streaming.CdcPipeline.Config(
      graft.cdc.Fixture.rowSchema, Seq("id"),
      s"$root/mirror", s"$root/dlq", s"$root/ckpt",
      sinkOverride = Some(graft.sinks.LogMirrorSink(maxDeltas = 4)))

    val raw = graft.cdc.Fixture.ordersCdcEvents(spark, sfDir).persist()
    val nEvents = raw.count()
    val batchBound = math.max(1L, nEvents / 8)
    def batch(i: Long) = raw.filter(
      col("offset") >= i * batchBound &&
        (col("offset") < (i + 1) * batchBound || lit(i == 7)))

    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    def f(v: Double) = "%.3f".formatLocal(Locale.ROOT, v)

    var t = System.nanoTime()
    (0L to 1L).foreach(i =>
      graft.streaming.CdcPipeline.processBatch(batch(i), i, cfg))
    val tIngest1 = secs(t)

    t = System.nanoTime()
    val r0 = graft.sinks.ChangefeedReplicator.poll(
      spark, srcTableRoot, dstRoot, sink, Seq("id"))
    val tPollIncr = secs(t)

    // batches 2..6 with maxDeltas=4 fold the source repeatedly; the
    // consumer's checkpoint now predates the compacted base
    t = System.nanoTime()
    (2L to 6L).foreach(i =>
      graft.streaming.CdcPipeline.processBatch(batch(i), i, cfg))
    val tIngest2 = secs(t)

    t = System.nanoTime()
    val r1 = graft.sinks.ChangefeedReplicator.poll(
      spark, srcTableRoot, dstRoot, sink, Seq("id"))
    val tPollSnap = secs(t)

    t = System.nanoTime()
    graft.streaming.CdcPipeline.processBatch(batch(7L), 7L, cfg)
    val r2 = graft.sinks.ChangefeedReplicator.poll(
      spark, srcTableRoot, dstRoot, sink, Seq("id"))
    val tPollResume = secs(t)

    // distributed equivalence: both difference directions must be 0
    t = System.nanoTime()
    val src = graft.sinks.LogMirror.read(spark, srcTableRoot)
    val dst = sink.read(spark, dstRoot)
    val cols = src.columns.toSeq.sorted.map(col)
    val diff = src.select(cols: _*).exceptAll(dst.select(cols: _*)).count() +
      dst.select(cols: _*).exceptAll(src.select(cols: _*)).count()
    val srcRows = src.count()
    val tVerify = secs(t)
    raw.unpersist()

    val ok = diff == 0 && !r0.resnapshot && r1.resnapshot &&
      !r2.resnapshot && r2.applied >= 0 && srcRows > 0
    println(s"""{"metric":"replication_e2e","sf":"$sfDir","ok":$ok,"events":$nEvents,"state_rows":$srcRows,"state_diff":$diff,"poll_incremental":{"applied":${r0.applied},"resnapshot":${r0.resnapshot},"sec":${f(tPollIncr)}},"poll_after_fold":{"applied":${r1.applied},"resnapshot":${r1.resnapshot},"sec":${f(tPollSnap)}},"poll_resume":{"applied":${r2.applied},"resnapshot":${r2.resnapshot},"sec":${f(tPollResume)}},"ingest_sec":${f(tIngest1 + tIngest2)},"verify_sec":${f(tVerify)}}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
