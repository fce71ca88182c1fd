package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: isolates the streaming-drain phase of [[Bench]] and sweeps
  * the LogMirror compaction cadence (`maxDeltas`), printing one line per
  * (maxDeltas, rep). Exists to ATTRIBUTE the bench's stream numbers
  * rather than guess: the p95 trigger carries the every-Nth-trigger
  * compaction fold by construction, and this makes the
  * cadence-vs-latency tradeoff measurable on this host.
  *
  * Usage: `sbt "runMain graft.StreamSweep [maxDeltas...]"` (default
  * sweep 8 16 32 64; SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as Bench).
  * `runMain graft.StreamSweep views [counts...]` sweeps the number of
  * maintained agg views (default 0 1 2 4) at maxDeltas=32 instead —
  * the VERDICT r8 item-5 serialization question: each view job chains
  * on its table's merge future but runs CONCURRENTLY with sibling
  * views (independent futures on the merge pool), so the sweep
  * measures how much of the per-view cost the overlap absorbs.
  * `runMain graft.StreamSweep snapshot [chunkKeys...]` drains with an
  * ACTIVE signal-driven incremental snapshot (X147) at the given
  * chunk sizes (0 = snapshot off) — what backfilling while streaming
  * costs the drain.
  */
object StreamSweep {

  /** Distinct maintained views over the fixture schema: the deployed
    * mix (status rollup + the reference's MAX(id) integrity probe +
    * min/full variants). Views 2-4 carry extrema, so their batches can
    * trigger dirty-group recomputes — the expensive view path. */
  private def viewCatalog: Seq[(String, graft.streaming.CdcPipeline.AggView)] = Seq(
    "by_status" -> graft.streaming.CdcPipeline.AggView("orders_t0",
      graft.streaming.IncrementalAgg.Spec(Seq("o_orderstatus"), Seq("o_totalprice"))),
    "max_id" -> graft.streaming.CdcPipeline.AggView("orders_t0",
      graft.streaming.IncrementalAgg.Spec(Seq("o_orderstatus"), Nil, maxCols = Seq("id"))),
    "min_id" -> graft.streaming.CdcPipeline.AggView("orders_t0",
      graft.streaming.IncrementalAgg.Spec(Seq("o_orderstatus"), Nil, minCols = Seq("id"))),
    "full" -> graft.streaming.CdcPipeline.AggView("orders_t0",
      graft.streaming.IncrementalAgg.Spec(Seq("o_orderstatus"),
        Seq("o_totalprice"), maxCols = Seq("id"))))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val viewMode = args.headOption.contains("views")
    val snapMode = args.headOption.contains("snapshot")
    val sweep =
      if (viewMode || snapMode)
        (if (args.length > 1) args.tail.map(_.toInt).toSeq
         else if (snapMode) Seq(0, 2000, 8000, 32000)
         else Seq(0, 1, 2, 4))
      else if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(8, 16, 32, 64)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val all = graft.cdc.Fixture.ordersCdcEvents(spark, sfDir)
      .limit(250000).collect().map(r => BenchRec(
        r.getAs[String]("topic"), r.getAs[String]("key"),
        r.getAs[String]("value"), r.getAs[Int]("partition"),
        r.getAs[Long]("offset")))
    val warmupTriggers = 2
    val (latency, rest) = all.splitAt((warmupTriggers + 20) * 3000)

    // snapshot mode: the truth source is the orders table in the
    // fixture's row shape — large enough that the backfill stays
    // active through the whole drain at every swept chunk size
    lazy val snapSource = graft.core.Tables.load(spark, sfDir, "orders")
      .selectExpr("o_orderkey AS id", "o_orderstatus", "o_totalprice")

    for (p <- sweep; rep <- 1 to 2) {
      val root = java.nio.file.Files.createTempDirectory("graft-sweep").toString
      val (md, nViews) =
        if (viewMode) (32, p) else if (snapMode) (32, 0) else (p, 0)
      val chunkKeys = if (snapMode) p else 0
      val cfg = graft.streaming.CdcPipeline.Config(
        graft.cdc.Fixture.rowSchema, Seq("id"),
        s"$root/mirror", s"$root/dlq", s"$root/ckpt", triggerMs = 1L,
        aggViews = viewCatalog.take(nViews).toMap,
        sinkOverride = Some(graft.sinks.LogMirrorSink(maxDeltas = md)),
        signalDir = if (chunkKeys > 0) Some(s"$root/signals") else None,
        snapshotSources =
          if (chunkKeys > 0) Map("orders_t0" -> (() => snapSource))
          else Map.empty,
        snapshotChunkKeys = math.max(chunkKeys, 1))
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[BenchRec]
      val query = graft.streaming.CdcPipeline.start(ms.toDF(), cfg)
      latency.grouped(3000).foreach { chunk =>
        ms.addData(chunk.toSeq)
        query.processAllAvailable()
      }
      val durations = query.recentProgress.toSeq
        .filter(p => p.numInputRows > 0 && p.batchId >= warmupTriggers)
        .map(_.batchDuration).sorted
      def pct(p: Double): Long =
        if (durations.isEmpty) -1L
        else durations(math.min(durations.length - 1,
          (p * durations.length).toInt))
      if (chunkKeys > 0) { // the backfill runs DURING the timed drain
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(s"$root/signals"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$root/signals/sweep.json"),
          ("""{"id":"sweep","type":"execute-snapshot",""" +
            """"data":{"data-collections":["orders_t0"]}}""")
            .getBytes("UTF-8"))
      }
      val t0 = System.nanoTime()
      rest.grouped(10000).foreach(chunk => ms.addData(chunk.toSeq))
      query.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      query.stop()
      val label = if (viewMode) f"views=$nViews%-2d"
        else if (snapMode) f"chunk=$chunkKeys%-6d"
        else f"maxDeltas=$md%-3d"
      println(f"$label rep=$rep drain_eps=${(rest.length / wall).toLong}%-6d " +
        f"p50=${pct(0.5)}%-5d p95=${pct(0.95)}%-5d max=${durations.lastOption.getOrElse(-1L)}")
    }
    spark.stop()
  }
}
