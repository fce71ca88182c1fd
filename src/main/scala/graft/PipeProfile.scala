package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the CDC pipeline batch path (not part of the
  * driver contract): prints per-run wall times so structural changes
  * can be measured in isolation from the full bench. */
object PipeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    val spark = (if (sys.env.contains("GRAFT_RAWFS"))
      b.config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
    else b).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val stagesOnly = args.contains("stages") // fast attribution loop
    // persisted: the envelope generator must not run inside the timings
    // (same rationale as Bench — a pipeline's bytes arrive pre-built)
    val raw = graft.cdc.Fixture.ordersCdcEvents(spark, sfDir).persist()
    val nEvents = raw.count()
    println(s"[pipeprofile] events=$nEvents")
    def loadavg() = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).trim
    (1 to (if (stagesOnly) 0 else 3)).foreach { i =>
      val root = java.nio.file.Files.createTempDirectory("graft-prof").toString
      val cfg = graft.streaming.CdcPipeline.Config(
        graft.cdc.Fixture.rowSchema, Seq("id"),
        s"$root/mirror", s"$root/dlq", s"$root/ckpt")
      val t0 = System.nanoTime()
      graft.streaming.CdcPipeline.processBatch(raw, 0L, cfg)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[pipeprofile] run$i $s%.2f s  (${(nEvents / s).toLong}%d ev/s, loadavg ${loadavg()}%s)")
    }
    // Per-stage attribution (VERDICT r8 item 1): profiled runs of the
    // plain and with-views pipelines — stageTimer force-materializes
    // the parse cache so `merge` times merging alone.
    Seq(false, true).foreach { withViews =>
      (1 to 3).foreach { i =>
        val root = java.nio.file.Files.createTempDirectory("graft-profS").toString
        val views =
          if (!withViews) Map.empty[String, graft.streaming.CdcPipeline.AggView]
          else Map("by_status" -> graft.streaming.CdcPipeline.AggView(
            "orders_t0", graft.streaming.IncrementalAgg.Spec(
              Seq("o_orderstatus"), Seq("o_totalprice"))))
        var st: Option[graft.streaming.CdcPipeline.StageTimings] = None
        val cfg = graft.streaming.CdcPipeline.Config(
          graft.cdc.Fixture.rowSchema, Seq("id"),
          s"$root/mirror", s"$root/dlq", s"$root/ckpt", aggViews = views,
          stageTimer = Some(t => st = Some(t)))
        graft.streaming.CdcPipeline.processBatch(raw, 0L, cfg)
        st.foreach(t => println(
          f"[pipeprofile] stages(views=$withViews%b) run$i route=${t.route}%.2f " +
            f"parse=${t.parse}%.2f merge=${t.merge}%.2f views=${t.views}%.2f " +
            f"snap=${t.snapshot}%.2f dlq=${t.dlq}%.2f total=${t.total}%.2f"))
      }
    }

    // Steady-state merge cost: a big mirror absorbing a SMALL batch —
    // the regime where swap-mirror write amplification hurts and the
    // manifest layout's touched-buckets-only rewrite should win. The
    // batch must touch FEW buckets for pruning to bite (hash bucketing
    // spreads any large key set over every bucket): ~20 keys vs 64
    // buckets here; at 100 TB the same ratio is a 20k-event batch vs a
    // 100k-bucket mirror.
    import org.apache.spark.sql.functions._
    if (stagesOnly) { spark.stop(); return }
    def smallBatch = raw.filter(col("offset") < 200) // ids < 20, all ops
    Seq(false, true).foreach { inc =>
      val root = java.nio.file.Files.createTempDirectory("graft-prof2").toString
      val cfg = graft.streaming.CdcPipeline.Config(
        graft.cdc.Fixture.rowSchema, Seq("id"),
        s"$root/mirror", s"$root/dlq", s"$root/ckpt",
        bucketCount = Some(64), incrementalMirror = inc)
      graft.streaming.CdcPipeline.processBatch(raw, 0L, cfg) // build mirror
      val nb = smallBatch.count()
      val t0 = System.nanoTime()
      graft.streaming.CdcPipeline.processBatch(smallBatch, 1L, cfg)
      println(f"[pipeprofile] steady-state merge ($nb%d events, " +
        f"incremental=$inc) ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // and the log-structured sink: write ∝ batch (no base read at all)
    locally {
      val root = java.nio.file.Files.createTempDirectory("graft-prof3").toString
      val cfg = graft.streaming.CdcPipeline.Config(
        graft.cdc.Fixture.rowSchema, Seq("id"),
        s"$root/mirror", s"$root/dlq", s"$root/ckpt",
        sinkOverride = Some(graft.sinks.LogMirrorSink(bucketCount = Some(64))))
      graft.streaming.CdcPipeline.processBatch(raw, 0L, cfg)
      val nb = smallBatch.count()
      val t0 = System.nanoTime()
      graft.streaming.CdcPipeline.processBatch(smallBatch, 1L, cfg)
      println(f"[pipeprofile] steady-state merge ($nb%d events, " +
        f"log-structured) ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
