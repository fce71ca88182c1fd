package graft

import org.apache.spark.sql.SparkSession

/** Scratch A/B for the round-12 writer-sizing exchange (X205): runs
  * the full CDC batch pipeline alternating sized (128 MB target) and
  * unsized (`targetFileBytes = 0`, the r11 behavior) swap-layout
  * writes, printing per-run wall seconds and the mirror file count.
  * Alternation inside one JVM cancels box drift — compare medians of
  * the interleaved samples, not run order. Not part of the driver
  * contract. */
object WriteSizeAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val raw = graft.cdc.Fixture.ordersCdcEvents(spark, sfDir).persist()
    println(s"[ab] events=${raw.count()}")

    // GRAFT_AB_POLLUTE: reproduce Bench's session state before
    // measuring — run the headline catalog queries first, pinning
    // their memoized caches, to test whether the pipeRun-vs-clean-JVM
    // gap (3.1 s vs 2.0 s per batch, observed round 12) is session
    // pollution (cache memory pressure / GC) or something else.
    if (sys.env.contains("GRAFT_AB_POLLUTE")) {
      val t0 = System.nanoTime()
      Bench.headline.foreach { n =>
        try SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
        catch { case _: Throwable => () }
      }
      println(f"[ab] polluted: ${Bench.headline.length} queries in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    def run(target: Long): (Double, Int) = {
      val root = java.nio.file.Files.createTempDirectory("graft-ab").toString
      val cfg = graft.streaming.CdcPipeline.Config(
        graft.cdc.Fixture.rowSchema, Seq("id"),
        s"$root/mirror", s"$root/dlq", s"$root/ckpt",
        targetFileBytes = target)
      val t0 = System.nanoTime()
      graft.streaming.CdcPipeline.processBatch(raw, 0L, cfg)
      val sec = (System.nanoTime() - t0) / 1e9
      val files = {
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val it = fs.listFiles(
          new org.apache.hadoop.fs.Path(s"$root/mirror"), true)
        var n = 0
        while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
        n
      }
      (sec, files)
    }

    val samples = (1 to 4).flatMap { i =>
      val sized = run(128L << 20)
      val unsized = run(0L)
      println(f"[ab] round $i sized=${sized._1}%6.2f s (${sized._2} files) " +
        f"unsized=${unsized._1}%6.2f s (${unsized._2} files)")
      Seq(("sized", sized._1), ("unsized", unsized._1))
    }
    def medOf(k: String) = {
      val xs = samples.filter(_._1 == k).map(_._2).sorted
      xs(xs.length / 2)
    }
    println(f"[ab] MEDIAN sized=${medOf("sized")}%6.2f s " +
      f"unsized=${medOf("unsized")}%6.2f s")
    spark.stop()
  }
}
