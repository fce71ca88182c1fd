package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the streaming trigger path (dev loop, not part
  * of the driver contract): drives the Bench latency phase — 3000-row
  * synchronized triggers into the log-structured pipeline — and prints
  * per-trigger wall + Spark job count/time, so trigger latency is
  * attributable to job round-trips vs engine overhead. */
object TrigProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          starts.put(j.jobId, j.time); jobs.incrementAndGet(); ()
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(j.jobId))
            .foreach(t0 => jobMs.addAndGet(j.time - t0)); ()
        }
      })

    val raw = graft.cdc.Fixture.ordersCdcEvents(spark, sfDir).persist()
    val all = raw.limit(36000).collect().map(r => BenchRec(
      r.getAs[String]("topic"), r.getAs[String]("key"),
      r.getAs[String]("value"), r.getAs[Int]("partition"),
      r.getAs[Long]("offset")))
    val root = java.nio.file.Files.createTempDirectory("graft-trig").toString
    val cfg = graft.streaming.CdcPipeline.Config(
      graft.cdc.Fixture.rowSchema, Seq("id"),
      s"$root/mirror", s"$root/dlq", s"$root/ckpt", triggerMs = 1L,
      sinkOverride = Some(graft.sinks.LogMirrorSink(maxDeltas = 32)))
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[BenchRec]
      val query = graft.streaming.CdcPipeline.start(ms.toDF(), cfg)
      all.grouped(3000).zipWithIndex.foreach { case (chunk, i) =>
        val (j0, m0) = (jobs.get(), jobMs.get())
        val t0 = System.nanoTime()
        ms.addData(chunk.toSeq)
        query.processAllAvailable()
        println(f"[trigprofile] trigger$i%2d ${(System.nanoTime() - t0) / 1e6}%6.0f ms" +
          f"  jobs=${jobs.get() - j0}%3d jobMs=${jobMs.get() - m0}%6d")
      }
      query.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", savedParts)
    spark.stop()
  }
}
