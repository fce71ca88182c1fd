package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the multi-wave maintenance SIMULATIONS (dev
  * loop, not part of the driver contract): replays cdc_agg_view's five
  * merge+poll waves with per-step wall times, so the fixed per-poll
  * overhead is attributable (merge vs poll vs read). */
object SimProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val all = graft.core.Caching.persistMaterialized(
      graft.cdc.Envelope.unwrap(
        graft.cdc.Envelope.wellFormed(
          graft.cdc.Envelope.parse(
            graft.cdc.Fixture.ordersCdcEvents(spark, sfDir),
            graft.cdc.Fixture.rowSchema)),
        keyCols = Seq("id")))

    // job counter: attributes each step's wall to #jobs × job wall
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

    def t[A](label: String)(f: => A): A = {
      val (j0, m0) = (jobs.get(), jobMs.get())
      val t0 = System.nanoTime()
      val r = f
      println(f"[simprofile] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s" +
        f"  jobs=${jobs.get() - j0}%3d jobMs=${jobMs.get() - m0}%6d")
      r
    }

    (1 to 2).foreach { round =>
      println(s"[simprofile] ---- round $round ----")
      val root = java.nio.file.Files
        .createTempDirectory("graft-simprof").toString
      val (src, view) = (s"$root/src", s"$root/view")
      import graft.sinks.{IncrementalAggView, LogMirror}
      val aggs = Seq(sum(col("o_totalprice")).as("sum_price"),
        count(lit(1)).as("n_rows"), max(col("id")).as("max_id"))
      Seq(1000L, 2000L, 3000L, 4000L, 5000L).zipWithIndex.foreach {
        case (ts, i) =>
          t(s"merge wave$i") {
            LogMirror.merge(spark, src, all.filter(col("ts_ms") === ts),
              Seq("id"), i.toLong, maxDeltas = 3, bucketCount = None)
          }
          t(s"poll wave$i") {
            IncrementalAggView.poll(spark, src, view,
              Seq("o_orderstatus"), aggs)
          }
      }
      t("final read") {
        IncrementalAggView.read(spark, view).queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
