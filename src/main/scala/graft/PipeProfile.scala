package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the CDC pipeline batch path (not part of the
  * driver contract): prints per-run wall times so structural changes
  * can be measured in isolation from the full bench. */
object PipeProfile {
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
    val raw = graft.cdc.Fixture.ordersCdcEvents(spark, sfDir)
    println(s"[pipeprofile] events=${raw.count()}")
    (1 to 3).foreach { i =>
      val root = java.nio.file.Files.createTempDirectory("graft-prof").toString
      val cfg = graft.streaming.CdcPipeline.Config(
        graft.cdc.Fixture.rowSchema, Seq("id"),
        s"$root/mirror", s"$root/dlq", s"$root/ckpt")
      val t0 = System.nanoTime()
      graft.streaming.CdcPipeline.processBatch(raw, 0L, cfg)
      println(f"[pipeprofile] run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
