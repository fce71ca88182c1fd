package graft

import org.apache.spark.sql.SparkSession

/** Warm-session per-query timer (dev loop, not part of the driver
  * contract): times build + execute for the named catalog queries in a
  * WARMED session, so numbers aren't confounded by JVM/codegen spin-up
  * the way a cold first query in Verify was. Each query runs twice;
  * both samples print (first = cold caches/memos, second = warm).
  * `sbt "runMain graft.TimeQ <sfDir> <query> [query...]"` */
object TimeQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.TimeQ <sfDir> <query> [query...]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.drop(1).foreach { q =>
      (1 to 2).foreach { i =>
        var t0 = System.nanoTime()
        val df = graft.operators.QueryCatalog.byName(q).fn(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        val tExec = (System.nanoTime() - t0) / 1e9
        println(f"[timeq] $q run$i build=$tBuild%.2f exec=$tExec%.2f")
      }
    }
    spark.stop()
  }
}
