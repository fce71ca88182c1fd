package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop plan dumper (not part of the driver contract): prints the
  * executed plan of one catalog query so shuffle/scan/codegen shapes
  * can be inspected without spinning a test session.
  * `sbt "runMain graft.DebugPlan <query_name>"` */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.operators.QueryCatalog.byName(args(0))
      .fn(spark, args.lift(1).getOrElse("/root/testdata/sf0.001"))
    if (args.contains("--run")) df.collect()
    val p = df.queryExecution.executedPlan.toString
    println(p)
    spark.stop()
  }
}
