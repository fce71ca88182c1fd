package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print every catalog query's flagged long×long product
  * sites (see [[graft.plans.OverflowAudit]]). Discovery loop for the
  * OverflowAuditSpec annotation table. */
object DebugOverflow {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.QueryCatalog.all.foreach { q =>
      try {
        val sites = graft.plans.OverflowAudit.audit(q.fn(spark, sfDir))
        if (sites.nonEmpty) {
          println(s"[overflow] ${q.name}: ${sites.length}")
          sites.foreach(s => println(s"[overflow]   $s"))
        }
      } catch {
        case e: Throwable =>
          println(s"[overflow] ${q.name}: BUILD FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
