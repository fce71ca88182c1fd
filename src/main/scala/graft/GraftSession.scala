package graft

import org.apache.spark.sql.SparkSession

/** Engine front door: a SparkSession configured the way every graft
  * component assumes (UTC, AQE on, modest shuffle partitions for local
  * mode; on a real cluster pass `shufflePartitions` ≈ 2-3× total
  * cores). */
object GraftSession {
  def build(master: String = "local[*]",
            appName: String = "graft",
            shufflePartitions: Int = 32): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
