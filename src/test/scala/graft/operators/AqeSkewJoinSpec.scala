package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime skew handling, the AQE half (operators/Skew.scala is the
  * deterministic salting half): a hot join key concentrates one
  * shuffle partition; AQE detects it from runtime map statistics and
  * splits it across tasks (skew=true in the final plan) — no code
  * change, no salt column. At 1000 executors this is what keeps one
  * straggler task from pinning a stage. */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed partition of a shuffle join at runtime") {
    val confs = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // thresholds sized for test data (defaults target 256 MB tasks)
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~90% of fact rows share key 0; payload pads partition bytes
      val fact = spark.range(0, 120000).select(
        when(col("id") % 10 =!= 0, 0L).otherwise(col("id") % 97).as("k"),
        md5(col("id").cast("string")).as("pad"))
      val dim = spark.range(0, 97).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("name"))
      // keep `pad` alive through the join so the hot partition's
      // shuffle bytes reflect real row width (pruned to the key alone
      // it stays under any realistic skew threshold)
      val j = fact.join(dim, "k").groupBy(col("name"))
        .agg(count(lit(1)).as("n"), sum(length(col("pad"))).as("bytes"))
      val rows = j.collect() // execute so AQE re-plans with map stats
      assert(rows.map(_.getLong(1)).sum == 120000L)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p.take(300))
      assert(p.contains("skew=true"),
        "AQE did not mark the skewed join:\n" + p.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
