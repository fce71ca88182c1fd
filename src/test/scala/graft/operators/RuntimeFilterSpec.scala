package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** At 100 TB the cheapest row is the one never shuffled: Spark's
  * runtime bloom-filter injection builds a bloom filter from the
  * selective (dimension) side of a shuffle join and applies it to the
  * fact side BEFORE the exchange, cutting shuffle volume by the join
  * selectivity. This guards that graft's join shapes stay eligible —
  * a refactor that hid the selective filter behind a non-deterministic
  * expression or a repartition would silently lose the pruning. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a runtime bloom filter on the fact side") {
    // thresholds sized for test data: any scan qualifies as the
    // application side; broadcast disabled so the join actually
    // shuffles (at 100 TB the dim side may exceed broadcast too)
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = graft.core.Tables.load(spark, sf0001, "lineitem")
      val part = graft.core.Tables.load(spark, sf0001, "part")
        .filter(col("p_size") === 1)
      val j = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(sum(col("l_quantity")).as("qty"))
      val p = j.queryExecution.executedPlan.toString
      // fact side carries a might_contain(...) probe fed by a
      // bloom_filter_agg over the filtered dim, BEFORE the exchange
      assert(p.contains("might_contain"), p.take(1500))
      assert(p.contains("bloom_filter_agg"), p.take(1500))
      val probeIdx = p.indexOf("might_contain")
      val exchangeIdx = p.indexOf("Exchange hashpartitioning(l_partkey")
      assert(exchangeIdx >= 0 && probeIdx > exchangeIdx,
        "probe must sit below the fact-side exchange (shuffle is reduced)")
    } finally {
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
