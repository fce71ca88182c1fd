package graft.operators

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sketch + observation surface (SURVEY §2.3 sketch note): Bloom filter
  * membership, count-min frequency, and zero-cost Observation metrics. */
class SketchesSpec extends SparkSpec {

  test("bloom filter: no false negatives, bounded false positives") {
    val orders = graft.core.Tables.load(spark, sf0001, "orders")
    val bf = orders.stat.bloomFilter("o_orderkey", expectedNumItems = 2000, fpp = 0.03)
    val keys = orders.select("o_orderkey").collect().map(_.getLong(0))
    assert(keys.forall(bf.mightContain), "bloom filter false negative")
    val absent = (1000000L to 1002000L).count(bf.mightContain)
    assert(absent < 200, s"false-positive rate too high: $absent/2000")
  }

  test("count-min sketch: frequency estimates within additive bound") {
    val events = graft.core.Tables.load(spark, sf0001, "events")
    val cms = events.stat.countMinSketch(col("event_type"),
      eps = 0.01, confidence = 0.95, seed = 42)
    val exact = events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    exact.foreach { case (k, cnt) =>
      val est = cms.estimateCount(k)
      assert(est >= cnt, s"CMS underestimated $k")
      assert(est <= cnt + (0.01 * n).toLong + 1, s"CMS overestimate too large for $k")
    }
  }

  test("approxQuantile within declared relative error of exact percentiles") {
    val li = graft.core.Tables.load(spark, sf0001, "lineitem")
    val approx = li.stat.approxQuantile("l_extendedprice",
      Array(0.25, 0.5, 0.75), relativeError = 0.01)
    val exact = li.selectExpr(
      "percentile(l_extendedprice, array(0.25, 0.5, 0.75)) AS p")
      .head().getSeq[Double](0)
    val n = li.count().toDouble
    // rank-space guarantee: |rank(approx) - target_rank| <= eps * n
    approx.zip(Seq(0.25, 0.5, 0.75)).foreach { case (a, q) =>
      val rank = li.filter(col("l_extendedprice") <= a).count().toDouble
      assert(math.abs(rank - q * n) <= 0.01 * n + 1,
        s"quantile $q: approx $a at rank $rank, expected ~${q * n}")
    }
    assert(exact.length == 3)
  }

  test("Observation: pipeline metrics without an extra pass") {
    val obs = Observation("clean-metrics")
    val docs = graft.core.Tables.load(spark, sf0001, "documents")
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(col("n_chars")).as("chars_seen"))
      .filter(col("n_chars") > 200)
    val kept = docs.count()
    val m = obs.get
    assert(m("rows_seen").asInstanceOf[Long] == 500L)
    assert(m("chars_seen").asInstanceOf[Long] > 0L)
    assert(kept < 500)
  }
}
