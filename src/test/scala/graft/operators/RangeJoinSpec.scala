package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(1L, 5L, 31L, 32L, 63L, 64L, 100L).toDF("p")
  private val intervals = Seq(
    (1L, 0L, 10L),   // catches 1, 5
    (2L, 30L, 33L),  // straddles a bucket boundary at 32
    (3L, 60L, 70L),  // catches 63, 64
    (4L, 200L, 210L) // empty
  ).toDF("k", "lo", "hi")

  test("point-in-interval matches the naive non-equi join") {
    val fast = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 32L)
      .select("p", "k").as[(Long, Long)].collect().sorted.toSeq
    val naive = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
      .select("p", "k").as[(Long, Long)].collect().sorted.toSeq
    assert(fast == naive)
    assert(fast.contains((31L, 2L)) && fast.contains((32L, 2L)),
      "boundary-straddling interval must match points in both buckets")
  }

  test("interval overlap emits each pair exactly once across shared buckets") {
    // [0,100] and [10,90] share buckets 0..3 at width 32 — must emit once
    val a = Seq((1L, 0L, 100L), (2L, 300L, 310L)).toDF("ka", "lo1", "hi1")
    val b = Seq((10L, 10L, 90L), (20L, 95L, 105L), (30L, 400L, 410L))
      .toDF("kb", "lo2", "hi2")
    val got = RangeJoin
      .intervalOverlap(a, "lo1", "hi1", b, "lo2", "hi2", 32L)
      .select("ka", "kb").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 10L), (1L, 20L)))
  }

  test("bucketed plan is an equi-join, not a nested loop") {
    val plan = RangeJoin
      .pointInInterval(points, "p", intervals, "lo", "hi", 32L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
    val naive = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
      .queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoopJoin"),
      "control: the naive join SHOULD be a nested loop")
  }

  test("catalog range queries agree with Spark-side naive joins on sf0.001") {
    val fast = QueryCatalog.byName("join_range_point").fn(spark, sf0001)
    val pts = graft.core.Tables.load(spark, sf0001, "lineitem")
      .filter($"l_orderkey" < 5000)
      .select(datediff(to_date($"l_shipdate"), to_date(lit("1970-01-01")))
        .cast("long").as("d"))
    val iv = graft.core.Tables.load(spark, sf0001, "orders")
      .filter($"o_orderkey" < 5000)
      .select($"o_orderkey",
        datediff(to_date($"o_orderdate"), to_date(lit("1970-01-01")))
          .cast("long").as("lo"))
      .withColumn("hi", $"lo" + $"o_orderkey" % 30)
    val naive = pts.join(iv, $"d" >= $"lo" && $"d" <= $"hi")
      .groupBy("o_orderkey").agg(count(lit(1)).as("n_shipped"))
    assert(fast.as[(Long, Long)].collect().sorted.toSeq ==
      naive.as[(Long, Long)].collect().sorted.toSeq)
  }
}
