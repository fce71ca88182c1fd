package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra-Gries sketch guarantees: bounded candidate set, the
  * superset-of-true-heavies property under arbitrary partitioning
  * (mergeable), and the two-pass exact-confirm identity. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: keys 1..3 get 400 occurrences each, keys 100..599
  // one each → n = 1700; with capacity 15 the guarantee threshold is
  // n/16 ≈ 106, so exactly keys 1..3 are guaranteed candidates.
  private def skewed = {
    val hot = (1 to 3).flatMap(k => Seq.fill(400)(k.toLong))
    val tail = (100 until 600).map(_.toLong)
    // interleave deterministically so hot keys aren't clustered
    val stream = (hot ++ tail).zipWithIndex
      .sortBy { case (k, i) => (i * 2654435761L + k) % 1700 }.map(_._1)
    spark.createDataset(stream).toDF("key")
  }

  private def candidates(df: org.apache.spark.sql.DataFrame, cap: Int): Seq[Long] =
    df.agg(HeavyHitters.heavyHitterCandidates(cap)(col("key")))
      .first().getSeq[Long](0)

  test("candidate set is bounded by capacity and contains every true heavy") {
    for (parts <- Seq(1, 7, 32)) {
      val cand = candidates(skewed.repartition(parts), cap = 15)
      assert(cand.size <= 15, s"parts=$parts: ${cand.size} candidates")
      assert(Seq(1L, 2L, 3L).forall(cand.contains),
        s"parts=$parts: heavies missing from $cand")
    }
  }

  test("merge keeps the bound additive: partitioned run finds the same " +
    "heavies as the single-partition run") {
    val one = candidates(skewed.coalesce(1), cap = 15)
    val many = candidates(skewed.repartition(32), cap = 15)
    // low-frequency survivors may differ; the guaranteed keys may not
    assert(Seq(1L, 2L, 3L).forall(one.contains), one.toString)
    assert(Seq(1L, 2L, 3L).forall(many.contains), many.toString)
  }

  test("two-pass sketch→exact-confirm equals the full exact aggregation") {
    val df = skewed
    val n = df.count()
    val cand = candidates(df.repartition(16), cap = 15)
    val confirmed = df.filter(col("key").isin(cand: _*))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 16 > n)
      .as[(Long, Long)].collect().toMap
    val exact = df.groupBy("key").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 16 > n)
      .as[(Long, Long)].collect().toMap
    assert(confirmed == exact)
    assert(exact.keySet == Set(1L, 2L, 3L))
  }

  test("degenerate capacities: capacity 1 tracks the majority candidate; " +
    "capacity >= domain returns exact counts") {
    val majority = spark.createDataset(
      Seq.fill(60)(7L) ++ (1L to 40L)).toDF("key")
    val c1 = candidates(majority, cap = 1)
    assert(c1 == Seq(7L), c1.toString) // freq 60 > 100/2
    val exactCap = candidates(majority, cap = 100)
    assert(exactCap.size == 40) // every distinct key survives (7 ∈ 1..40)
  }
}
