package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted equi-join equals plain join on skewed data") {
    // 90% of probe rows share one hot key
    val left = ((1 to 900).map(i => (1L, s"p$i")) ++
      (1 to 100).map(i => (i.toLong + 1, s"q$i"))).toDF("k", "payload")
    val right = (1 to 101).map(i => (i.toLong, s"dim$i")).toDF("k", "dim")
    val plain = left.join(right, Seq("k")).select($"k", $"payload", $"dim")
      .as[(Long, String, String)].collect().toSet
    val salted = Skew.saltedEquiJoin(left, right, "k", saltFactor = 8)
      .select($"k", $"payload", $"dim")
      .as[(Long, String, String)].collect().toSet
    assert(salted == plain)
    assert(salted.count(_._1 == 1L) == 900)
  }

  test("narrow saltBy columns spread the hot key and still equal the " +
    "plain join") {
    val left = ((1 to 900).map(i => (1L, i.toLong, s"p$i")) ++
      (1 to 100).map(i => (i.toLong + 1, i.toLong, s"q$i")))
      .toDF("k", "line", "payload")
    val right = (1 to 101).map(i => (i.toLong, s"dim$i")).toDF("k", "dim")
    val plain = left.join(right, Seq("k")).select($"k", $"payload", $"dim")
      .as[(Long, String, String)].collect().toSet
    val salted = Skew.saltedEquiJoin(left, right, "k", saltFactor = 8,
        saltBy = Seq("line")) // cheap single-column hash, not the whole row
      .select($"k", $"payload", $"dim")
      .as[(Long, String, String)].collect().toSet
    assert(salted == plain)
    // the hot key genuinely spreads: its 900 rows land on several salts
    val saltsUsed = left.filter($"k" === 1L)
      .select(pmod(hash($"line"), lit(8))).distinct().count()
    assert(saltsUsed > 1, s"hot key not spread: $saltsUsed salt(s)")
  }

  test("salted join rejects right-preserving join types (salt-duplication)") {
    val left = Seq((1L, "a")).toDF("k", "payload")
    val right = Seq((2L, "b")).toDF("k", "dim")
    // an unmatched right row would be emitted once per salt replica
    intercept[IllegalArgumentException] {
      Skew.saltedEquiJoin(left, right, "k", saltFactor = 4, joinType = "full_outer")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedEquiJoin(left, right, "k", saltFactor = 4, joinType = "right")
    }
    // left-preserving types stay supported
    val lo = Skew.saltedEquiJoin(left, right, "k", saltFactor = 4, joinType = "left_outer")
    assert(lo.count() == 1)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val df = ((1 to 500).map(_ => ("hot", 2.0)) ++
      (1 to 50).map(i => (s"k$i", i.toDouble))).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("sum_value"), count(lit(1)).as("cnt"))
      .as[(String, Double, Long)].collect().toSet
    val salted = Skew.saltedSumCount(df, "k", "v", saltFactor = 4)
      .as[(String, Double, Long)].collect().toSet
    assert(salted == direct)
  }
}
