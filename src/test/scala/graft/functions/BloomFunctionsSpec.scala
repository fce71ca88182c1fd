package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BloomFunctions._

class BloomFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives; false positives bounded by the sizing") {
    val members = (0 until 2000).map(i => s"member-$i").toDF("v")
    val bits = bloom_build(members, col("v"), 2000L, 16000L)
    val probes = ((0 until 2000).map(i => s"member-$i") ++
      (0 until 2000).map(i => s"absent-$i")).toDF("p")
    val hits = probes.filter(bloom_might_contain(bits, col("p")))
      .select("p").as[String].collect()
    val (present, absent) = hits.partition(_.startsWith("member-"))
    assert(present.length == 2000, "bloom filter dropped a member")
    assert(absent.length < 200, s"fp rate too high: ${absent.length}/2000")
  }

  test("prefilter + exact confirm equals the exact join") {
    val corpus = (0 until 5000).map(i => i.toLong -> s"g${i % 500}")
      .toDF("id", "gram")
    val eval = (0 until 100).map(i => s"g$i").toDF("gram")
    val bits = bloom_build(eval, col("gram"), 100L, 800L)
    val got = corpus.filter(bloom_might_contain(bits, col("gram")))
      .join(eval, Seq("gram"), "left_semi")
      .select("id").as[Long].collect().sorted
    val exact = corpus.join(eval, Seq("gram"), "left_semi")
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(exact))
  }
}
