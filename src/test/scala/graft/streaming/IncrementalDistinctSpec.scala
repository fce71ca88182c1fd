package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalDistinctSpec extends SparkSpec {
  import spark.implicits._

  private val spec = IncrementalDistinct.Spec(Seq("grp"), "uid")

  private def batch(rows: (String, Long)*) = rows.toDF("grp", "uid")

  private def est(root: String): Map[String, Long] =
    IncrementalDistinct.estimates(spark, root, spec)
      .as[(String, Long)].collect().toMap

  test("incremental folding equals a one-shot union of the same batches") {
    val root = Files.createTempDirectory("hll-inc").toString
    val b1 = batch("a" -> 1L, "a" -> 2L, "b" -> 1L)
    val b2 = batch("a" -> 2L, "a" -> 3L, "b" -> 9L)
    val b3 = batch("b" -> 9L, "c" -> 5L)
    Seq(b1, b2, b3).foreach(IncrementalDistinct.update(spark, root, spec, _))

    // one-shot: per-batch sketches unioned in a single query — register-
    // wise max is associative, so chained folds must match exactly
    val oneShot = Seq(b1, b2, b3)
      .map(IncrementalDistinct.sketch(_, spec))
      .reduce(_ unionByName _)
      .groupBy("grp").agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .as[(String, Long)].collect().toMap
    assert(est(root) == oneShot)
    // small cardinalities: HLL is exact here
    assert(est(root) == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("replaying a batch is a no-op (slot-wise max is idempotent)") {
    val root = Files.createTempDirectory("hll-replay").toString
    val b1 = batch("a" -> 1L, "a" -> 2L)
    val b2 = batch("a" -> 3L, "b" -> 7L)
    IncrementalDistinct.update(spark, root, spec, b1)
    IncrementalDistinct.update(spark, root, spec, b2)
    val before = est(root)
    IncrementalDistinct.update(spark, root, spec, b2) // at-least-once replay
    IncrementalDistinct.update(spark, root, spec, b1) // even out of order
    assert(est(root) == before,
      "sketch union must be idempotent under batch replay")
  }

  test("estimates stay within 5% of exact at a real cardinality") {
    val root = Files.createTempDirectory("hll-acc").toString
    val rows = graft.core.Tables.load(spark, sf0001, "orders")
      .select(col("o_orderpriority").as("grp"), col("o_custkey").as("uid"))
    IncrementalDistinct.update(spark, root, spec, rows)
    val exact = rows.groupBy("grp").agg(countDistinct("uid").as("n"))
      .as[(String, Long)].collect().toMap
    val got = est(root)
    assert(got.keySet == exact.keySet)
    exact.foreach { case (g, n) =>
      assert(math.abs(got(g) - n).toDouble / n <= 0.05,
        s"group $g: estimate ${got(g)} vs exact $n")
    }
  }
}
