package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Reconcile

/** KMV sketch contract: the sketch is a pure function of the distinct
  * key SET — invariant under partitioning, arrival order, and
  * duplication — and the k-th minimum yields the (k-1)/θ estimate. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16

  private def sketchOf(keys: Seq[Long], parts: Int): Seq[Row] = {
    val df = spark.createDataset(keys).toDF("key")
      .repartition(parts)
      .select(Reconcile.rowFingerprint(col("key")).as("h"), col("key"))
    df.agg(KmvSketch.kmv(K)(col("h"), col("key")).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.h"), col("e.key"))
      .collect().toSeq
  }

  test("sketch is invariant under partitioning, order, and duplicates") {
    val keys: Seq[Long] = (1L to 500L).toSeq
    val base = sketchOf(keys, 1)
    assert(base.size == K)
    assert(sketchOf(scala.util.Random.shuffle(keys), 7) == base,
      "reordering changed the sketch")
    assert(sketchOf(keys ++ keys ++ keys.take(50), 32) == base,
      "duplicate keys changed the sketch")
  }

  test("a re-observed key never occupies two slots") {
    val sk = sketchOf(Seq.fill(1000)(42L) ++ (1L to 10L), 8)
    assert(sk.map(_.getLong(1)).distinct.size == sk.size)
    assert(sk.size == 11, s"expected 11 distinct keys, got ${sk.size}")
  }

  test("small sets return the whole key set (exact branch)") {
    val sk = sketchOf(Seq(5L, 6L, 7L), 4)
    assert(sk.map(_.getLong(1)).sorted == Seq(5L, 6L, 7L))
  }

  test("sketch holds the k globally-smallest hashes, sorted ascending") {
    val df = spark.createDataset(1L to 500L).toDF("key")
      .select(Reconcile.rowFingerprint(col("key")).as("h"), col("key"))
    val expected = df.orderBy(col("h"), col("key")).limit(K)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = sketchOf(1L to 500L, 13).map(r => (r.getLong(0), r.getLong(1)))
    assert(got == expected)
  }

  test("estimate from the k-th minimum lands within 3x of truth at k=16") {
    val n = 5000L
    val sk = sketchOf(1L to n, 17)
    val hk = sk.last.getLong(0)
    val est = (K - 1) * 4294967296.0 / hk
    assert(est > n / 3.0 && est < n * 3.0, s"est=$est for n=$n")
  }
}
