package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.core.Tables.load(spark, sf0001, "embeddings")
    .select($"vec_id", $"embedding")

  test("codes are m tinyints in [0, ksub)") {
    val cb = PqIndex.build(spark, emb, m = 8, ksub = 16, iterations = 1)
    assert(cb.centroids.length == 8 && cb.centroids.forall(_.length == 16))
    val enc = PqIndex.encode(emb, cb)
    val stats = enc.select(
      min(size($"pq")), max(size($"pq")),
      min(array_min($"pq")), max(array_max($"pq"))).head()
    assert(stats.getInt(0) == 8 && stats.getInt(1) == 8)
    assert(stats.getByte(2) >= 0 && stats.getByte(3) < 16)
  }

  test("an exact duplicate of the query gets the query's codes and rank 1-2") {
    val q0 = emb.filter($"vec_id" === 0).select($"embedding").head()
      .getSeq[Float](0)
    val all = emb.unionByName(Seq((900000L, q0)).toDF("vec_id", "embedding"))
    val cb = PqIndex.build(spark, all, m = 8, ksub = 16, iterations = 2)
    val enc = PqIndex.encode(all, cb)
    val codes = enc.filter($"vec_id".isin(0L, 900000L))
      .select($"pq").collect().map(_.getSeq[Byte](0))
    assert(codes.length == 2 && codes(0) == codes(1),
      s"identical vectors must encode identically: ${codes.toSeq}")
    val top = PqIndex.adcTopK(enc, cb, q0.map(_.toDouble), 2)
      .select($"vec_id").as[Long].collect().toSet
    assert(top == Set(0L, 900000L), s"planted dup not on top: $top")
  }

  test("ADC recall@10 on perturbed near-neighbors beats 0.7") {
    // plant 10 slightly-perturbed copies of vector 0: their true
    // cosine ~0.999 dominates random pairs, so exact top-10 = planted;
    // PQ-ADC over 8-byte codes must recover most of them
    val q0 = emb.filter($"vec_id" === 0).select($"embedding").head()
      .getSeq[Float](0)
    val rnd = new scala.util.Random(11)
    val planted = (1 to 10).map { i =>
      (900000L + i, q0.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
    }.toDF("vec_id", "embedding")
    val all = emb.filter($"vec_id" =!= 0).unionByName(planted)
    val cb = PqIndex.build(spark, all, m = 8, ksub = 16, iterations = 2)
    val enc = PqIndex.encode(all, cb)
    val got = PqIndex.adcTopK(enc, cb, q0.map(_.toDouble), 10)
      .select($"vec_id").as[Long].collect().toSet
    val hits = got.count(_ > 900000L)
    assert(hits >= 7, s"recall@10 = $hits/10 too low: $got")
  }

  test("adcTopK is one scan + TakeOrderedAndProject (no shuffle, no UDF)") {
    val cb = PqIndex.build(spark, emb, m = 8, ksub = 16, iterations = 1)
    val enc = PqIndex.encode(emb, cb)
    val q0 = emb.filter($"vec_id" === 0).select($"embedding").head()
      .getSeq[Float](0).map(_.toDouble)
    val p = PqIndex.adcTopK(enc, cb, q0, 10).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("Exchange hashpartitioning"), p.take(800))
  }
}
