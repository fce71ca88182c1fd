package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic checks for the training-pipeline operators beyond the
  * catalog's rows>0 smoke and the DuckDB hash gate. */
class PipelineQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = QueryCatalog.byName(name).fn(spark, sf0001)

  test("train/test split is deterministic and roughly 80/10/10") {
    val a = q("split_train_test").groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val b = q("split_train_test").groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(a == b, "split must be stable across runs")
    val n = a.values.sum.toDouble
    assert(a("train") / n > 0.7 && a("train") / n < 0.9, s"train frac: $a")
    assert(a.keySet == Set("train", "val", "test"))
  }

  test("split is a partition: every doc appears exactly once") {
    val df = q("split_train_test")
    assert(df.count() == df.select("doc_id").distinct().count())
  }

  test("stratified sample hits per-stratum rates (en ~10%, others ~50%)") {
    val total = graft.core.Tables.load(spark, sf0001, "documents")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = q("sample_stratified_hash")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val enRate = kept.getOrElse("en", 0L).toDouble / total("en")
    assert(enRate > 0.03 && enRate < 0.20, s"en rate $enRate")
    val otherKept = (kept - "en").values.sum.toDouble
    val otherTotal = (total - "en").values.sum.toDouble
    val otherRate = otherKept / otherTotal
    assert(otherRate > 0.38 && otherRate < 0.62, s"other rate $otherRate")
  }

  test("tfidf ranks the rare term 'dup' above ubiquitous terms") {
    val top = q("text_tfidf_topk").select("tok").as[String].collect()
    // 'dup' is planted in ~5% of docs; everything else is in ~75%+ —
    // idf should put dup pairs at the head of the ranking
    assert(top.take(10).count(_ == "dup") >= 8, s"head: ${top.take(10).toSeq}")
  }

  test("bm25 top hits actually contain a query term, scores descend") {
    val hits = q("text_bm25_search").as[(Long, Double)].collect()
    assert(hits.nonEmpty)
    assert(hits.map(_._2).sliding(2).forall(p => p.head >= p.last))
    val ids = hits.map(_._1).toSet
    val withTerm = graft.core.Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .filter(col("text").contains("dup") || col("text").contains("spark") ||
        col("text").contains("join"))
      .count()
    assert(withTerm == ids.size, "every hit must contain a query term")
  }

  test("posting lists cap at 20 ids and df matches the uncapped count") {
    val rows = q("text_posting_lists")
      .select(col("tok"), col("df"), size(split(col("head_ids"), ",")).as("m"))
      .as[(String, Long, Int)].collect()
    assert(rows.forall { case (_, df, m) => m == math.min(df, 20L) },
      "head_ids length must be min(df, 20)")
  }

  test("profiler matches directly-computed stats") {
    val o = graft.core.Tables.load(spark, sf0001, "orders")
    val expN = o.count()
    val expDist = o.select(countDistinct("o_custkey")).as[Long].head()
    val row = q("profile_orders").filter(col("col_name") === "o_custkey")
      .select("n", "n_null", "n_distinct").as[(Long, Long, Long)].head()
    assert(row == ((expN, 0L, expDist)))
  }
}
