package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Transparent TOP-K-view rewrite (the maintained-leaderboard claim,
  * VERDICT r10 item 6): the `row_number().over(...) <= n` query shape
  * silently reads the maintained per-group leaderboard instead of
  * window-sorting the fact table — and falls through to the real
  * window the moment the source outruns the view. */
class MvTopkRewriteSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  graft.GraftExtensions.register(spark) // installs MvRewriteRule (idempotent)

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  // (custkey, orderkey, price): two groups with 4 and 3 rows
  private val rows = Seq(
    (1L, 101L, 50.0), (1L, 102L, 80.0), (1L, 103L, 80.0), (1L, 104L, 10.0),
    (2L, 201L, 5.0), (2L, 202L, 9.0), (2L, 203L, 7.0))

  private val ordering = Seq(("price", true), ("orderkey", false))

  private def setup(tag: String): (String, String) = {
    val root = Files.createTempDirectory(s"mvt-$tag").toString
    val (src, view) = (s"$root/src", s"$root/view")
    rows.toDF("custkey", "orderkey", "price").write.parquet(src)
    refreshView(src, view)
    (src, view)
  }

  /** (Re)materialize the top-3 leaderboard and (re)register the claim —
    * the stand-in for an IncrementalAggView TopK poll + re-register
    * (the maintenance itself is proven by cdc_topk_view). */
  private def refreshView(src: String, view: String): Unit = {
    val w = Window.partitionBy(col("custkey"))
      .orderBy(col("price").desc, col("orderkey"))
    spark.read.parquet(src)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .write.mode("overwrite").parquet(view)
    MvCatalog.registerTopK(spark, src, Seq("custkey"), ordering, k = 3,
      rankCol = "rank", view = () => spark.read.parquet(view))
  }

  private def topn(src: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col("custkey"))
      .orderBy(col("price").desc, col("orderkey"))
    spark.read.parquet(src)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .select(col("custkey"), col("orderkey"), col("price"), col("rn"))
  }

  private def baseline(n: Int): Set[(Long, Long, Double, Int)] =
    rows.toDF("custkey", "orderkey", "price")
      .withColumn("rn", row_number().over(Window.partitionBy(col("custkey"))
        .orderBy(col("price").desc, col("orderkey"))))
      .filter(col("rn") <= n)
      .as[(Long, Long, Double, Int)].collect().toSet

  override def afterAll(): Unit = {
    MvCatalog.clear()
    super.afterAll()
  }

  test("window_topn_per_group shape silently reads the leaderboard " +
    "view (no base scan, no WindowExec), answers match the real window") {
    val (src, view) = setup("hit")
    val q = topn(src, 3)
    val p = plan(q)
    assert(p.contains(view) && !p.contains(src), p.take(1500))
    assert(!p.contains("Window"), p.take(1500)) // the sort is GONE
    assert(q.as[(Long, Long, Double, Int)].collect().toSet == baseline(3))
  }

  test("a tighter bound (n=2 over a k=3 view) re-applies the rank " +
    "filter over the stored ranks — exact") {
    val (src, view) = setup("tight")
    val q = topn(src, 2)
    assert(plan(q).contains(view) && !plan(q).contains(src))
    assert(q.as[(Long, Long, Double, Int)].collect().toSet == baseline(2))
  }

  test("non-rewritable shapes fall through: bound beyond k, different " +
    "order, rank() instead of row_number, unstored projected column") {
    val (src, view) = setup("miss")
    // n=4 > k=3: the view can't serve rank 4
    assert(!plan(topn(src, 4)).contains(view))
    // ascending price is a DIFFERENT leaderboard
    val wAsc = Window.partitionBy(col("custkey"))
      .orderBy(col("price"), col("orderkey"))
    val asc = spark.read.parquet(src)
      .withColumn("rn", row_number().over(wAsc)).filter(col("rn") <= 2)
    assert(!plan(asc).contains(view))
    // rank() admits ties the bounded leaderboard never stores
    val wDesc = Window.partitionBy(col("custkey"))
      .orderBy(col("price").desc, col("orderkey"))
    val rk = spark.read.parquet(src)
      .withColumn("rn", rank().over(wDesc)).filter(col("rn") <= 2)
    assert(!plan(rk).contains(view))
    // a projected column the view doesn't store
    val extra = spark.read.parquet(src)
      .withColumn("note", col("orderkey") * 2)
      .withColumn("rn", row_number().over(wDesc)).filter(col("rn") <= 2)
      .select(col("custkey"), col("note"), col("rn"))
    assert(!plan(extra).contains(view))
  }

  test("a source write makes the view LAG: fallthrough serves current " +
    "truth, refresh + re-register resumes the rewrite") {
    val (src, view) = setup("lag")
    assert(plan(topn(src, 3)).contains(view))
    // a new leader lands; the leaderboard hasn't folded it
    Seq((2L, 204L, 100.0)).toDF("custkey", "orderkey", "price")
      .write.mode("append").parquet(src)
    val stale = topn(src, 1)
    assert(!plan(stale).contains(view) && plan(stale).contains(src),
      plan(stale).take(1500))
    val leaders = stale.as[(Long, Long, Double, Int)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(leaders(2L) == 204L, leaders.toString) // the NEW leader
    refreshView(src, view)
    val fresh = topn(src, 1)
    assert(plan(fresh).contains(view))
    assert(fresh.as[(Long, Long, Double, Int)].collect()
      .map(r => r._1 -> r._2).toMap.apply(2L) == 204L)
  }
}
