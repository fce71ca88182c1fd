package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Transparent MV rewrite: matching GROUP BYs read the summary table,
  * anything the claim doesn't cover — or a source that changed since
  * the view refresh — falls through to the base scan. */
class MvRewriteSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  graft.GraftExtensions.register(spark) // installs MvRewriteRule (idempotent)

  private def scans(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private val srcRows = Seq(
    ("a", 10L, Some(2L)), ("a", 4L, None), ("b", 7L, Some(5L)),
    ("b", 1L, Some(3L)), ("c", 9L, None))

  private def setup(tag: String): (String, String) = {
    val root = Files.createTempDirectory(s"mv-$tag").toString
    val (src, view) = (s"$root/src", s"$root/view")
    srcRows.toDF("g", "x", "y").write.parquet(src)
    refreshView(src, view)
    (src, view)
  }

  /** (Re)compute the summary and (re)register the claim. */
  private def refreshView(src: String, view: String): Unit = {
    spark.read.parquet(src).groupBy("g")
      .agg(sum("x").as("sum_x"), count(lit(1)).as("n"),
        count(col("y")).as("n_y"), sum("y").as("sum_y"),
        min("x").as("min_x"), max("x").as("max_x"))
      .write.mode("overwrite").parquet(view)
    MvCatalog.register(spark, src, Seq("g"),
      Map(("sum", "x") -> "sum_x", ("count", "*") -> "n",
        ("count", "y") -> "n_y", ("sum", "y") -> "sum_y",
        ("min", "x") -> "min_x", ("max", "x") -> "max_x"),
      () => spark.read.parquet(view))
  }

  override def afterAll(): Unit = {
    MvCatalog.clear()
    super.afterAll()
  }

  test("a covered GROUP BY rewrites to the view scan and returns the " +
    "base table's answer") {
    val (src, view) = setup("hit")
    val q = spark.read.parquet(src).groupBy("g")
      .agg(sum("x").as("s"), count(lit(1)).as("c"), max("x").as("mx"))
    assert(scans(q).contains(view) && !scans(q).contains(src),
      scans(q).take(1500))
    assert(q.as[(String, Long, Long, Long)].collect().toSet ==
      Set(("a", 14L, 2L, 10L), ("b", 8L, 2L, 7L), ("c", 9L, 1L, 9L)))
  }

  test("avg derives from registered sum+count parts; all-NULL groups " +
    "stay NULL like the original") {
    val (src, view) = setup("avg")
    val q = spark.read.parquet(src).groupBy("g")
      .agg(avg(col("y")).as("avg_y"))
    assert(scans(q).contains(view), scans(q).take(1500))
    MvCatalog.unregister(spark, src)
    val expected = spark.read.parquet(src).groupBy("g")
      .agg(avg(col("y")).as("avg_y"))
      .as[(String, Option[Double])].collect().toSet
    refreshView(src, view)
    assert(q.as[(String, Option[Double])].collect().toSet == expected)
    assert(expected.contains(("c", None)), "fixture needs an all-null group")
  }

  test("uncovered aggregates, DISTINCT, filters and extra operators " +
    "all fall through to the base scan") {
    val (src, _) = setup("miss")
    val base = spark.read.parquet(src)
    // avg(x): sum_x registered but count(x) is not → no derivation
    for (q <- Seq(
      base.groupBy("g").agg(avg(col("x"))),
      base.groupBy("g").agg(countDistinct(col("x"))),
      base.filter(col("x") > 2).groupBy("g").agg(sum("x")),
      base.groupBy("g", "y").agg(sum("x")),
      base.groupBy("g").agg(sum(col("x") + 1))))
      assert(scans(q).contains(src), scans(q).take(1500))
  }

  test("a coarser GROUP BY re-aggregates the view: sum of sums, " +
    "count as summed counts, avg from parts, global aggregate") {
    val root = Files.createTempDirectory("mv-rollup").toString
    val (src, view) = (s"$root/src", s"$root/view")
    Seq(("a", "x1", 10L, Some(2L)), ("a", "x2", 4L, None),
      ("b", "x1", 7L, Some(5L)), ("b", "x1", 1L, Some(3L)),
      ("c", "x3", 9L, None))
      .toDF("g", "h", "x", "y").write.parquet(src)
    spark.read.parquet(src).groupBy("g", "h")
      .agg(sum("x").as("sum_x"), count(lit(1)).as("n"),
        sum("y").as("sum_y"), count(col("y")).as("n_y"),
        min("x").as("min_x"), max("x").as("max_x"))
      .write.parquet(view)
    MvCatalog.register(spark, src, Seq("g", "h"),
      Map(("sum", "x") -> "sum_x", ("count", "*") -> "n",
        ("sum", "y") -> "sum_y", ("count", "y") -> "n_y",
        ("min", "x") -> "min_x", ("max", "x") -> "max_x"),
      () => spark.read.parquet(view))

    val byG = spark.read.parquet(src).groupBy("g")
      .agg(sum("x").as("s"), count(lit(1)).as("c"), min("x").as("mn"),
        avg(col("y")).as("ay"))
    assert(scans(byG).contains(view) && !scans(byG).contains(src),
      scans(byG).take(1500))
    assert(byG.as[(String, Long, Long, Long, Option[Double])]
      .collect().toSet ==
      Set(("a", 14L, 2L, 4L, Some(2.0)), ("b", 8L, 2L, 1L, Some(4.0)),
        ("c", 9L, 1L, 9L, None)))

    val global = spark.read.parquet(src)
      .agg(sum("x").as("s"), count(lit(1)).as("c"), max("x").as("mx"))
    assert(scans(global).contains(view), scans(global).take(1500))
    assert(global.as[(Long, Long, Long)].collect().toSet ==
      Set((31L, 5L, 10L)))

    // subset grouping but an uncovered aggregate → whole rewrite off
    val miss = spark.read.parquet(src).groupBy("g")
      .agg(sum("x"), countDistinct(col("h")))
    assert(scans(miss).contains(src), scans(miss).take(1500))

    // a WHERE over group columns commutes with the grouping: it
    // re-applies over the view's group values — exact and rollup grain
    val fExact = spark.read.parquet(src)
      .filter(col("h") === "x1" && col("g") =!= "c")
      .groupBy("g", "h").agg(sum("x").as("s"))
    assert(scans(fExact).contains(view) && !scans(fExact).contains(src),
      scans(fExact).take(1500))
    assert(fExact.as[(String, String, Long)].collect().toSet ==
      Set(("a", "x1", 10L), ("b", "x1", 8L)))
    val fRoll = spark.read.parquet(src).filter(col("h") === "x1")
      .groupBy("g").agg(sum("x").as("s"), count(lit(1)).as("c"))
    assert(scans(fRoll).contains(view), scans(fRoll).take(1500))
    assert(fRoll.as[(String, Long, Long)].collect().toSet ==
      Set(("a", 10L, 1L), ("b", 8L, 2L)))
    // ...but a filter touching an aggregated column cannot
    val fBad = spark.read.parquet(src).filter(col("x") > 2)
      .groupBy("g").agg(sum("x").as("s"))
    assert(scans(fBad).contains(src), scans(fBad).take(1500))
    MvCatalog.unregister(spark, src)
  }

  test("HAVING survives the rewrite: the post-aggregation filter " +
    "resolves against the preserved exprIds") {
    val (src, view) = setup("having")
    val q = spark.read.parquet(src).groupBy("g")
      .agg(sum("x").as("s"), count(lit(1)).as("c"))
      .filter(col("s") > 8) // HAVING sum(x) > 8
    assert(scans(q).contains(view) && !scans(q).contains(src),
      scans(q).take(1500))
    assert(q.as[(String, Long, Long)].collect().toSet ==
      Set(("a", 14L, 2L), ("c", 9L, 1L)))
    MvCatalog.unregister(spark, src)
  }

  test("a source write after the view refresh disables the rewrite " +
    "until re-registration") {
    val (src, view) = setup("stale")
    Seq(("a", 100L, Some(1L))).toDF("g", "x", "y")
      .write.mode("append").parquet(src)
    val q = spark.read.parquet(src).groupBy("g").agg(sum("x").as("s"))
    assert(scans(q).contains(src), "stale view must not serve")
    assert(q.filter(col("g") === "a").as[(String, Long)].collect().toSet ==
      Set(("a", 114L)))
    refreshView(src, view)
    val q2 = spark.read.parquet(src).groupBy("g").agg(sum("x").as("s"))
    assert(scans(q2).contains(view), scans(q2).take(1500))
    assert(q2.filter(col("g") === "a").as[(String, Long)].collect().toSet ==
      Set(("a", 114L)))
  }
}
