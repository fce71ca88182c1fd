package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Transparent JOIN-view rewrite (the IncrementalJoinView claim): a
  * matching `fact ⋈ dim` inner equi-join subtree silently reads the
  * maintained row-grain join view — so the star-rollup query shape
  * (aggregate over the join) accelerates without text changes — and
  * falls through to the real join the moment either source outruns the
  * view (listing fingerprints, or a registered version check). */
class MvJoinRewriteSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  graft.GraftExtensions.register(spark) // installs MvRewriteRule (idempotent)

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  // a tiny lineitem ⋈ supplier star: revenue rows + a supplier dim
  private val factRows = Seq(
    (1L, 10L, 100.0), (2L, 10L, 40.0), (3L, 20L, 7.5),
    (4L, 30L, 12.0), (5L, 20L, 3.25), (6L, 99L, 50.0)) // 99: no dim row
  private val dimRows = Seq(
    (10L, "NATION_A"), (20L, "NATION_A"), (30L, "NATION_B"))

  private def setup(tag: String): (String, String, String) = {
    val root = Files.createTempDirectory(s"mvj-$tag").toString
    val (fact, dim, view) = (s"$root/fact", s"$root/dim", s"$root/view")
    factRows.toDF("rowid", "suppkey", "revenue").write.parquet(fact)
    dimRows.toDF("suppkey", "nation").write.parquet(dim)
    refreshView(fact, dim, view)
    (fact, dim, view)
  }

  /** (Re)materialize the row-grain join and (re)register the claim —
    * the stand-in for an IncrementalJoinView poll + re-register. */
  private def refreshView(fact: String, dim: String, view: String): Unit = {
    spark.read.parquet(fact)
      .join(spark.read.parquet(dim), Seq("suppkey"))
      .write.mode("overwrite").parquet(view)
    MvCatalog.registerJoin(spark, fact, dim, Seq("suppkey"),
      () => spark.read.parquet(view))
  }

  private def baseline(fact: String, dim: String): Set[(String, Double, Long)] =
    factRows.toDF("rowid", "suppkey", "revenue")
      .join(dimRows.toDF("suppkey", "nation"), Seq("suppkey"))
      .groupBy("nation").agg(sum("revenue").as("rev"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet

  override def afterAll(): Unit = {
    MvCatalog.clear()
    super.afterAll()
  }

  test("aggregate-over-join silently reads the maintained join view " +
    "(both base scans gone), answers match the real join") {
    val (fact, dim, view) = setup("hit")
    val q = spark.read.parquet(fact)
      .join(spark.read.parquet(dim), Seq("suppkey"))
      .groupBy("nation").agg(sum("revenue").as("rev"), count(lit(1)).as("n"))
    val p = plan(q)
    assert(p.contains(view) && !p.contains(fact) && !p.contains(dim),
      p.take(1500))
    assert(q.as[(String, Double, Long)].collect().toSet == baseline(fact, dim))
    // the inner join dropped the unmatched fact row in both worlds
    assert(q.agg(sum("n")).head().getLong(0) == 5L)
  }

  test("row-grain consumers rewrite too (any shape above the join), " +
    "and single-side filters re-apply over the view") {
    val (fact, dim, view) = setup("filter")
    val q = spark.read.parquet(fact)
      .join(spark.read.parquet(dim), Seq("suppkey"))
      .filter(col("revenue") > 5.0 && col("nation") === "NATION_A")
      .select(col("rowid"), col("nation"))
    val p = plan(q)
    assert(p.contains(view) && !p.contains(fact), p.take(1500))
    assert(q.as[(Long, String)].collect().toSet ==
      Set((1L, "NATION_A"), (2L, "NATION_A"), (3L, "NATION_A")))
  }

  test("non-rewritable shapes fall through: extra join condition, " +
    "left join, unregistered key set") {
    val (fact, dim, view) = setup("miss")
    val f = spark.read.parquet(fact)
    val d = spark.read.parquet(dim)
    val extra = f.join(d, f("suppkey") === d("suppkey") &&
      f("revenue") > d("suppkey"), "inner")
    assert(!plan(extra).contains(view), plan(extra).take(1200))
    val left = f.join(d, Seq("suppkey"), "left")
    assert(!plan(left).contains(view), plan(left).take(1200))
    val wrongKey = f.join(d.withColumnRenamed("suppkey", "rowid"), Seq("rowid"))
    assert(!plan(wrongKey).contains(view), plan(wrongKey).take(1200))
  }

  test("a source write makes the view LAG: the query falls through to " +
    "the real join until the view refreshes and re-registers") {
    val (fact, dim, view) = setup("lag")
    def q() = spark.read.parquet(fact)
      .join(spark.read.parquet(dim), Seq("suppkey"))
      .groupBy("nation").agg(sum("revenue").as("rev"))
    assert(plan(q()).contains(view))
    // new fact rows land; the view hasn't folded them
    Seq((7L, 30L, 1000.0)).toDF("rowid", "suppkey", "revenue")
      .write.mode("append").parquet(fact)
    val stale = q()
    assert(!plan(stale).contains(view) && plan(stale).contains(fact),
      plan(stale).take(1500))
    // the fallthrough serves the CURRENT truth, not the stale view
    val m = stale.as[(String, Double)].collect().toMap
    assert(m("NATION_B") == 1012.0, m.toString)
    // refresh + re-register -> rewrites resume with the new row folded
    refreshView(fact, dim, view)
    val back = q()
    assert(plan(back).contains(view), plan(back).take(1200))
    assert(back.as[(String, Double)].collect().toMap
      .get("NATION_B").contains(1012.0))
  }

  test("version-based freshness (the maintained-chain wiring): the " +
    "claim serves while versions agree and falls through when the " +
    "source version moves past the view's checkpoint") {
    val (fact, dim, view) = setup("ver")
    // the maintained discipline: the view records the source version it
    // covers; freshness compares it to the source's CURRENT version
    // (IncrementalJoinView's checkpoint vs LogMirror.currentVersion)
    var sourceVersion = 3L
    var viewCoversVersion = 3L
    MvCatalog.registerJoin(spark, fact, dim, Seq("suppkey"),
      () => spark.read.parquet(view),
      freshCheck = Some(_ => viewCoversVersion == sourceVersion))
    def q() = spark.read.parquet(fact)
      .join(spark.read.parquet(dim), Seq("suppkey"))
      .groupBy("nation").agg(count(lit(1)).as("n"))
    assert(plan(q()).contains(view))
    sourceVersion = 4L // a merge committed; the view hasn't polled
    assert(!plan(q()).contains(view) && plan(q()).contains(fact))
    viewCoversVersion = 4L // the view's poll caught up
    assert(plan(q()).contains(view))
  }
}
