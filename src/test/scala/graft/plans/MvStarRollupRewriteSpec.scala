package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Chained star-rollup rewrite (VERDICT r10 item 6): an aggregate over
  * `fact ⋈ dim` composes BOTH maintained-view claims in one optimizer
  * pass — the join subtree rewrites to the row-grain join view, and
  * the aggregate above it then rewrites to the dim-attribute ROLLUP
  * view registered over the join view's directory. The dashboard
  * query reads an O(groups) rollup; neither base table nor the
  * row-grain view is scanned. Lag parity at BOTH levels: a fact write
  * falls all the way through to the real join; a join-view refresh the
  * rollup hasn't folded falls back to aggregating the join view. */
class MvStarRollupRewriteSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  graft.GraftExtensions.register(spark)

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private val factRows = Seq(
    (1L, 10L, 100.0), (2L, 10L, 40.0), (3L, 20L, 7.5),
    (4L, 30L, 12.0), (5L, 20L, 3.25), (6L, 99L, 50.0)) // 99: no dim row
  private val dimRows = Seq(
    (10L, "NATION_A"), (20L, "NATION_A"), (30L, "NATION_B"))

  private def setup(tag: String): (String, String, String, String) = {
    val root = Files.createTempDirectory(s"mvsr-$tag").toString
    val (fact, dim, jview, rollup) =
      (s"$root/fact", s"$root/dim", s"$root/jview", s"$root/rollup")
    factRows.toDF("rowid", "suppkey", "revenue").write.parquet(fact)
    dimRows.toDF("suppkey", "nation").write.parquet(dim)
    refreshJoinView(fact, dim, jview)
    refreshRollup(jview, rollup)
    (fact, dim, jview, rollup)
  }

  // refresh recomputes run under MvCatalog.suspended: a maintenance
  // read must not be rewritten to read the stale view it overwrites
  private def refreshJoinView(fact: String, dim: String,
                              jview: String): Unit = {
    MvCatalog.suspended {
      spark.read.parquet(fact)
        .join(spark.read.parquet(dim), Seq("suppkey"))
        .write.mode("overwrite").parquet(jview)
    }
    MvCatalog.registerJoin(spark, fact, dim, Seq("suppkey"),
      () => spark.read.parquet(jview))
  }

  private def refreshRollup(jview: String, rollup: String): Unit = {
    MvCatalog.suspended {
      spark.read.parquet(jview).groupBy("nation")
        .agg(sum("revenue").as("rev"), count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(rollup)
    }
    MvCatalog.register(spark, jview, Seq("nation"),
      Map((("sum", "revenue"): MvCatalog.AggKey) -> "rev",
        (("count", "*"): MvCatalog.AggKey) -> "n"),
      () => spark.read.parquet(rollup))
  }

  private def q(fact: String, dim: String): DataFrame =
    spark.read.parquet(fact)
      .join(spark.read.parquet(dim), Seq("suppkey"))
      .groupBy("nation").agg(sum("revenue").as("rev"), count(lit(1)).as("n"))

  private def baseline: Set[(String, Double, Long)] =
    factRows.toDF("rowid", "suppkey", "revenue")
      .join(dimRows.toDF("suppkey", "nation"), Seq("suppkey"))
      .groupBy("nation").agg(sum("revenue").as("rev"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet

  override def afterAll(): Unit = {
    MvCatalog.clear()
    super.afterAll()
  }

  test("aggregate-over-join reads the ROLLUP view directly — both " +
    "claims compose in one pass, no base or row-grain scan") {
    val (fact, dim, jview, rollup) = setup("hit")
    val query = q(fact, dim)
    val p = plan(query)
    assert(p.contains(rollup) && !p.contains(fact) && !p.contains(dim),
      p.take(1500))
    assert(!p.contains(jview), p.take(1500)) // not even the join view
    assert(query.as[(String, Double, Long)].collect().toSet == baseline)
  }

  test("rollup lag (join view refreshed, rollup not): the query falls " +
    "back to aggregating the JOIN VIEW — one level down, still no " +
    "base-table scan") {
    val (fact, dim, jview, rollup) = setup("midlag")
    // a join-view refresh changes its file listing; the rollup claim
    // (fingerprinted over the join view dir) goes stale
    refreshJoinView(fact, dim, jview)
    val query = q(fact, dim)
    val p = plan(query)
    assert(p.contains(jview) && !p.contains(rollup) && !p.contains(fact),
      p.take(1500))
    assert(query.as[(String, Double, Long)].collect().toSet == baseline)
    // rollup refresh + re-register restores the full chain
    refreshRollup(jview, rollup)
    assert(plan(q(fact, dim)).contains(rollup))
  }

  test("fact lag: a base write falls the whole chain through to the " +
    "real join, serving current truth") {
    val (fact, dim, jview, rollup) = setup("factlag")
    Seq((7L, 30L, 1000.0)).toDF("rowid", "suppkey", "revenue")
      .write.mode("append").parquet(fact)
    val stale = q(fact, dim)
    val p = plan(stale)
    assert(!p.contains(rollup) && !p.contains(jview) && p.contains(fact),
      p.take(1500))
    val m = stale.as[(String, Double, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(m("NATION_B") == 1012.0, m.toString)
    // refresh both levels -> the chain serves again, new row folded
    refreshJoinView(fact, dim, jview)
    refreshRollup(jview, rollup)
    val fresh = q(fact, dim)
    assert(plan(fresh).contains(rollup))
    assert(fresh.as[(String, Double, Long)].collect()
      .map(r => r._1 -> r._2).toMap.apply("NATION_B") == 1012.0)
  }
}
