package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    Expectations.Rule("pos", col("v") > 0),
    Expectations.Rule("small", col("v") < 100))

  test("annotate names exactly the failed rules; null predicate = violation") {
    val df = Seq[(Long, java.lang.Double)](
      (1L, 5.0), (2L, -3.0), (3L, 500.0), (4L, null))
      .toDF("id", "v")
    val got = Expectations.annotate(df, rules)
      .select($"id", $"_violations").as[(Long, Seq[String])]
      .collect().toMap
    assert(got(1L) == Seq())
    assert(got(2L) == Seq("pos"))
    assert(got(3L) == Seq("small"))
    assert(got(4L) == Seq("pos", "small"), "null must violate, not pass")
  }

  test("split is a disjoint partition of the input") {
    val df = Seq[(Long, java.lang.Double)](
      (1L, 5.0), (2L, -3.0), (3L, 500.0), (4L, null))
      .toDF("id", "v")
    val (clean, bad) = Expectations.split(df, rules)
    assert(clean.select("id").as[Long].collect().toSet == Set(1L))
    assert(bad.select("id").as[Long].collect().toSet == Set(2L, 3L, 4L))
    assert(clean.columns.toSeq == Seq("id", "v"), "clean side unannotated")
  }

  test("stats computes everything in one scan") {
    val df = graft.core.Tables.load(spark, sf0001, "orders")
    val st = Expectations.stats(df, Seq(
      Expectations.Rule("bounded", col("o_totalprice") < 300000)))
    val p = st.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(600))
    val r = st.head()
    assert(r.getAs[Long]("n_rows") ==
      r.getAs[Long]("n_clean") + r.getAs[Long]("viol_bounded"))
  }
}
