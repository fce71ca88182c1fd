package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "caf\u00e9"     // U+00E9, one code point
  private val decomposed = "cafe\u0301"  // e + U+0301 combining acute

  test("NFC folds decomposed sequences onto composed forms") {
    assert(composed != decomposed) // different bytes, same rendering
    val got = Seq(composed, decomposed).toDF("s")
      .select(Normalize.nfc($"s").as("n"))
      .as[String].collect().toSeq
    assert(got == Seq(composed, composed))
  }

  test("normalization makes hash-based dedup see through encoding drift") {
    val df = Seq((1L, composed), (2L, decomposed)).toDF("id", "s")
    val rawGroups = df.groupBy(md5($"s")).count().count()
    val nfcGroups = df.groupBy(md5(Normalize.nfc($"s"))).count().count()
    assert(rawGroups == 2, "distinct byte forms must differ un-normalized")
    assert(nfcGroups == 1, "NFC must unify the forms for exact dedup")
  }

  test("idempotent, ASCII-invariant, null-safe, and available in SQL") {
    val df = Seq(Some(decomposed), Some("plain ascii"), None).toDF("s")
    val twice = df.select(Normalize.nfc(Normalize.nfc($"s")).as("a"),
      Normalize.nfc($"s").as("b"))
      .filter(!($"a" <=> $"b")).count()
    assert(twice == 0, "NFC must be idempotent")
    assert(df.select(Normalize.nfc($"s")).collect()(2).isNullAt(0))
    graft.GraftExtensions.register(spark)
    val viaSql = Seq(decomposed).toDF("s").createOrReplaceTempView("nfc_t")
    assert(spark.sql("SELECT nfc_normalize(s) FROM nfc_t")
      .as[String].head() == composed)
  }

  test("stays inside whole-stage codegen (no UDF serialization wall)") {
    // a local Seq plans as LocalTableScan (no codegen stage at all);
    // range() forces a real codegen pipeline, and concat with a
    // non-foldable column keeps the expression from constant-folding
    val df = spark.range(3)
      .select(Normalize.nfc(concat(lit("café "), $"id".cast("string")))
        .as("n"))
    // the `*(n)` star prefix IS the WholeStageCodegen marker in the
    // executed-plan string: a non-codegen expression would split the
    // Project out of the starred stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [normalizenfc"), plan.take(500))
    assert(df.as[String].head() == "caf\u00e9 0") // generated path, not eval
  }
}
