package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VecExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot == fold formulation bitwise on testdata embeddings") {
    val emb = graft.core.Tables.load(spark, sf0001, "embeddings")
    val q = emb.filter($"vec_id" === 1).select($"embedding").head()
      .getSeq[Float](0).map(_.toDouble)
    val qc = array(q.map(lit): _*)
    val mismatches = emb.select(
        SimilarityFunctions.dot($"embedding", qc).as("fast"),
        SimilarityFunctions.dotFold($"embedding", qc).as("fold"))
      .filter($"fast" =!= $"fold")
      .count()
    assert(mismatches == 0)
  }

  test("vec_dot handles float-float, double-double, nulls, empty arrays") {
    val df = Seq(
      (Some(Seq(1f, 2f, 3f)), Some(Seq(4f, 5f, 6f))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float])),
      (None, Some(Seq(1f))),
      (Some(Seq(2f)), None))
      .toDF("a", "b")
    val got = df.select(SimilarityFunctions.dot($"a", $"b").as("d"))
      .as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(32.0), Some(0.0), None, None))
    val dd = Seq((Seq(1.5, 2.0), Seq(2.0, 4.0))).toDF("a", "b")
      .select(SimilarityFunctions.dot($"a", $"b")).as[Double].head()
    assert(dd == 11.0)
  }

  test("vec_cosine == unfused dot/(norm*norm) bitwise on testdata") {
    val emb = graft.core.Tables.load(spark, sf0001, "embeddings")
    val q = emb.filter($"vec_id" === 2).select($"embedding").head()
      .getSeq[Float](0).map(_.toDouble)
    val qc = array(q.map(lit): _*)
    val mismatches = emb.select(
        SimilarityFunctions.cosine($"embedding", qc).as("fused"),
        SimilarityFunctions.cosineUnfused($"embedding", qc).as("unfused"))
      .filter($"fused" =!= $"unfused")
      .count()
    assert(mismatches == 0)
  }

  test("literal-only custom expressions constant-fold at plan time") {
    // a vec_dot of two literal arrays (e.g. a query vector's self-norm)
    // must fold to a Literal in the optimized plan, not re-evaluate per
    // row; same for zorder_key of constants
    val df = spark.range(3).select(
      VecExpressions.vec_dot(
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit(1.0), org.apache.spark.sql.functions.lit(2.0)),
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit(3.0), org.apache.spark.sql.functions.lit(4.0))).as("d"),
      ZOrder.zkey(org.apache.spark.sql.functions.lit(3L),
        org.apache.spark.sql.functions.lit(5L)).as("z"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("vecdot") && !opt.contains("zorderkey"),
      s"literal expressions did not fold:\n$opt")
    assert(opt.contains("11.0") && opt.contains("39"), opt)
  }

  test("vec_dot participates in whole-stage codegen") {
    val emb = graft.core.Tables.load(spark, sf0001, "embeddings")
    val plan = emb.select(
      SimilarityFunctions.dot($"embedding", $"embedding").as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen spans in executedPlan text
    assert(plan.contains("*(1) Project"), s"plan lacks codegen:\n$plan")
  }
}
