package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The codegen'd BPE merge kernel: differential equivalence against
  * the declarative `aggregate()` fold, whole-stage-codegen residence,
  * and the SQL registration surface. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("kernel ≡ declarative fold on the real corpus for several pairs") {
    val docs = graft.core.Tables.load(spark, sf0001, "documents")
      .select(split(col("text"), " ").as("w"))
    // the corpus' own most frequent pair plus adversarial self-pairs
    val pairs = Seq(("order", "fast"), ("the", "the"), ("a", "a"),
      ("data", "slow"), ("zzz", "qqq"))
    pairs.foreach { case (a, b) =>
      val mismatches = docs.select(
          TextFunctions.bpeMerge(col("w"), a, b).as("fast"),
          TextFunctions.bpeMergeFold(col("w"), a, b).as("ref"))
        .filter(not(col("fast") <=> col("ref")))
        .count()
      assert(mismatches == 0, s"kernel diverged from fold on pair ($a,$b)")
    }
  }

  test("kernel ≡ fold on adversarial synthetic arrays (runs, overlaps, " +
    "empties, nulls-absent edge shapes)") {
    val rng = new scala.util.Random(7)
    val syms = Array("x", "y", "x y", "z")
    val arrays = (0 until 200).map(_ =>
      Seq.fill(rng.nextInt(12))(syms(rng.nextInt(syms.length)))) ++
      Seq(Seq.empty[String], Seq("x"), Seq("x", "x", "x", "x", "x"))
    val df = arrays.toDF("w")
    Seq(("x", "y"), ("x", "x"), ("x y", "z"), ("y", "x")).foreach {
      case (a, b) =>
        val bad = df.select(
            TextFunctions.bpeMerge(col("w"), a, b).as("fast"),
            TextFunctions.bpeMergeFold(col("w"), a, b).as("ref"))
          .filter(not(col("fast") <=> col("ref"))).count()
        assert(bad == 0, s"pair ($a,$b)")
    }
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(3)
      .select(col("id"), TextFunctions.bpeMerge(
        array(lit("a"), col("id").cast("string"), lit("b")), "a", "0")
        .as("m"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [id") && plan.contains("bpemergepass"),
      plan.take(500))
    assert(df.filter(col("id") === 0).head().getSeq[String](1) == Seq("a 0", "b"))
    assert(df.filter(col("id") === 1).head().getSeq[String](1) == Seq("a", "1", "b"))
  }

  test("SQL surface: bpe_merge registered, arity-checked, literal-only pair") {
    graft.GraftExtensions.register(spark)
    Seq(Seq("new", "york", "city")).toDF("w").createOrReplaceTempView("bpe_in")
    val out = spark.sql(
      "SELECT bpe_merge(bpe_merge(w, 'new', 'york'), 'new york', 'city') AS m " +
        "FROM bpe_in").as[Seq[String]].head()
    assert(out == Seq("new york city"))
    val wrongArity = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bpe_merge(w, 'a') FROM bpe_in").collect()
    }
    assert(wrongArity.getMessage.toLowerCase.contains("bpe_merge"))
    val nonLiteral = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bpe_merge(w, w[0], 'b') FROM bpe_in").collect()
    }
    assert(nonLiteral.getMessage.toLowerCase.contains("foldable"))
    // a foldable NULL is rejected too — String.valueOf(null) would
    // otherwise silently merge ("null", b) pairs
    val nullLiteral = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bpe_merge(w, CAST(NULL AS STRING), 'b') FROM bpe_in")
        .collect()
    }
    assert(nullLiteral.getMessage.toLowerCase.contains("foldable"))
  }
}
