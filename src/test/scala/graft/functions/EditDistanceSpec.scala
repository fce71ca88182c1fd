package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  test("kernel: known vectors pin the UNRESTRICTED variant") {
    // the discriminating case: OSA (restricted) gives 3, true
    // Damerau-Levenshtein gives 2 (transposition then insert between)
    assert(EditDistance.damerau("CA", "ABC") == 2)
    assert(EditDistance.damerau("kitten", "sitting") == 3)
    assert(EditDistance.damerau("ab", "ba") == 1)
    assert(EditDistance.damerau("abc", "acb") == 1)
    assert(EditDistance.damerau("abcdef", "abcfed") == 2)
    assert(EditDistance.damerau("", "") == 0)
    assert(EditDistance.damerau("a", "") == 1)
    assert(EditDistance.damerau("", "abc") == 3)
    assert(EditDistance.damerau("same", "same") == 0)
    assert(EditDistance.damerau("teh", "the") == 1)
  }

  test("kernel properties: symmetric, bounded by Levenshtein, and a " +
    "metric on random-ish inputs") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcde"
    def word(): String =
      (0 until rnd.nextInt(8)).map(_ => alphabet(rnd.nextInt(5))).mkString
    for (_ <- 1 to 500) {
      val (a, b) = (word(), word())
      val d = EditDistance.damerau(a, b)
      assert(d == EditDistance.damerau(b, a))
      assert(d >= math.abs(a.length - b.length))
      assert(d <= math.max(a.length, b.length))
      if (a == b) assert(d == 0) else assert(d > 0)
    }
  }

  test("codegen'd expression == kernel; never exceeds Spark's " +
    "levenshtein over real part names") {
    val pairs = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_name").distinct().limit(40).as[String].collect()
    val df = pairs.flatMap(a => pairs.map(b => (a, b))).toSeq.toDF("a", "b")
      .select($"a", $"b",
        EditDistance.damerauLevenshtein($"a", $"b").as("dl"),
        levenshtein($"a", $"b").as("lev"))
      .collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(r.getInt(2) == EditDistance.damerau(a, b),
        s"codegen/kernel divergence on ($a, $b)")
      assert(r.getInt(2) <= r.getInt(3),
        s"DL must be <= Levenshtein on ($a, $b)")
    }
  }

  test("jaro-winkler kernel: known vectors pin the DuckDB-compatible " +
    "variant (no boost threshold, prefix <= 4, scaling 0.1)") {
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-9
    assert(close(EditDistance.jaroWinkler("martha", "marhta"),
      0.9611111111111111))
    assert(close(EditDistance.jaroWinkler("dixon", "dicksonx"),
      0.8133333333333332))
    // jaro = 0.746 < the classic 0.7 boost threshold is IRRELEVANT
    // here: the bonus applies unconditionally (DuckDB semantics)
    assert(close(EditDistance.jaroWinkler("prefix", "preface"),
      0.8476190476190476))
    assert(EditDistance.jaroWinkler("abc", "abc") == 1.0)
    assert(EditDistance.jaroWinkler("abc", "xyz") == 0.0)
    assert(EditDistance.jaroWinkler("", "") == 1.0)
    assert(EditDistance.jaroWinkler("a", "") == 0.0)
    // window md = 0: adjacent swap finds no matches at length 2
    assert(EditDistance.jaroWinkler("ab", "ba") == 0.0)
    // suffix truncation keeps a high score (the prefix-weighted bias)
    assert(EditDistance.jaroWinkler("cold widget", "cold widg") > 0.93)
  }

  test("jaro-winkler properties: symmetric, in [0,1], 1 iff equal on " +
    "random-ish inputs; codegen'd expression == kernel") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abcde"
    def word(): String =
      (0 until rnd.nextInt(8)).map(_ => alphabet(rnd.nextInt(5))).mkString
    val pairs = (1 to 300).map(_ => (word(), word()))
    pairs.foreach { case (a, b) =>
      val j = EditDistance.jaroWinkler(a, b)
      assert(j == EditDistance.jaroWinkler(b, a), s"asymmetric on ($a,$b)")
      assert(j >= 0.0 && j <= 1.0, s"out of range on ($a,$b): $j")
      if (a == b) assert(j == 1.0)
    }
    val viaExpr = pairs.toDF("a", "b")
      .select($"a", $"b",
        EditDistance.jaroWinklerSim($"a", $"b").as("jw")).collect()
    viaExpr.foreach { r =>
      assert(r.getDouble(2) ==
        EditDistance.jaroWinkler(r.getString(0), r.getString(1)),
        s"codegen/kernel divergence on (${r.getString(0)}, ${r.getString(1)})")
    }
  }

  test("SQL surface: jaro_winkler registered, arity-checked") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS j").head().getDouble(0)
    assert(math.abs(r - 0.9611111111111111) < 1e-9)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT jaro_winkler('a')").collect()
    }
    assert(e.getMessage.contains("jaro_winkler"))
  }

  test("SQL surface: damerau_levenshtein registered, arity-checked") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT damerau_levenshtein('blue anvil', 'bleu anvil') AS d")
      .head().getInt(0)
    assert(r == 1) // one transposition; levenshtein would say 2
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT damerau_levenshtein('a')").collect()
    }
    assert(e.getMessage.contains("damerau_levenshtein"))
  }
}
