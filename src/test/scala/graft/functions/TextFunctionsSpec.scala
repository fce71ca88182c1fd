package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("wordShingles: shorter-than-n text yields empty array, not a blowup") {
    val out = Seq("one two", "a b c d").toDF("text")
      .select(size(TextFunctions.wordShingles($"text", 3)).as("n"))
      .as[Int].collect().toSeq
    assert(out == Seq(0, 2))
  }

  test("charNgrams edges") {
    val out = Seq("ab", "abcd").toDF("text")
      .select(TextFunctions.charNgrams($"text", 3).as("g"))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq(), Seq("abc", "bcd")))
  }

  test("stopword ratio and punct ratio on a known string") {
    val row = Seq("the cat sat on the mat!").toDF("text").select(
      TextFunctions.stopwordRatio($"text").as("sr"),
      TextFunctions.punctRatio($"text").as("pr"))
      .as[(Double, Double)].head()
    // stopwords: the, on, the = 3 of 6 tokens
    assert(math.abs(row._1 - 0.5) < 1e-9)
    assert(math.abs(row._2 - 1.0 / 23) < 1e-9) // one '!' over 23 chars
  }

  test("langid picks the language whose markers dominate") {
    val preds = Seq(
      "the cat and the dog of the house with food",
      "el gato y la casa de los perros con comida",
      "der hund und die katze mit das haus")
      .toDF("text")
      .select(TextFunctions.langId($"text").as("l")).as[String].collect().toSeq
    assert(preds == Seq("en", "es", "de"))
  }

  test("langid runs over testdata and emits only known languages") {
    // NOTE: the testdata `lang` labels are uncorrelated with the text
    // (verified: no word has >50% single-language purity), so accuracy
    // against them is not a meaningful target; the synthetic test above
    // checks the heuristic itself.
    val docs = graft.core.Tables.load(spark, sf0001, "documents")
    val langs = docs.select(TextFunctions.langId($"text").as("l"))
      .distinct().as[String].collect().toSet
    assert(langs.nonEmpty && langs.subsetOf(Set("en", "es", "de", "fr", "zh")))
  }

  test("fingerprint is order-insensitive, content-sensitive") {
    val fps = Seq("alpha beta gamma", "gamma alpha beta", "alpha beta delta")
      .toDF("text")
      .select(TextFunctions.bagOfWordsFingerprint($"text").as("f"))
      .as[String].collect().toSeq
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("bpeMerge: greedy left-to-right, non-overlapping, merged symbol " +
    "extendable by a later round") {
    def merge(in: Seq[String], a: String, b: String): Seq[String] =
      Seq(in).toDF("w")
        .select(TextFunctions.bpeMerge($"w", a, b).as("m"))
        .as[Seq[String]].head()
    // plain adjacent pair merges everywhere it occurs
    assert(merge(Seq("a", "b", "c", "a", "b"), "a", "b") ==
      Seq("a b", "c", "a b"))
    // overlap resolves greedily left-to-right: x x x -> [x x, x]
    assert(merge(Seq("x", "x", "x"), "x", "x") == Seq("x x", "x"))
    // four in a row -> two merged pairs
    assert(merge(Seq("x", "x", "x", "x"), "x", "x") == Seq("x x", "x x"))
    // no occurrence -> unchanged
    assert(merge(Seq("a", "c", "b"), "a", "b") == Seq("a", "c", "b"))
    // a later round can extend an earlier round's merged symbol
    val r1 = merge(Seq("new", "york", "city"), "new", "york")
    assert(r1 == Seq("new york", "city"))
    assert(merge(r1, "new york", "city") == Seq("new york city"))
    // singleton and leading-b edge cases
    assert(merge(Seq("b"), "a", "b") == Seq("b"))
    assert(merge(Seq("b", "a", "b"), "a", "b") == Seq("b", "a b"))
  }
}
