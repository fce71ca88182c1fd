package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("selfPairs equals the naive all-pairs answer restricted to shared blocks") {
    val df = Seq("red bolt", "red bolts", "red dolt", "blue bolt",
      "blue boat", "green widget", "green widgets", "red bolt")
      .toDF("name")
    val got = FuzzyJoin
      .selfPairs(df, "name", FuzzyJoin.firstTokenBlock, maxDist = 2)
      .select("name_a", "name_b").as[(String, String)].collect().toSet

    val names = df.select("name").distinct().as[String].collect()
    val naive = (for {
      a <- names; b <- names
      if a < b
      if a.split(" ")(0) == b.split(" ")(0)
      if levenshteinDist(a, b) <= 2
    } yield (a, b)).toSet
    assert(got == naive)
    assert(got.contains(("red bolt", "red bolts")))
    assert(got.contains(("red bolt", "red dolt")))
  }

  test("blocking bounds recall: a pair whose edit hits the block key is not compared") {
    val df = Seq("red bolt", "ted bolt").toDF("name") // dist 1, blocks differ
    val got = FuzzyJoin
      .selfPairs(df, "name", FuzzyJoin.firstTokenBlock, maxDist = 3)
    assert(got.count() == 0)
  }

  test("duplicate rows collapse before comparison (distinct-first)") {
    val df = Seq.fill(1000)("same name").toDF("name")
    assert(FuzzyJoin
      .selfPairs(df, "name", FuzzyJoin.firstTokenBlock, maxDist = 3)
      .count() == 0)
  }

  test("leftMatch keeps unmatched left values with a null right side") {
    val left = Seq("red bolt", "purple gadget").toDF("n")
    val right = Seq("red bolts", "red dolt").toDF("m")
    val got = FuzzyJoin
      .leftMatch(left, "n", right, "m", FuzzyJoin.firstTokenBlock, maxDist = 1)
      .as[(String, Option[String], Option[Int])].collect().toSet
    assert(got == Set(
      ("red bolt", Some("red bolts"), Some(1)),
      ("red bolt", Some("red dolt"), Some(1)),
      ("purple gadget", None, None)))
  }

  test("leftMatch keeps a null right side when the block has only " +
    "too-far candidates") {
    // "red dynamo" shares the block "red" with "red bolt" but sits at
    // dist 5 > 1: the left value must still surface with a null right.
    val left = Seq("red bolt").toDF("n")
    val right = Seq("red dynamo").toDF("m")
    val got = FuzzyJoin
      .leftMatch(left, "n", right, "m", FuzzyJoin.firstTokenBlock, maxDist = 1)
      .as[(String, Option[String], Option[Int])].collect().toSet
    assert(got == Set(("red bolt", None, None)))
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
