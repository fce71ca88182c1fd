package graft.operators

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val trades = Seq(
    (1L, "A", 10L), (2L, "A", 25L), (3L, "A", 5L), (4L, "B", 50L), (5L, "C", 9L))
    .toDF("trade_id", "sym", "t")
  private val quotes = Seq(
    ("A", 8L, 1.0), ("A", 10L, 2.0), ("A", 20L, 3.0), ("B", 60L, 9.9))
    .toDF("sym", "qt", "px")

  private def run() = AsofJoin(trades, quotes,
    leftKey = "sym", rightKey = "sym", leftTime = "t", rightTime = "qt",
    rightPayload = Seq("px"))
    .select($"trade_id", $"px").as[(Long, Option[Double])]
    .collect().toMap

  test("picks newest right row at-or-before left time") {
    val m = run()
    assert(m(1L).contains(2.0)) // t=10 matches quote at exactly 10 (<=)
    assert(m(2L).contains(3.0)) // t=25 -> quote at 20
  }

  test("no quote at-or-before yields null (left join), unknown key yields null") {
    val m = run()
    assert(m(3L).isEmpty) // A's earliest quote (8) is after t=5
    assert(m(4L).isEmpty) // B's only quote is at 60 > 50
    assert(m(5L).isEmpty) // C has no quotes at all
  }

  test("payload columns come from the SAME matched right row, nulls included") {
    // Newest quote at t<=15 is (qt=10) whose venue is NULL: the output
    // must carry (px=2.0, venue=null) — NOT venue backfilled from the
    // older qt=8 row (a combined row that never existed).
    val q = Seq(("A", 8L, Some(1.0), Some("X")), ("A", 10L, Some(2.0), None))
      .toDF("sym", "qt", "px", "venue")
    val t = Seq((1L, "A", 15L)).toDF("trade_id", "sym", "t")
    val out = AsofJoin(t, q, "sym", "sym", "t", "qt", Seq("px", "venue"))
      .select($"trade_id", $"px", $"venue")
      .as[(Long, Option[Double], Option[String])].collect()
    assert(out.toSeq == Seq((1L, Some(2.0), None)))
  }

  test("null right keys/times never match or backfill; null left " +
    "keys/times get a null payload") {
    val q = Seq((Some("A"), Some(5L), 1.0), (None, Some(6L), 7.0),
      (Some("A"), None, 8.0)).toDF("sym", "qt", "px")
    val t = Seq((1L, Some("A"), Some(9L)), (2L, None, Some(9L)),
      (3L, Some("A"), None)).toDF("trade_id", "sym", "t")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val m = AsofJoin(t, q, "sym", "sym", "t", "qt", Seq("px"),
        direction = dir)
        .select($"trade_id", $"px").as[(Long, Option[Double])]
        .collect().toMap
      if (dir != "forward") assert(m(1L).contains(1.0), dir)
      assert(m(2L).isEmpty && m(3L).isEmpty, dir)
    }
  }

  private def runDir(dir: String, tol: Option[Long] = None) =
    AsofJoin(trades, quotes, "sym", "sym", "t", "qt", Seq("px"),
      direction = dir, toleranceSec = tol)
      .select($"trade_id", $"px").as[(Long, Option[Double])]
      .collect().toMap

  test("forward picks earliest right row at-or-after left time") {
    val m = runDir("forward")
    assert(m(1L).contains(2.0)) // t=10 matches quote at exactly 10 (>=)
    assert(m(2L).isEmpty)       // no A quote after 25
    assert(m(3L).contains(1.0)) // t=5 -> quote at 8
    assert(m(4L).contains(9.9)) // t=50 -> quote at 60
  }

  test("nearest picks the closer side and prefers backward on ties") {
    val m = runDir("nearest")
    assert(m(2L).contains(3.0)) // only backward exists (20)
    assert(m(3L).contains(1.0)) // only forward exists (8)
    assert(m(4L).contains(9.9)) // only forward exists (60)
    // t=15 is equidistant from qt=10 and qt=20 -> backward wins
    val tie = Seq((9L, "A", 15L)).toDF("trade_id", "sym", "t")
    val out = AsofJoin(tie, quotes, "sym", "sym", "t", "qt", Seq("px"),
      direction = "nearest")
      .select($"px").as[Option[Double]].collect()
    assert(out.toSeq == Seq(Some(2.0)))
  }

  test("tolerance nulls matches beyond the bound but keeps the row") {
    val back = runDir("backward", tol = Some(3L))
    assert(back(1L).contains(2.0)) // gap 0 <= 3
    assert(back(2L).isEmpty)       // gap 5 > 3 -> dropped
    val near = runDir("nearest", tol = Some(5L))
    assert(near(2L).contains(3.0)) // gap 5 <= 5
    assert(near(3L).contains(1.0)) // forward gap 3 <= 5
    assert(near(4L).isEmpty)       // forward gap 10 > 5
    assert(near.size == 5, "tolerance must not drop left rows")
  }
}
