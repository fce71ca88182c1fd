package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.{Envelope, Fixture, Materialize}

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val spec = IncrementalAgg.Spec(Seq("g"), Seq("v"))

  private def env(op: String, before: Option[(Long, String, Double)],
                  after: Option[(Long, String, Double)]): String = {
    def img(o: Option[(Long, String, Double)]) = o
      .map { case (id, g, v) => s"""{"id":$id,"g":"$g","v":$v}""" }
      .getOrElse("null")
    s"""{"payload":{"before":${img(before)},"after":${img(after)},"op":"$op","ts_ms":1}}"""
  }

  private def parsed(values: Seq[String]): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    Envelope.parse(values.toDF("value"), schema)
  }

  test("insert, in-group update, cross-group move, delete") {
    val b1 = parsed(Seq(
      env("c", None, Some((1L, "a", 10.0))),
      env("c", None, Some((2L, "a", 20.0))),
      env("c", None, Some((3L, "b", 5.0)))))
    val b2 = parsed(Seq(
      env("u", Some((1L, "a", 10.0)), Some((1L, "a", 15.0))), // in-group
      env("u", Some((3L, "b", 5.0)), Some((3L, "a", 7.0))),   // moves b->a
      env("d", Some((2L, "a", 20.0)), None)))                 // delete
    val state = IncrementalAgg.maintain(Seq(b1, b2), spec).get
      .select("g", "n_rows", "sum_v").as[(String, Long, Double)]
      .collect().map { case (g, n, s) => g -> ((n, s)) }.toMap
    assert(state == Map("a" -> ((2L, 22.0))))
    assert(!state.contains("b"), "emptied group must be dropped")
  }

  test("max maintenance: retracted max triggers recompute, others don't") {
    val mspec = IncrementalAgg.Spec(Seq("g"), Seq("v"), maxCols = Seq("v"))
    val b1 = parsed(Seq(
      env("c", None, Some((1L, "a", 5.0))),
      env("c", None, Some((2L, "a", 9.0))),
      env("c", None, Some((3L, "b", 7.0)))))
    val s1 = IncrementalAgg.merge(
      IncrementalAgg.deltas(b1, mspec).limit(0),
      IncrementalAgg.deltas(b1, mspec), mspec,
      Some(() => sys.error("no retraction in b1 — must not recompute")))
    val m1 = s1.select("g", "max_v").as[(String, Double)].collect().toMap
    assert(m1 == Map("a" -> 9.0, "b" -> 7.0))

    // delete the max of group a: dirty -> recompute from "mirror"
    val b2 = parsed(Seq(env("d", Some((2L, "a", 9.0)), None)))
    val mirror = Seq((1L, "a", 5.0), (3L, "b", 7.0)).toDF("id", "g", "v")
    val s2 = IncrementalAgg.merge(s1, IncrementalAgg.deltas(b2, mspec),
      mspec, Some(() => mirror))
    val m2 = s2.select("g", "max_v").as[(String, Double)].collect().toMap
    assert(m2 == Map("a" -> 5.0, "b" -> 7.0), m2.toString)

    // delete a NON-max row: no recompute needed (mirror thunk must not run)
    val b3 = parsed(Seq(
      env("c", None, Some((4L, "a", 6.0))),
      env("d", Some((1L, "a", 5.0)), None)))
    val s3 = IncrementalAgg.merge(s2, IncrementalAgg.deltas(b3, mspec),
      mspec, Some(() => sys.error("non-max retraction must not recompute")))
    val m3 = s3.select("g", "max_v").as[(String, Double)].collect().toMap
    assert(m3 == Map("a" -> 6.0, "b" -> 7.0), m3.toString)
  }

  test("min maintenance: symmetric dirty test (retracted min recomputes)") {
    val mspec = IncrementalAgg.Spec(Seq("g"), Nil, minCols = Seq("v"))
    val b1 = parsed(Seq(
      env("c", None, Some((1L, "a", 5.0))),
      env("c", None, Some((2L, "a", 9.0)))))
    val s1 = IncrementalAgg.merge(
      IncrementalAgg.deltas(b1, mspec).limit(0),
      IncrementalAgg.deltas(b1, mspec), mspec,
      Some(() => sys.error("no retraction in b1")))
    assert(s1.select("g", "min_v").as[(String, Double)].collect().toMap ==
      Map("a" -> 5.0))
    // delete the min -> recompute; delete of a non-min must not
    val b2 = parsed(Seq(env("d", Some((1L, "a", 5.0)), None)))
    val mirror = Seq((2L, "a", 9.0)).toDF("id", "g", "v")
    val s2 = IncrementalAgg.merge(s1, IncrementalAgg.deltas(b2, mspec),
      mspec, Some(() => mirror))
    assert(s2.select("g", "min_v").as[(String, Double)].collect().toMap ==
      Map("a" -> 9.0))
  }

  test("max maintenance: within-first-batch insert+delete of the max") {
    val mspec = IncrementalAgg.Spec(Seq("g"), Seq("v"), maxCols = Seq("v"))
    val b1 = parsed(Seq(
      env("c", None, Some((1L, "a", 5.0))),
      env("c", None, Some((2L, "a", 9.0))),
      env("d", Some((2L, "a", 9.0)), None)))
    val mirror = Seq((1L, "a", 5.0)).toDF("id", "g", "v")
    val s1 = IncrementalAgg.merge(
      IncrementalAgg.deltas(b1, mspec).limit(0),
      IncrementalAgg.deltas(b1, mspec), mspec, Some(() => mirror))
    val m1 = s1.select("g", "max_v").as[(String, Double)].collect().toMap
    assert(m1 == Map("a" -> 5.0), m1.toString)
  }

  test("max maintenance: >=K+1 equal extremum copies never present NULL") {
    // CandK+1 = 9 copies of the SAME max value: the truncation cut
    // equals the extremum, so a strictly-better-than-cut cap would
    // empty the candidate list and serve NULL despite live rows (and
    // the dirty refill, salting equal values into one shard, would
    // reproduce the empty list every batch). Inclusive top-K keeps a
    // listed copy == lw, whose head IS the correct scalar.
    val mspec = IncrementalAgg.Spec(Seq("g"), Nil, maxCols = Seq("v"))
    val dupN = IncrementalAgg.CandK + 1
    val rows = (1 to dupN).map(i => (i.toLong, "a", 50.0)) :+
      ((100L, "a", 7.0))
    val b1 = parsed(rows.map { case (id, g, v) =>
      env("c", None, Some((id, g, v))) })
    val s1 = IncrementalAgg.merge(
      IncrementalAgg.deltas(b1, mspec).limit(0),
      IncrementalAgg.deltas(b1, mspec), mspec,
      // the insert-side cap alone must not flag dirty
      Some(() => sys.error("pure inserts must not recompute")))
    val m1 = s1.select("g", "max_v").as[(String, Double)].collect().toMap
    assert(m1 == Map("a" -> 50.0), s"expected 50.0, got $m1")

    // retract ONE copy of the duplicated max: >=K copies remain — the
    // listed representative (or a strike no-op at lw) keeps it correct
    val b2 = parsed(Seq(env("d", Some((1L, "a", 50.0)), None)))
    val mirror2 = rows.drop(1).toDF("id", "g", "v")
    val s2 = IncrementalAgg.merge(s1, IncrementalAgg.deltas(b2, mspec),
      mspec, Some(() => mirror2))
    val m2 = s2.select("g", "max_v").as[(String, Double)].collect().toMap
    assert(m2 == Map("a" -> 50.0), s"after one retraction: $m2")

    // retract EVERY remaining copy: must fall to the runner-up via the
    // mirror recompute — and the refill must not reproduce an empty
    // list (the old strict candidateLists filter did exactly that)
    val b3 = parsed((2 to dupN).map(i =>
      env("d", Some((i.toLong, "a", 50.0)), None)))
    val mirror3 = Seq((100L, "a", 7.0)).toDF("id", "g", "v")
    val s3 = IncrementalAgg.merge(s2, IncrementalAgg.deltas(b3, mspec),
      mspec, Some(() => mirror3))
    val m3 = s3.select("g", "max_v").as[(String, Double)].collect().toMap
    assert(m3 == Map("a" -> 7.0), s"after full retraction: $m3")
  }

  test("min maintenance: duplicate-heavy extremum via rebuild stays exact") {
    val mspec = IncrementalAgg.Spec(Seq("g"), Nil, minCols = Seq("v"))
    val dupN = IncrementalAgg.CandK + 3
    val mirror = ((1 to dupN).map(i => (i.toLong, "a", -3.0)) ++
      Seq((200L, "a", 1.0), (201L, "b", 4.0))).toDF("id", "g", "v")
    val st = IncrementalAgg.rebuild(mirror, mspec)
    val m = st.select("g", "min_v").as[(String, Double)].collect().toMap
    assert(m == Map("a" -> -3.0, "b" -> 4.0), m.toString)
    // and folding a retraction of one duplicated-min copy onto the
    // rebuilt state keeps serving the value without a mirror recompute
    val b = parsed(Seq(env("d", Some((1L, "a", -3.0)), None)))
    val s2 = IncrementalAgg.merge(st, IncrementalAgg.deltas(b, mspec),
      mspec, Some(() => sys.error(
        "retraction of one of many equal minima must not recompute")))
    val m2 = s2.select("g", "min_v").as[(String, Double)].collect().toMap
    assert(m2 == Map("a" -> -3.0, "b" -> 4.0), m2.toString)
  }

  test("distinct maintenance: counts values ever written; deletes don't " +
    "retract; replay is idempotent") {
    val dspec = IncrementalAgg.Spec(Seq("g"), Seq("v"), distinctCols = Seq("id"))
    val b1 = parsed(Seq(
      env("c", None, Some((1L, "a", 10.0))),
      env("c", None, Some((2L, "a", 20.0))),
      env("c", None, Some((3L, "b", 5.0)))))
    val b2 = parsed(Seq(
      env("u", Some((1L, "a", 10.0)), Some((1L, "a", 15.0))), // same id again
      env("u", Some((3L, "b", 5.0)), Some((3L, "a", 7.0))),   // moves b -> a
      env("d", Some((2L, "a", 20.0)), None)))                 // no retraction
    def run(batches: Seq[DataFrame]) = IncrementalAgg.withDistinctEstimates(
        IncrementalAgg.maintain(batches, dspec).get, dspec)
      .select("g", "n_rows", "distinct_id").as[(String, Long, Long)]
      .collect().map { case (g, n, dc) => g -> ((n, dc)) }.toMap
    // group a saw ids {1, 2} in b1, {1, 3} in b2 -> 3 ever-written ids
    // alive rows are 2 (id 2 deleted); group b emptied and dropped
    assert(run(Seq(b1, b2)) == Map("a" -> ((2L, 3L))))
    // sketch union is idempotent: re-folding b2 changes nothing
    assert(run(Seq(b1, b2, b2)) == Map("a" -> ((2L, 3L))))
  }

  test("fixture e2e: maintained distinct equals ever-written distinct") {
    val dspec = IncrementalAgg.Spec(Seq("o_orderstatus"), Nil,
      distinctCols = Seq("id"))
    val raw = Fixture.ordersCdcEvents(spark, sf0001)
    val parsedAll = Envelope.parse(raw, Fixture.rowSchema)
    val batches = Seq(1000L, 2000L, 3000L, 4000L, 5000L).map(ts =>
      parsedAll.filter(col("env.payload.ts_ms") === ts))
    val state = IncrementalAgg.withDistinctEstimates(
        IncrementalAgg.maintain(batches, dspec).get, dspec)
      .select("o_orderstatus", "distinct_id").as[(String, Long)]
      .collect().toMap

    val expect = Envelope.wellFormed(parsedAll)
      .filter(col("env.payload.op").isin("c", "r", "u") &&
        col("env.payload.after").isNotNull)
      .select(col("env.payload.after.o_orderstatus").as("g"),
        col("env.payload.after.id").as("id"))
      .groupBy("g").agg(countDistinct("id").as("n"))
      .as[(String, Long)].collect().toMap

    assert(state.keySet == expect.keySet)
    expect.foreach { case (g, n) =>
      assert(math.abs(state(g) - n).toDouble / n <= 0.05,
        s"group $g: estimate ${state(g)} vs exact $n")
    }
  }

  test("group emptied then re-populated") {
    val b1 = parsed(Seq(env("c", None, Some((1L, "x", 3.0)))))
    val b2 = parsed(Seq(env("d", Some((1L, "x", 3.0)), None)))
    val b3 = parsed(Seq(env("c", None, Some((9L, "x", 4.0)))))
    val after2 = IncrementalAgg.maintain(Seq(b1, b2), spec).get
    assert(after2.count() == 0)
    val after3 = IncrementalAgg.maintain(Seq(b1, b2, b3), spec).get
      .select("g", "n_rows", "sum_v").as[(String, Long, Double)].head()
    assert(after3 == (("x", 1L, 4.0)))
  }

  test("tombstones and malformed records contribute nothing") {
    val good = parsed(Seq(env("c", None, Some((1L, "a", 1.0)))))
    val junk = Envelope.parse(
      Seq[Option[String]](None, Some("{not json")).toDF("value"),
      good.select("env.payload.after.*").schema)
    val state = IncrementalAgg.maintain(Seq(good, junk), spec).get
      .select("g", "n_rows", "sum_v").as[(String, Long, Double)].head()
    assert(state == (("a", 1L, 1.0)))
  }

  test("fixture e2e: incremental state equals recompute from the mirror") {
    val ospec = IncrementalAgg.Spec(Seq("o_orderstatus"), Seq("o_totalprice"))
    val raw = Fixture.ordersCdcEvents(spark, sf0001)
    val parsedAll = Envelope.parse(raw, Fixture.rowSchema)
    // the fixture script is 5 ts epochs — replay them as ordered batches
    val batches = Seq(1000L, 2000L, 3000L, 4000L, 5000L).map(ts =>
      parsedAll.filter(col("env.payload.ts_ms") === ts))
    val state = IncrementalAgg.maintain(batches, ospec).get
      .select("o_orderstatus", "n_rows", "sum_o_totalprice")
      .as[(String, Long, Double)].collect()
      .map { case (g, n, s) => g -> ((n, s)) }.toMap

    val mirror = Materialize.currentState(
      Envelope.unwrap(Envelope.wellFormed(parsedAll), Seq("id")), Seq("id"))
    val expect = mirror.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"))
      .as[(String, Long, Double)].collect()
      .map { case (g, n, s) => g -> ((n, s)) }.toMap

    assert(state.keySet == expect.keySet)
    state.foreach { case (g, (n, s)) =>
      assert(n == expect(g)._1, s"count mismatch for $g")
      assert(math.abs(s - expect(g)._2) < 1e-6 * math.max(1.0, math.abs(s)),
        s"sum mismatch for $g: $s vs ${expect(g)._2}")
    }
  }
}
