package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** ST5 on an actual stream: watermarked tumbling-window aggregation in
  * append mode, checked against the equivalent batch computation, plus
  * late-data-drop semantics. */
class StreamingAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  case class Ev(ts: Timestamp, event_type: String, value: Double)
  private def ev(minute: Int, t: String, v: Double) =
    Ev(Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), t, v)

  test("windowed streaming agg == batch agg; late rows beyond watermark dropped") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val agg = ms.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
      .select($"window.start".as("ws"), $"event_type", $"n", $"v")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_out")
      .trigger(Trigger.ProcessingTime(10)).start()
    try {
      ms.addData(ev(0, "a", 1), ev(1, "a", 2), ev(6, "b", 10))
      q.processAllAvailable()
      // advance event time far enough to close the first windows
      ms.addData(ev(40, "a", 5))
      q.processAllAvailable()
      // this row is > 10 min behind the watermark -> must be dropped
      ms.addData(ev(2, "a", 100))
      q.processAllAvailable()
      ms.addData(ev(59, "z", 0))
      q.processAllAvailable()
      val got = spark.table("win_out")
        .as[(Timestamp, String, Long, Double)].collect()
        .map { case (ws, t, n, v) => (ws.toString, t, n, v) }.toSet
      assert(got.contains(("2024-01-01 10:00:00.0", "a", 2L, 3.0)),
        s"missing closed window: $got")
      assert(got.contains(("2024-01-01 10:05:00.0", "b", 1L, 10.0)))
      // the late row (value=100) must NOT have re-opened the 10:00 window
      assert(!got.exists { case (_, t, _, v) => t == "a" && v == 103.0 },
        s"late row leaked into closed window: $got")
    } finally q.stop()
  }

  test("watermarked stream-stream join: impressions matched to clicks in-window") {
    implicit val sqlCtx = spark.sqlContext
    case class Imp(impId: Long, impTs: Timestamp)
    case class Clk(clkImpId: Long, clkTs: Timestamp)
    val imps = MemoryStream[(Long, Timestamp)]
    val clks = MemoryStream[(Long, Timestamp)]
    val impDf = imps.toDF().toDF("imp_id", "imp_ts").withWatermark("imp_ts", "20 minutes")
    val clkDf = clks.toDF().toDF("clk_imp_id", "clk_ts").withWatermark("clk_ts", "20 minutes")
    // click must land within 10 minutes after its impression
    val joined = impDf.join(clkDf,
      expr("imp_id = clk_imp_id AND clk_ts >= imp_ts AND clk_ts <= imp_ts + interval 10 minutes"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attributed")
      .trigger(Trigger.ProcessingTime(10)).start()
    try {
      def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")
      imps.addData((1L, ts(0)), (2L, ts(0)), (3L, ts(5)))
      clks.addData((1L, ts(4)))          // in window -> match
      clks.addData((2L, ts(25)))         // 25 min later -> out of window
      clks.addData((3L, ts(8)))          // in window -> match
      q.processAllAvailable()
      val got = spark.table("attributed").select("imp_id")
        .as[Long].collect().toSet
      assert(got == Set(1L, 3L), s"attribution mismatch: $got")
    } finally q.stop()
  }

  test("left-outer stream-stream join: unconverted impressions emit " +
    "null-padded only after the watermark closes their window") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clks = MemoryStream[(Long, Timestamp)]
    val impDf = imps.toDF().toDF("imp_id", "imp_ts").withWatermark("imp_ts", "20 minutes")
    val clkDf = clks.toDF().toDF("clk_imp_id", "clk_ts").withWatermark("clk_ts", "20 minutes")
    // same interval condition as the inner case; leftOuter additionally
    // emits each unmatched impression ONCE, null-padded, as soon as the
    // watermark proves no in-window click can still arrive — the
    // "unconverted impressions" half of attribution, with state for
    // both sides evicted by the same watermark
    val joined = impDf.join(clkDf,
      expr("imp_id = clk_imp_id AND clk_ts >= imp_ts AND clk_ts <= imp_ts + interval 10 minutes"),
      "leftOuter")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attribution_outer")
      .trigger(Trigger.ProcessingTime(10)).start()
    try {
      def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")
      imps.addData((1L, ts(0)), (2L, ts(0)), (3L, ts(5)))
      clks.addData((1L, ts(4))) // only impression 1 converts
      q.processAllAvailable()
      def got = spark.table("attribution_outer")
        .select($"imp_id", $"clk_imp_id".isNotNull.as("matched"))
        .as[(Long, Boolean)].collect().toSet
      // watermark hasn't passed the unmatched windows: no null rows yet
      assert(got == Set((1L, true)),
        s"unmatched rows must wait for the watermark: $got")
      // event time advances far past every window+watermark → the
      // unconverted impressions 2 and 3 emit exactly once, null-padded
      imps.addData((99L, ts(59))); clks.addData((99L, ts(59)))
      q.processAllAvailable()
      assert(got.contains((2L, false)) && got.contains((3L, false)),
        s"unconverted impressions must emit null-padded: $got")
      assert(got.count(_._1 == 2L) == 1 && got.count(_._1 == 3L) == 1)
    } finally q.stop()
  }

  test("streaming session windows merge within the gap and close at the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val agg = ms.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"session_window.start".as("ss"),
        $"session_window.end".as("se"), $"event_type", $"n")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.ProcessingTime(10)).start()
    try {
      // 10:00 and 10:03 fall within one 5-minute gap -> ONE session
      ms.addData(ev(0, "a", 1), ev(3, "a", 1))
      q.processAllAvailable()
      // 10:20 starts a new session AND advances the watermark to 10:10,
      // past the first session's end (10:08) -> it closes and emits
      ms.addData(ev(20, "a", 1))
      q.processAllAvailable()
      ms.addData(ev(59, "z", 0)) // watermark 10:49 closes the 10:20 session
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .as[(Timestamp, Timestamp, String, Long)].collect()
        .map { case (s, e, t, n) => (s.toString, e.toString, t, n) }.toSet
      // merged session: start = first event, end = last event + gap
      assert(got.contains(("2024-01-01 10:00:00.0", "2024-01-01 10:08:00.0", "a", 2L)),
        s"merged session missing/mis-bounded: $got")
      assert(got.contains(("2024-01-01 10:20:00.0", "2024-01-01 10:25:00.0", "a", 1L)),
        s"second session missing: $got")
    } finally q.stop()
  }

  test("ResilientRunner restarts a failing query per policy, then succeeds") {
    implicit val sqlCtx = spark.sqlContext
    var attempts = 0
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val restarts = ResilientRunner.runWithRetries(() => {
      attempts += 1
      val ms = MemoryStream[Ev]
      ms.addData(ev(0, "a", 1))
      val sink = if (attempts < 3) // first two runs fail inside the batch
        (_: org.apache.spark.sql.DataFrame, _: Long) =>
          throw new RuntimeException("injected failure")
      else
        (_: org.apache.spark.sql.DataFrame, _: Long) => ()
      val q = ms.toDF().writeStream.foreachBatch(sink)
        .trigger(Trigger.AvailableNow()).start()
      q
    }, ResilientRunner.Policy(maxRetries = 2, delayMs = 123), slept.append(_))
    assert(restarts == 2)
    assert(attempts == 3)
    assert(slept.toSeq == Seq(123L, 123L))
  }

  test("ResilientRunner exhausts retries and rethrows") {
    implicit val sqlCtx = spark.sqlContext
    val e = intercept[Throwable] {
      ResilientRunner.runWithRetries(() => {
        val ms = MemoryStream[Ev]
        ms.addData(ev(0, "a", 1))
        ms.toDF().writeStream.foreachBatch(
          (_: org.apache.spark.sql.DataFrame, _: Long) =>
            throw new RuntimeException("always fails"))
          .trigger(Trigger.AvailableNow()).start()
      }, ResilientRunner.Policy(maxRetries = 1, delayMs = 1), _ => ())
    }
    assert(e.getMessage == null || e.toString.nonEmpty)
  }

  // Built-in cross-batch EXACT dedup with bounded state — the engine-
  // native sibling of graft's StreamingDedup band index (which covers
  // NEAR-dup): dropDuplicatesWithinWatermark keeps a key's state only
  // until the watermark passes its event time, so duplicates arriving
  // within the tolerance are suppressed ACROSS micro-batches while
  // state stays bounded (the unbounded-state dropDuplicates trap at
  // 100 TB). At-least-once sources (the reference's Kafka redelivery
  // case, ST1) become effectively-once through exactly this shape.
  test("dropDuplicatesWithinWatermark: cross-batch redelivery suppressed, " +
    "state bounded by the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, String)]
    val deduped = ms.toDF().toDF("ts", "id", "v")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("ddww_out")
      .trigger(Trigger.ProcessingTime(10)).start()
    def t(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
    try {
      ms.addData((t(0), 1L, "first"), (t(1), 2L, "b"))
      q.processAllAvailable()
      // same key redelivered in a LATER micro-batch, inside the
      // watermark tolerance -> suppressed (cross-batch state hit)
      ms.addData((t(2), 1L, "dup"))
      q.processAllAvailable()
      // advance the watermark far past key 1's state lifetime...
      ms.addData((t(40), 3L, "c"))
      q.processAllAvailable()
      // ...then the key reappears: state was evicted, row passes — the
      // bounded-state contract (suppression is within-tolerance only)
      ms.addData((t(41), 1L, "reborn"))
      q.processAllAvailable()
      val got = spark.table("ddww_out").as[(Timestamp, Long, String)]
        .collect().map { case (_, id, v) => (id, v) }.toSet
      assert(got == Set((1L, "first"), (2L, "b"), (3L, "c"), (1L, "reborn")),
        s"got $got")
    } finally q.stop()
  }
}
