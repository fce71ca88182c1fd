package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.StatefulOps.{KeyedChange, Transition}

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  test("changesOnly emits transitions, suppresses replays and stale events") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedChange]
    val q = StatefulOps.changesOnly(ms.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("transitions")
      .trigger(Trigger.ProcessingTime(10)).start()
    try {
      def emitted(): Seq[(Long, String, String)] = spark.table("transitions")
        .as[Transition].collect().map(t => (t.id, t.kind, t.payload)).toSeq

      ms.addData(KeyedChange(1, "c", 100, 0, "a"))
      q.processAllAvailable()
      assert(emitted() == Seq((1L, "insert", "a")))

      // replay of the same change: no output
      ms.addData(KeyedChange(1, "c", 100, 0, "a"))
      q.processAllAvailable()
      assert(emitted() == Seq((1L, "insert", "a")))

      // genuine update + new key
      ms.addData(KeyedChange(1, "u", 200, 1, "b"), KeyedChange(2, "c", 200, 2, "x"))
      q.processAllAvailable()
      assert(emitted().toSet ==
        Set((1L, "insert", "a"), (1L, "update", "b"), (2L, "insert", "x")))

      // stale out-of-order event: suppressed
      ms.addData(KeyedChange(1, "u", 150, 0, "stale"))
      q.processAllAvailable()
      assert(emitted().count(_._1 == 1L) == 2)

      // delete then delete again: one transition
      ms.addData(KeyedChange(1, "d", 300, 3, ""))
      q.processAllAvailable()
      ms.addData(KeyedChange(1, "d", 400, 4, ""))
      q.processAllAvailable()
      assert(emitted().filter(_._1 == 1L).map(_._2) ==
        Seq("insert", "update", "delete"))
    } finally q.stop()
  }

  test("firstSeenOnly (transformWithState): cross-batch exact dedup by fingerprint") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.FingerprintedDoc
    // transformWithState is backed by the RocksDB state store;
    // changelog checkpointing avoids a full RocksDB snapshot zip per
    // batch per partition (observed minutes per micro-batch without it)
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    val ms = MemoryStream[FingerprintedDoc]
    val q = StatefulOps.firstSeenOnly(ms.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("first_seen")
      .trigger(Trigger.ProcessingTime(10)).start()
    try {
      def ids(): Set[Long] = spark.table("first_seen")
        .as[FingerprintedDoc].collect().map(_.doc_id).toSet

      // batch 1: two distinct docs + a within-batch duplicate of fp "a"
      ms.addData(FingerprintedDoc("a", 1, "t1"), FingerprintedDoc("b", 2, "t2"),
        FingerprintedDoc("a", 3, "t1"))
      q.processAllAvailable()
      assert(ids() == Set(1L, 2L))

      // batch 2: cross-batch duplicate suppressed, new fp admitted
      ms.addData(FingerprintedDoc("a", 4, "t1"), FingerprintedDoc("c", 5, "t3"))
      q.processAllAvailable()
      assert(ids() == Set(1L, 2L, 5L))
    } finally {
      q.stop()
      prior match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming dropDuplicatesWithinWatermark dedups replayed events") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, Long)]
    val q = ms.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("deduped")
      .trigger(Trigger.ProcessingTime(10)).start()
    try {
      val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      ms.addData((t, 1L), (t, 1L), (t, 2L))
      q.processAllAvailable()
      ms.addData((t, 2L), (t, 3L)) // 2 is a replay within the watermark
      q.processAllAvailable()
      assert(spark.table("deduped").count() == 3)
    } finally q.stop()
  }

  test("streaming priority sample over shuffled arrivals == the batch " +
    "priority sample over the same rows; state bounded at k per stratum") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.streaming.StatefulOps.WeightedItem
    val k = 16
    // the batch query's sample is the ground truth for the same corpus
    val batch = graft.operators.QueryCatalog.byName("pipeline_priority_sample")
      .fn(spark, sf0001)
      .select($"lang", $"doc_id").as[(String, Long)].collect().toSet
    // identical priorities, computed once and dealt out in a seeded
    // SHUFFLED order across four micro-batches (plus a replayed row)
    val u = (conv(substring(md5(concat($"doc_id".cast("string"),
      lit(":prio"))), 1, 8), 16, 10).cast("double") + 1) / lit(4294967296.0)
    val items = graft.core.Tables.load(spark, sf0001, "documents")
      .select($"lang".as("stratum"), $"doc_id".as("id"),
        $"n_chars".as("weight"),
        ($"n_chars".cast("double") / u).as("priority"))
      .as[WeightedItem].collect().toSeq
    val shuffled = new scala.util.Random(11).shuffle(items)
    val ms = MemoryStream[WeightedItem]
    val q = StatefulOps.prioritySample(ms.toDS(), k)
      .toDF("stratum", "sample")
      .writeStream.outputMode("update")
      .format("memory").queryName("prio_sample")
      .trigger(Trigger.ProcessingTime(10)).start()
    try {
      shuffled.grouped((shuffled.size / 4).max(1)).foreach { chunk =>
        ms.addData(chunk: _*)
        q.processAllAvailable()
      }
      ms.addData(shuffled.head) // exact redelivery: must be a no-op
      q.processAllAvailable()
      // the LAST emitted row per stratum is its current sample
      val fin = spark.table("prio_sample")
        .withColumn("seq", monotonically_increasing_id())
        .orderBy($"seq".desc).dropDuplicates("stratum")
      val got = fin.select($"stratum", explode($"sample.items").as("it"))
        .select($"stratum", $"it.id").as[(String, Long)].collect().toSet
      assert(got == batch,
        s"stream sample diverged: missing=${(batch -- got).take(5)} " +
          s"extra=${(got -- batch).take(5)}")
      // bounded state: no stratum ever exceeds k items
      val sizes = fin.select(size($"sample.items")).as[Int].collect()
      assert(sizes.forall(_ <= k) && sizes.exists(_ == k))
    } finally q.stop()
  }

  test("streaming CUSUM (transformWithState) == the sequential reference " +
    "fold; replays and stale buckets are idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{CusumPoint, MetricPoint}
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    // 'a' drifts upward after seq 4 (must alarm); 'b' stays in control
    val xs = Map(
      "a" -> Vector(5L, 4L, 6L, 5L, 5L, 9L, 10L, 11L, 12L, 12L),
      "b" -> Vector(5L, 6L, 4L, 5L, 5L, 6L, 4L, 5L, 6L, 5L))
    val (mu2, slack2, h2) = (10L, 1L, 10L)
    def reference(key: String): Vector[CusumPoint] =
      xs(key).zipWithIndex.scanLeft(CusumPoint(key, -1L, 0L, alarm = false)) {
        case (prev, (x, i)) =>
          val s2 = math.max(0L, prev.s2 + 2 * x - mu2 - slack2)
          CusumPoint(key, i.toLong, s2, s2 > h2)
      }.drop(1)

    val points = for ((key, v) <- xs.toSeq; (x, i) <- v.zipWithIndex)
      yield MetricPoint(key, i.toLong, x)
    val ms = MemoryStream[MetricPoint]
    val q = StatefulOps.cusum(ms.toDS(), mu2, slack2, h2)
      .writeStream.outputMode("append")
      .format("memory").queryName("cusum_out")
      .trigger(Trigger.ProcessingTime(10)).start()
    try {
      def got(): Seq[CusumPoint] =
        spark.table("cusum_out").as[CusumPoint].collect().toSeq
      // three uneven micro-batches, keys interleaved — the fold must
      // not depend on batch-boundary placement
      val (b1, rest) = points.splitAt(7)
      val (b2, b3) = rest.splitAt(6)
      Seq(b1, b2, b3).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      val expected = (reference("a") ++ reference("b")).toSet
      assert(got().toSet == expected)
      assert(got().size == 20) // append mode, no duplicates
      assert(got().exists(p => p.key == "a" && p.alarm))
      assert(!got().exists(p => p.key == "b" && p.alarm))
      // replay of a whole earlier micro-batch: ignored
      ms.addData(b2: _*); q.processAllAvailable()
      assert(got().size == 20)
      // stale out-of-order bucket with a wild value: ignored
      ms.addData(MetricPoint("a", 3L, 100L)); q.processAllAvailable()
      assert(got().toSet == expected)
    } finally q.stop()
  }

  test("throttleAlerts: one page per key per gap with suppressed " +
    "counts; replays can't double-page") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{AlertTick, ThrottledAlert}
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    val ms = MemoryStream[AlertTick]
    val q = StatefulOps.throttleAlerts(ms.toDS(), minGap = 10L)
      .writeStream.outputMode("append")
      .format("memory").queryName("throttled")
      .trigger(Trigger.ProcessingTime(10)).start()
    try {
      def got(): Seq[(String, Long, Long)] = spark.table("throttled")
        .as[ThrottledAlert].collect()
        .map(t => (t.key, t.seq, t.suppressed)).toSeq

      // burst within one gap: first tick pages, rest are swallowed
      ms.addData(AlertTick("db", 0), AlertTick("db", 3), AlertTick("db", 7))
      q.processAllAvailable()
      assert(got() == Seq(("db", 0L, 0L)))
      // next batch: a stale tick (2) is ignored, 9 is swallowed, 12
      // crosses the gap and pages with the 3 swallowed ticks (3, 7, 9)
      ms.addData(AlertTick("db", 9), AlertTick("db", 12), AlertTick("db", 2),
        AlertTick("kafka", 5))
      q.processAllAvailable()
      assert(got().toSet == Set(("db", 0L, 0L), ("db", 12L, 3L),
        ("kafka", 5L, 0L)))
      // replay of already-seen ticks: no output, no count drift
      ms.addData(AlertTick("db", 12), AlertTick("db", 3))
      q.processAllAvailable()
      assert(got().size == 3)
      // quiet period then a single new alert: pages with count 0
      ms.addData(AlertTick("db", 40))
      q.processAllAvailable()
      assert(got().toSet.contains(("db", 40L, 0L)))
    } finally q.stop()
  }

  test("streaming OHLC bars (transformWithState) == the batch catalog " +
    "bars over the real events table; replays change nothing") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{Bar, Tick}
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    // the IDENTICAL projection the batch catalog query runs, delivered
    // per-key in ord order (the operator's documented contract)
    val ticks = graft.core.Tables.load(spark, sf0001, "events")
      .selectExpr(
        "concat(event_type, ':', cast(to_date(ts) as string)) AS key",
        "(unix_micros(ts) % 86400000000) * 67108864" +
          " + pmod(event_id, 67108864) AS ord",
        "cast(round(value * 100) as long) AS c")
      .as[Tick].collect().sortBy(t => (t.key, t.ord)).toSeq
    val ms = MemoryStream[Tick]
    val q = StatefulOps.ohlcBars(ms.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("bars")
      .trigger(Trigger.ProcessingTime(10)).start()
    try {
      def got(): Seq[Bar] = spark.table("bars").as[Bar].collect().toSeq
      // four uneven micro-batches
      val batches = Seq(ticks.take(500), ticks.slice(500, 2700),
        ticks.slice(2700, 2800), ticks.drop(2800))
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      // the newest emission per key (max tick count) IS the final bar
      val finalBars = got().groupBy(_.key).values
        .map(_.maxBy(_.n_ticks)).toSet
      val expected = graft.operators.QueryCatalog
        .byName("events_ohlc_bars").fn(spark, sf0001)
        .selectExpr("concat(event_type, ':', cast(day as string)) AS key",
          "open_c", "high_c", "low_c", "close_c", "n_ticks", "vol_c")
        .as[Bar].collect().toSet
      assert(expected.nonEmpty)
      assert(finalBars == expected)
      // whole-micro-batch replay: idempotent, not even a re-emission
      val before = got().size
      ms.addData(batches(1): _*); q.processAllAvailable()
      assert(got().size == before)
    } finally q.stop()
  }

  test("streaming MATCH_RECOGNIZE (V-pattern) == the batch catalog " +
    "query over the real events table once tails are closed; " +
    "micro-batch replays change nothing") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{Obs, VMatch}
    // per-user (ts, event_id) order packed into one long: micros are
    // rebased so the packing stays < 2^63
    val base = graft.core.Tables.load(spark, sf0001, "events")
      .selectExpr("min(unix_micros(ts))").head().getLong(0)
    val obs = graft.core.Tables.load(spark, sf0001, "events")
      .filter("value IS NOT NULL")
      .selectExpr("cast(user_id as string) AS key",
        s"(unix_micros(ts) - ${base}L) * 1048576" +
          " + pmod(event_id, 1048576) AS ord",
        "value AS v")
      .as[Obs].collect().sortBy(o => (o.key, o.ord)).toSeq
    val ms = MemoryStream[Obs]
    val q = StatefulOps.matchVPattern(ms.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("vmatches")
      .trigger(Trigger.ProcessingTime(10)).start()
    try {
      def got(): Seq[VMatch] =
        spark.table("vmatches").as[VMatch].collect().toSeq
      val batches = Seq(obs.take(700), obs.slice(700, 2900), obs.drop(2900))
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      // a user's final run is still open — close every tail with one
      // synthetic dir-0 row (never extends a matchable up-run)
      val closers = obs.groupBy(_.key).values
        .map(v => v.maxBy(_.ord))
        .map(last => Obs(last.key, last.ord + 1, last.v)).toSeq
      ms.addData(closers: _*); q.processAllAvailable()
      val streamed = got().map(m => (m.key,
        base + (m.down_start >> 20), base + (m.up_end >> 20),
        m.down_n, m.up_n, m.depth, m.recovery)).toSet
      val expected = graft.operators.QueryCatalog
        .byName("window_match_recognize").fn(spark, sf0001)
        .selectExpr("cast(user_id as string)",
          "unix_micros(down_start)", "unix_micros(up_end)",
          "cast(down_n as long)", "cast(up_n as long)",
          "depth", "recovery")
        .as[(String, Long, Long, Long, Long, Double, Double)]
        .collect().toSet
      assert(expected.nonEmpty)
      assert(streamed == expected)
      // whole-micro-batch replay: idempotent, no re-emission
      val before = got().size
      ms.addData(batches(1): _*); q.processAllAvailable()
      assert(got().size == before)
    } finally q.stop()
  }

  test("tokenBucket == the sequential reference fold regardless of " +
    "batch boundaries; replays and stale events are no-ops") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{Admission, RateEvent}
    val (capacity, rate) = (10L, 2L) // 10-token bucket, 2 tokens/tick
    // 'a' bursts (costs exceed refill → rejections); 'b' stays under
    val xs = Map(
      "a" -> Vector((1L, 6L), (2L, 6L), (3L, 6L), (10L, 6L), (11L, 9L),
        (12L, 1L), (20L, 10L), (21L, 10L)),
      "b" -> Vector((1L, 1L), (5L, 2L), (9L, 3L), (13L, 4L)))
    def reference(key: String): Vector[Admission] = {
      var (lastOrd, tokens) = (Long.MinValue, capacity)
      xs(key).map { case (ord, cost) =>
        val refilled =
          if (lastOrd == Long.MinValue) capacity
          else math.min(capacity, tokens + (ord - lastOrd) * rate)
        val admitted = refilled >= cost
        val left = if (admitted) refilled - cost else refilled
        lastOrd = ord; tokens = left
        Admission(key, ord, cost, admitted, left)
      }
    }
    // the scenario must exercise both decision branches per key class
    assert(reference("a").count(!_.admitted) >= 2)
    assert(reference("b").forall(_.admitted))

    val events = for ((key, v) <- xs.toSeq; (ord, cost) <- v)
      yield RateEvent(key, ord, cost)
    val ms = MemoryStream[RateEvent]
    val q = StatefulOps.tokenBucket(ms.toDS(), capacity, rate)
      .writeStream.outputMode("append")
      .format("memory").queryName("bucket_out")
      .trigger(Trigger.ProcessingTime(10)).start()
    try {
      def got(): Seq[Admission] =
        spark.table("bucket_out").as[Admission].collect().toSeq
      // three uneven micro-batches cut on ord (cross-batch per-key
      // order holds — the stream contract), WITHIN-batch order
      // shuffled — decisions must depend on neither
      val ordered = events.sortBy(_.ord)
      val (p1, rest) = ordered.splitAt(5)
      val (p2, p3) = rest.splitAt(4)
      val Seq(b1, b2, b3) = Seq(p1, p2, p3)
        .map(_.sortBy(e => ((e.ord * 7 + e.cost) % 5, e.key)))
      Seq(b1, b2, b3).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      val expected = (reference("a") ++ reference("b")).toSet
      assert(got().toSet == expected)
      assert(got().size == expected.size) // append mode, no duplicates
      // whole-batch replay: no state change, no re-emission
      ms.addData(b2: _*); q.processAllAvailable()
      assert(got().size == expected.size)
      // stale out-of-order event with a wild cost: ignored
      ms.addData(RateEvent("a", 2L, 100L)); q.processAllAvailable()
      assert(got().toSet == expected)
    } finally q.stop()
  }
}
