package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators (SURVEY ST4/§2.10:
  * `KeyValueGroupedDataset.flatMapGroupsWithState` for state Spark's
  * built-ins don't model).
  *
  * [[changesOnly]] is CDC-aware stream compaction: per key, keep the
  * newest version in GroupState and emit ONLY transitions — replays and
  * out-of-order stragglers produce no output. This is the streaming
  * form of the mirror merge: state lives in the checkpoint (RocksDB/
  * HDFS state store on a cluster), partitioned by key hash, so state
  * size ∝ live keys per executor, not stream length.
  */
object StatefulOps {

  final case class KeyedChange(id: Long, op: String, ts_ms: Long,
                               offset: Long, payload: String)
  final case class StateValue(ts_ms: Long, offset: Long, payload: String,
                              deleted: Boolean)
  final case class Transition(id: Long, kind: String, payload: String)

  implicit val changeEnc: Encoder[KeyedChange] = Encoders.product[KeyedChange]
  implicit val stateEnc: Encoder[StateValue] = Encoders.product[StateValue]
  implicit val transEnc: Encoder[Transition] = Encoders.product[Transition]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  private val versionOrd = Ordering.Tuple2[Long, Long]

  /** Emit one Transition per key per batch iff the key's current state
    * changed (insert / update / delete), suppressing no-ops. */
  def changesOnly(changes: Dataset[KeyedChange]): Dataset[Transition] =
    changes
      .groupByKey(_.id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update)

  // ---------------------------------------------------------------
  // transformWithState surface (Spark 4 arbitrary-state API v2):
  // cross-batch exact dedup for a streaming ingest — emit only the
  // FIRST occurrence of each content fingerprint; duplicates in later
  // batches (or the same batch) are suppressed. State is one boolean
  // per fingerprint in the RocksDB state store, optionally TTL'd so
  // the fingerprint set doesn't grow unboundedly (a bounded dedup
  // window is the standard 100 TB compromise: exact within the TTL
  // horizon, MinHash/LSH for the long tail).
  // ---------------------------------------------------------------

  final case class FingerprintedDoc(fp: String, doc_id: Long, text: String)

  implicit val fpEnc: Encoder[FingerprintedDoc] = Encoders.product[FingerprintedDoc]
  implicit val boolEnc: Encoder[Boolean] = Encoders.scalaBoolean
  implicit val stringEnc: Encoder[String] = Encoders.STRING

  private class FirstSeenProcessor(ttl: Option[java.time.Duration])
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, FingerprintedDoc, FingerprintedDoc] {
    @transient private var seen:
      org.apache.spark.sql.streaming.ValueState[Boolean] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val ttlConfig = ttl
        .map(org.apache.spark.sql.streaming.TTLConfig.apply)
        .getOrElse(org.apache.spark.sql.streaming.TTLConfig.NONE)
      seen = getHandle.getValueState[Boolean]("seen", boolEnc, ttlConfig)
    }

    override def handleInputRows(key: String, rows: Iterator[FingerprintedDoc],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[FingerprintedDoc] = {
      if (seen.exists()) Iterator.empty
      else rows.nextOption() match {
        case None => Iterator.empty
        case Some(first) =>
          seen.update(true)
          Iterator.single(first) // within-batch dups: rest of `rows` dropped
      }
    }
  }

  /** First occurrence of each fingerprint only, across batches; pass a
    * TTL to bound state (fingerprints seen longer ago than the TTL
    * readmit — exact dedup within the horizon). Requires the RocksDB
    * state store provider (transformWithState's backing store). */
  def firstSeenOnly(docs: Dataset[FingerprintedDoc],
                    ttl: Option[java.time.Duration] = None)
      : Dataset[FingerprintedDoc] = {
    // TimeMode.None unless TTL is requested: ProcessingTime mode makes
    // EVERY trigger a stateful timer batch (a no-data micro-batch per
    // trigger interval — observed as a runaway stage count with a fast
    // trigger), which only TTL eviction actually needs.
    val timeMode =
      if (ttl.isDefined) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    docs.groupByKey(_.fp)
      .transformWithState(new FirstSeenProcessor(ttl), timeMode,
        OutputMode.Append())
  }

  // ---------------------------------------------------------------
  // Streaming priority sampling (ST4 × the batch
  // pipeline_priority_sample): maintain, per stratum, the k items
  // with the LARGEST deterministic priority w/u (u = md5-derived
  // uniform) over an unbounded stream. Because the priority is a pure
  // function of the item, the maintained sample is ORDER-INDEPENDENT:
  // after any prefix of the stream, the state equals the batch
  // priority sample over exactly the rows seen so far — replays and
  // re-partitions included (the spec drives shuffled arrivals against
  // the batch query). State is k rows per stratum, period — the
  // bounded-state form of "uniformly-weighted sample of an infinite
  // stream" that a training-data ingest keeps per domain.
  // ---------------------------------------------------------------

  final case class WeightedItem(stratum: String, id: Long, weight: Long,
                                priority: Double)
  final case class StratumSample(items: List[WeightedItem])

  implicit val wiEnc: Encoder[WeightedItem] = Encoders.product[WeightedItem]
  implicit val ssEnc: Encoder[StratumSample] = Encoders.product[StratumSample]

  /** Larger priority wins; doc-id tie-break matches the batch query's
    * `row_number() over (order by priority desc, id)`. */
  private def sampleOrd: Ordering[WeightedItem] =
    Ordering.by[WeightedItem, (Double, Long)](w => (-w.priority, w.id))

  /** Per-trigger updated top-k sample per stratum (Update mode: each
    * batch re-emits strata it touched; the latest row per stratum IS
    * the current sample). */
  def prioritySample(items: Dataset[WeightedItem], k: Int)
      : Dataset[(String, StratumSample)] = {
    implicit val outEnc: Encoder[(String, StratumSample)] =
      Encoders.tuple(Encoders.STRING, ssEnc)
    items.groupByKey(_.stratum)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (stratum: String, batch: Iterator[WeightedItem],
         state: GroupState[StratumSample]) =>
          val prior = state.getOption.map(_.items).getOrElse(Nil)
          val merged = (prior ++ batch)
            .distinct // exact redelivery of a sampled row is a no-op
            .sorted(sampleOrd).take(k)
          state.update(StratumSample(merged))
          stratum -> StratumSample(merged)
      }
  }

  // ---------------------------------------------------------------
  // Streaming CUSUM (ST4 × the batch mon_cusum_drift): the batch
  // catalog query rewrites Page's recursion S_t = max(0, S_{t-1} +
  // x_t − μ − k) into two cumulative windows because a batch engine
  // has no per-row state; a STREAM is the recursion's native home —
  // S is one integer per key in the state store, updated as metric
  // buckets arrive, alarms emitted inline. Parameters arrive
  // pre-scaled ×2 so the arithmetic stays integer-exact (slack
  // k = ½ ⟹ slack2 = 1), matching the batch query's ×2n scaling
  // trick. Replayed or out-of-order buckets (seq ≤ last applied) are
  // IGNORED — replay idempotence across micro-batch boundaries; a
  // seq gap is processed as-is (observed-bucket semantics, exactly
  // like the batch query's missing-day behavior). State is two longs
  // per key, period — the smallest possible drift detector.
  // ---------------------------------------------------------------

  final case class MetricPoint(key: String, seq: Long, x: Long)
  final case class CusumPoint(key: String, seq: Long, s2: Long,
                              alarm: Boolean)
  final case class CusumState(lastSeq: Long, s2: Long)

  implicit val mpEnc: Encoder[MetricPoint] = Encoders.product[MetricPoint]
  implicit val cpEnc: Encoder[CusumPoint] = Encoders.product[CusumPoint]
  implicit val csEnc: Encoder[CusumState] = Encoders.product[CusumState]

  private class CusumProcessor(mu2: Long, slack2: Long, h2: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, MetricPoint, CusumPoint] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[CusumState] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[CusumState]("cusum", csEnc,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[MetricPoint],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[CusumPoint] = {
      var cur = if (st.exists()) st.get() else CusumState(Long.MinValue, 0L)
      // a micro-batch may carry several buckets of one key — apply in
      // seq order so batch-boundary placement can't change the fold
      val out = rows.toVector.sortBy(_.seq).flatMap { p =>
        if (p.seq <= cur.lastSeq) None // replay / stale: idempotent skip
        else {
          val s2 = math.max(0L, cur.s2 + 2 * p.x - mu2 - slack2)
          cur = CusumState(p.seq, s2)
          Some(CusumPoint(key, p.seq, s2, s2 > h2))
        }
      }
      st.update(cur)
      out.iterator
    }
  }

  /** Per-key CUSUM over a metric stream: S (×2-scaled) per bucket +
    * alarm at S > h. μ, k, h are supplied ×2-scaled integers (the
    * in-control mean is a KNOWN reference in the sequential setting —
    * the batch catalog query estimates it from the full series
    * instead). Requires the RocksDB state store provider. */
  def cusum(points: Dataset[MetricPoint], mu2: Long, slack2: Long = 1L,
            h2: Long = 10L): Dataset[CusumPoint] =
    points.groupByKey(_.key)
      .transformWithState(new CusumProcessor(mu2, slack2, h2),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())

  // ---------------------------------------------------------------
  // Streaming alert throttle (ST9's delivery side): emit at most one
  // alert per key per `minGap` ticks, carrying the count of alerts
  // suppressed since the last emission (the "5 more occurrences"
  // digest every paging system shows). A flapping monitor — the
  // reference's health-check DAG firing each poll while a connector
  // is down — becomes one page plus a suppression count instead of a
  // page storm. State is three longs per key; replayed or
  // out-of-order ticks (seq ≤ last seen) are ignored, so checkpoint
  // replays can't double-page or double-count.
  // ---------------------------------------------------------------

  final case class AlertTick(key: String, seq: Long)
  final case class ThrottledAlert(key: String, seq: Long, suppressed: Long)
  final case class ThrottleState(lastEmit: Long, lastSeen: Long,
                                 suppressed: Long)

  implicit val atEnc: Encoder[AlertTick] = Encoders.product[AlertTick]
  implicit val taEnc: Encoder[ThrottledAlert] = Encoders.product[ThrottledAlert]
  implicit val tsEnc: Encoder[ThrottleState] = Encoders.product[ThrottleState]

  private class ThrottleProcessor(minGap: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, AlertTick, ThrottledAlert] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[ThrottleState] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[ThrottleState]("throttle", tsEnc,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[AlertTick],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[ThrottledAlert] = {
      var cur =
        if (st.exists()) st.get()
        else ThrottleState(Long.MinValue, Long.MinValue, 0L)
      val out = rows.toVector.sortBy(_.seq).flatMap { t =>
        if (t.seq <= cur.lastSeen) None // replay / stale: idempotent
        else if (cur.lastEmit == Long.MinValue ||
            t.seq >= cur.lastEmit + minGap) {
          val emitted = ThrottledAlert(key, t.seq, cur.suppressed)
          cur = ThrottleState(t.seq, t.seq, 0L)
          Some(emitted)
        } else {
          cur = cur.copy(lastSeen = t.seq, suppressed = cur.suppressed + 1)
          None
        }
      }
      st.update(cur)
      out.iterator
    }
  }

  /** At most one alert per key per `minGap` ticks; each emission
    * reports how many ticks it swallowed since the previous one.
    * Requires the RocksDB state store provider. */
  def throttleAlerts(ticks: Dataset[AlertTick], minGap: Long)
      : Dataset[ThrottledAlert] =
    ticks.groupByKey(_.key)
      .transformWithState(new ThrottleProcessor(minGap),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())

  // ---------------------------------------------------------------
  // Streaming OHLC bar maintenance — the incremental form of the
  // batch `events_ohlc_bars` catalog query: per (series, day) key the
  // running candlestick folds in 7 longs of keyed state, and each
  // micro-batch that touches a key emits that key's UPDATED bar (an
  // IVM changefeed of the bar table; the latest row per key IS the
  // batch answer, which the parity spec asserts as set-equality).
  // Delivery contract mirrors [[cusum]]: per-key ordered arrival with
  // possible replays — a micro-batch is folded in `ord` order so
  // batch-boundary placement can't change the bar, and ticks at
  // ord ≤ the high-water mark are idempotently skipped, so a
  // checkpoint replay neither double-counts volume nor re-emits.
  // State ∝ live (series, day) keys, never stream length.
  // ---------------------------------------------------------------

  final case class Tick(key: String, ord: Long, c: Long)
  final case class Bar(key: String, open_c: Long, high_c: Long,
                       low_c: Long, close_c: Long, n_ticks: Long,
                       vol_c: Long)
  final case class BarState(lastOrd: Long, openC: Long, highC: Long,
                            lowC: Long, closeC: Long, n: Long, volC: Long)

  implicit val tickEnc: Encoder[Tick] = Encoders.product[Tick]
  implicit val barEnc: Encoder[Bar] = Encoders.product[Bar]
  implicit val barStEnc: Encoder[BarState] = Encoders.product[BarState]

  private class OhlcProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, Tick, Bar] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[BarState] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[BarState]("ohlc", barStEnc,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Tick],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[Bar] = {
      var cur = if (st.exists()) st.get()
        else BarState(Long.MinValue, 0L, Long.MinValue, Long.MaxValue,
          0L, 0L, 0L)
      var changed = false
      rows.toVector.sortBy(_.ord).foreach { t =>
        if (t.ord > cur.lastOrd) { // replay / stale: idempotent skip
          cur = BarState(t.ord,
            if (cur.n == 0L) t.c else cur.openC,
            math.max(cur.highC, t.c), math.min(cur.lowC, t.c),
            t.c, cur.n + 1L, cur.volC + t.c)
          changed = true
        }
      }
      if (!changed) Iterator.empty
      else {
        st.update(cur)
        Iterator.single(Bar(key, cur.openC, cur.highC, cur.lowC,
          cur.closeC, cur.n, cur.volC))
      }
    }
  }

  /** Per-key running OHLC bars over a tick stream; emits the updated
    * bar for every key a micro-batch touches. Requires the RocksDB
    * state store provider. */
  def ohlcBars(ticks: Dataset[Tick]): Dataset[Bar] =
    ticks.groupByKey(_.key)
      .transformWithState(new OhlcProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())

  // ---------------------------------------------------------------
  // Streaming MATCH_RECOGNIZE — the incremental (Flink-CEP-shaped)
  // form of the batch `window_match_recognize` catalog query
  // (DOWN{2,} UP{2,}): the whole NFA collapses to O(1) keyed state —
  // the previous value, the last COMPLETED run and the current run —
  // because the pattern is a function of adjacent runs only. A match
  // is emitted at the moment its up-run is CLOSED by the next
  // direction change: the earliest point a streaming matcher can know
  // the run is complete (the batch query also scores a user's final,
  // still-open run — the parity spec closes tails explicitly).
  // Delivery contract mirrors [[ohlcBars]]: per-key ordered arrival
  // with replays — a micro-batch folds in ord order and rows at
  // ord ≤ the high-water mark are idempotently skipped, so batch
  // boundaries and checkpoint replays can't split, duplicate or lose
  // a match. State ∝ live keys, never stream length.
  // ---------------------------------------------------------------

  final case class Obs(key: String, ord: Long, v: Double)
  final case class VMatch(key: String, down_start: Long, up_end: Long,
                          down_n: Long, up_n: Long, depth: Double,
                          recovery: Double)
  /** cN == 0 marks empty state; dir 9 = the first row's own run. */
  final case class RunState(
      lastOrd: Long, lastV: Double,
      pDir: Int, pN: Long, pMin: Double, pMax: Double, pStart: Long,
      cDir: Int, cN: Long, cMin: Double, cMax: Double, cStart: Long,
      cEnd: Long)

  implicit val obsEnc: Encoder[Obs] = Encoders.product[Obs]
  implicit val vmEnc: Encoder[VMatch] = Encoders.product[VMatch]
  implicit val runStEnc: Encoder[RunState] = Encoders.product[RunState]

  // ---------------------------------------------------------------
  // Token-bucket admission control (per-tenant rate limiting at the
  // ingest edge). This is the computation the batch catalog's
  // window_clamped_balance closed form CANNOT express: an admission
  // DECISION feeds back into the balance (rejected events consume
  // nothing), so the fold is non-associative for real and needs keyed
  // state — O(2 longs) per tenant, the canonical ST4 shape. Within a
  // batch events are sorted by `ord`; `ord` is also the replay
  // high-water mark (redelivered or stale events emit nothing and
  // leave state untouched, the same idempotence convention as cusum /
  // matchVPattern). All arithmetic is integer token units: refill =
  // Δord · ratePerOrd capped at capacity, so parity with a sequential
  // reference fold is exact, not approximate.
  // ---------------------------------------------------------------

  final case class RateEvent(key: String, ord: Long, cost: Long)
  final case class BucketState(lastOrd: Long, tokens: Long)
  final case class Admission(key: String, ord: Long, cost: Long,
                             admitted: Boolean, tokensAfter: Long)

  implicit val rateEnc: Encoder[RateEvent] = Encoders.product[RateEvent]
  implicit val bucketEnc: Encoder[BucketState] = Encoders.product[BucketState]
  implicit val admEnc: Encoder[Admission] = Encoders.product[Admission]

  /** Per-key token bucket: starts full at `capacity`, refills
    * `ratePerOrd` tokens per unit of `ord` elapsed (capped), admits an
    * event iff the bucket covers its cost. Emits one Admission per
    * first-seen event; replays/stale events are no-ops. */
  def tokenBucket(events: Dataset[RateEvent], capacity: Long,
                  ratePerOrd: Long): Dataset[Admission] =
    events.groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[RateEvent],
         state: GroupState[BucketState]) =>
          var s = state.getOption.getOrElse(BucketState(Long.MinValue, capacity))
          val out = Vector.newBuilder[Admission]
          batch.toVector.sortBy(_.ord).foreach { e =>
            if (e.ord > s.lastOrd) { // replay / stale: idempotent skip
              val refilled =
                if (s.lastOrd == Long.MinValue) capacity
                else math.min(capacity,
                  s.tokens + (e.ord - s.lastOrd) * ratePerOrd)
              val admitted = refilled >= e.cost
              val left = if (admitted) refilled - e.cost else refilled
              out += Admission(key, e.ord, e.cost, admitted, left)
              s = BucketState(e.ord, left)
            }
          }
          state.update(s)
          out.result().iterator
      }

  /** Per-key streaming V-pattern (DOWN{2,} UP{2,}) matcher. */
  def matchVPattern(obs: Dataset[Obs]): Dataset[VMatch] =
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(vUpdate)

  private def vUpdate(key: String, batch: Iterator[Obs],
                      state: GroupState[RunState]): Iterator[VMatch] = {
    var s = state.getOption.getOrElse(RunState(Long.MinValue, 0.0,
      0, 0L, 0.0, 0.0, 0L, 0, 0L, 0.0, 0.0, 0L, 0L))
    val out = Vector.newBuilder[VMatch]
    batch.toVector.sortBy(_.ord).foreach { o =>
      if (o.ord > s.lastOrd) { // replay / stale: idempotent skip
        if (s.cN == 0L)
          s = RunState(o.ord, o.v, 0, 0L, 0.0, 0.0, 0L,
            9, 1L, o.v, o.v, o.ord, o.ord)
        else {
          val dir = if (o.v > s.lastV) 1 else if (o.v < s.lastV) -1 else 0
          if (dir == s.cDir)
            s = s.copy(lastOrd = o.ord, lastV = o.v, cN = s.cN + 1,
              cMin = math.min(s.cMin, o.v), cMax = math.max(s.cMax, o.v),
              cEnd = o.ord)
          else {
            if (s.pDir == -1 && s.pN >= 2 && s.cDir == 1 && s.cN >= 2)
              out += VMatch(key, s.pStart, s.cEnd, s.pN, s.cN,
                s.pMax - s.pMin, s.cMax - s.cMin)
            s = RunState(o.ord, o.v,
              s.cDir, s.cN, s.cMin, s.cMax, s.cStart,
              dir, 1L, o.v, o.v, o.ord, o.ord)
          }
        }
      }
    }
    state.update(s)
    out.result().iterator
  }

  private def update(id: Long, batch: Iterator[KeyedChange],
                     state: GroupState[StateValue]): Iterator[Transition] = {
    val newest = batch.reduceOption { (a, b) =>
      if (versionOrd.gteq((a.ts_ms, a.offset), (b.ts_ms, b.offset))) a else b
    }
    newest match {
      case None => Iterator.empty
      case Some(c) =>
        val prior = state.getOption
        val priorVersion = prior.map(s => (s.ts_ms, s.offset))
        // stale batch (all records older than state): no transition
        if (priorVersion.exists(v => versionOrd.gteq(v, (c.ts_ms, c.offset))))
          Iterator.empty
        else {
          val deleted = c.op == "d"
          state.update(StateValue(c.ts_ms, c.offset, c.payload, deleted))
          (prior.map(_.deleted), deleted) match {
            case (None, true) | (Some(true), true) => Iterator.empty
            case (None, false) | (Some(true), false) =>
              Iterator.single(Transition(id, "insert", c.payload))
            case (Some(false), true) =>
              Iterator.single(Transition(id, "delete", ""))
            case (Some(false), false) =>
              if (prior.exists(_.payload == c.payload)) Iterator.empty
              else Iterator.single(Transition(id, "update", c.payload))
          }
        }
    }
  }
}
