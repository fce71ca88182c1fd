package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.KmvSketch

/** The mergeability contract under INCREMENTAL execution: an algebraic
  * aggregate that map-side-combines in batch must also fold correctly
  * across micro-batches in complete-mode streaming — same algebra,
  * different merge order. Proven for the two round-8 additions:
  *   - the KMV bottom-k sketch (arbitrary batch splits may deliver a
  *     key's rows in any order / multiple times across partials);
  *   - the M4 min/max/min_by/max_by reduction (the packed-long order
  *     key must survive out-of-order micro-batches).
  * Parity target: the one-shot batch aggregation over the concatenated
  * input. */
case class MergeRow(grp: String, h: Long, key: Long, ord: Long, v: Double)

class MergeableAggStreamingSpec extends SparkSpec {
  import spark.implicits._

  private type R = MergeRow
  private val R = MergeRow

  // deterministic pseudo-hash (mixes well enough for a parity test;
  // the REAL queries use the md5 fingerprint — parity only needs both
  // sides to see the same h)
  private def mk(grp: String, key: Long): R =
    R(grp, (key * 2654435761L) & 0xffffffffL, key,
      (key * 48271L) % 100000L, (key % 97).toDouble)

  private val rows: Seq[R] =
    (1L to 300L).map(k => mk(if (k % 3 == 0) "a" else "b", k)) ++
      (1L to 50L).map(k => mk("a", k * 3)) // replayed duplicates

  private def kmvAgg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy($"grp")
      .agg(KmvSketch.kmv(8)($"h", $"key").as("sk"))
      .select($"grp", $"sk")

  private def m4Agg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy($"grp")
      .agg(count(lit(1)).as("n"), min($"v").as("v_min"),
        max($"v").as("v_max"),
        min_by($"v", $"ord").as("v_first"),
        max_by($"v", $"ord").as("v_last"))

  private def streamed(
      agg: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      name: String): org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[R]
    val q = agg(ms.toDF()).writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try {
      // three uneven out-of-order micro-batches incl. replays
      ms.addData(rows.drop(200): _*)
      q.processAllAvailable()
      ms.addData(rows.slice(50, 200): _*)
      q.processAllAvailable()
      ms.addData(rows.take(50): _*)
      q.processAllAvailable()
      spark.table(name).cache()
    } finally q.stop()
  }

  test("KMV sketch: three uneven replayed micro-batches == one batch") {
    val batch = kmvAgg(rows.toDF()).collect().map(r =>
      r.getString(0) -> r.getSeq[Any](1)).toMap
    val stream = streamed(kmvAgg, "kmv_stream").collect().map(r =>
      r.getString(0) -> r.getSeq[Any](1)).toMap
    assert(stream == batch)
    assert(batch("a").size == 8 && batch("b").size == 8)
  }

  test("M4 reduction: min/max/first/last agree with the one-shot batch") {
    val batch = m4Agg(rows.toDF()).collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    val stream = streamed(m4Agg, "m4_stream").collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(stream == batch)
  }

  // The IBLT cell table is count/xor/xor per cell — algebraic, so a
  // replica's reconciliation sketch can be MAINTAINED as a streaming
  // aggregation instead of rebuilt per comparison. CAVEAT the spec
  // encodes: xor is self-inverse, so this holds for exactly-once
  // element streams (e.g. a changefeed of inserts); at-least-once
  // redelivery cancels elements out of the sketch — pair with the
  // dedup ledger upstream.
  private def ibltAgg(df: org.apache.spark.sql.DataFrame) =
    graft.functions.Iblt.cellTable(
      graft.functions.Iblt.cellRows(df.select($"key"), $"key", 32))

  test("IBLT cells: streaming fold across micro-batches == batch table") {
    val distinctRows = rows.map(_.key).distinct.map(k => MergeRow("x", k, k, k, 0))
    val batch = ibltAgg(distinctRows.toDF()).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[MergeRow]
    val q = ibltAgg(ms.toDF()).writeStream.outputMode("complete")
      .format("memory").queryName("iblt_stream").start()
    try {
      distinctRows.grouped(97).foreach { chunk =>
        ms.addData(chunk: _*); q.processAllAvailable()
      }
      val stream = spark.table("iblt_stream").collect()
        .map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(stream == batch)
    } finally q.stop()
  }

  // DDSketch is a (group, bucket) COUNT — the bucketing is a pure
  // per-row function, so the sketch must maintain under complete-mode
  // streaming with NO custom state: micro-batch replays/splits fold in
  // state exactly like map-side partials fold in batch.
  private val gamma = 101.0 / 99.0
  private def ddAgg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy($"grp",
        ceil(log($"v" + 1.0) / log(lit(gamma))).cast("int").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  test("DDSketch buckets: streaming fold == batch sketch, and the " +
    "quantile extracted from the streamed state honors the α-guarantee") {
    val batch = ddAgg(rows.toDF()).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val stream = streamed(ddAgg, "dd_stream").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(stream == batch)
    // p50 per group from the streamed sketch vs the exact lower median
    for (g <- Seq("a", "b")) {
      val sk = stream.collect { case ((`g`, b), c) => b -> c }.toSeq.sortBy(_._1)
      val n = sk.map(_._2).sum
      val target = math.ceil(0.5 * n).toLong
      val (bq, _) = sk.scanLeft((0, 0L)) { case ((_, cum), (b, c)) =>
        (b, cum + c)
      }.drop(1).find(_._2 >= target).get
      val est = 2.0 * math.pow(gamma, bq) / (gamma + 1)
      val exact = rows.filter(_.grp == g).map(_.v + 1.0).sorted
        .apply((target - 1).toInt)
      assert(math.abs(est - exact) <= 0.011 * exact,
        s"$g: est=$est exact=$exact")
    }
  }
}
