package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Caching.persistOnce
import graft.core.Tables.load

import graft.cdc.{Envelope, Fixture, Materialize}

/** The CDC replication spine as oracle-checkable batch queries
  * (SURVEY §2.1/§2.2 + EP1): envelope parse → unwrap → route →
  * latest-per-key → tombstone-aware materialization, run over the
  * deterministic Fixture stream so DuckDB can derive the expected final
  * state directly from `orders` (FIXTURES.md §B).
  */
object CdcQueries {

  // Shared unwrapped change stream, persisted per (session, sf-dir):
  // five catalog queries replay it, and the parse is the expensive part.
  private val cache =
    new graft.core.SessionMemo[String, org.apache.spark.sql.DataFrame]

  /** Shared with [[Expectations]]' table-integrity query. */
  private[operators] def fixtureChanges(s: org.apache.spark.sql.SparkSession,
                                        d: String) = unwrapped(s, d)

  /** Shared Spark pipeline: raw records → unwrapped typed changes. */
  // persistOnce at ACCESS time, not only creation: a session-level
  // clearCache() (the plan-fingerprint spec's isolation discipline, or
  // any user) would otherwise leave the memoized frame unpersisted
  // forever, silently changing downstream plan shapes
  private def unwrapped(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.core.Caching.persistMaterialized(cache.getOrElseUpdate(s, d)(
      Envelope.unwrap(
        Envelope.wellFormed(
          Envelope.parse(Fixture.ordersCdcEvents(s, d), Fixture.rowSchema)),
        keyCols = Seq("id"))))

  /** DuckDB-side derivation of the fixture's expected final state. */
  private val oracleFinalState =
    """SELECT o_orderkey AS id,
      |  CASE WHEN o_orderkey % 10 = 0 THEN 'RE'
      |       WHEN o_orderkey % 6 = 0 THEN 'U2'
      |       WHEN o_orderkey % 3 = 0 THEN 'U1'
      |       ELSE o_orderstatus END AS o_orderstatus,
      |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice
      |       WHEN o_orderkey % 6 = 0 THEN o_totalprice * 1.2
      |       WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders
      |WHERE NOT (o_orderkey % 5 = 0 AND o_orderkey % 10 <> 0)""".stripMargin

  /** Scripted fact/dim change waves driving [[graft.sinks.IncrementalJoinView]],
    * shared by `cdc_join_view` and the chained `cdc_star_rollup_view`:
    *   fact: snapshot ts1000 → %4 price*1.05 ts2000 → %9 delete ts3000
    *   dim : snapshot ts1000 → %7 'MOVED'   ts2000 → %13 delete ts3000
    * A maintenance poll runs between waves; `afterPoll` fires after each
    * so a downstream consumer (the agg view) can ride the SAME cadence.
    * Returns the join-view root. */
  private def runJoinViewWaves(s: org.apache.spark.sql.SparkSession, d: String,
                               afterPoll: String => Unit = _ => ()): String = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-joinview-q").toString
    val (fact, dim, view) = (s"$root/fact", s"$root/dim", s"$root/view")
    val orders = graft.core.Tables.load(s, d, "orders")
    val cust = graft.core.Tables.load(s, d, "customer")
    def factWave(df: org.apache.spark.sql.DataFrame, price: org.apache.spark.sql.Column,
                 op: String, ts: Long) =
      df.select(col("o_orderkey"), col("o_custkey"),
        price.as("o_totalprice"), lit(op).as("op"), lit(ts).as("ts_ms"),
        col("o_orderkey").as("offset"))
    def dimWave(df: org.apache.spark.sql.DataFrame, seg: org.apache.spark.sql.Column,
                op: String, ts: Long) =
      df.select(col("c_custkey").as("o_custkey"),
        seg.as("c_mktsegment"), lit(op).as("op"), lit(ts).as("ts_ms"),
        col("c_custkey").as("offset"))
    import graft.sinks.{IncrementalJoinView, LogMirror}
    def mergeF(c: org.apache.spark.sql.DataFrame, b: Long) =
      LogMirror.merge(s, fact, c, Seq("o_orderkey"), b, 16, None)
    def mergeD(c: org.apache.spark.sql.DataFrame, b: Long) =
      LogMirror.merge(s, dim, c, Seq("o_custkey"), b, 16, None)
    def maintain(): Unit = {
      IncrementalJoinView.poll(s, fact, dim, view,
        Seq("o_orderkey"), Seq("o_custkey"))
      afterPoll(view)
    }
    mergeF(factWave(orders, col("o_totalprice"), "r", 1000L), 0L)
    mergeD(dimWave(cust, col("c_mktsegment"), "r", 1000L), 0L)
    maintain()
    mergeF(factWave(orders.filter(col("o_orderkey") % 4 === 0),
      col("o_totalprice") * 1.05, "u", 2000L), 1L)
    mergeD(dimWave(cust.filter(col("c_custkey") % 7 === 0),
      lit("MOVED"), "u", 2000L), 1L)
    maintain()
    mergeF(factWave(orders.filter(col("o_orderkey") % 9 === 0),
      col("o_totalprice"), "d", 3000L), 2L)
    mergeD(dimWave(cust.filter(col("c_custkey") % 13 === 0),
      lit(""), "d", 3000L), 2L)
    maintain()
    view
  }

  def queries: Seq[Q] = Seq(
    Q("cdc_materialize",
      (s, d) => Materialize.currentState(unwrapped(s, d), Seq("id")),
      Some(oracleFinalState),
      "EP1 spine: parse P1 → unwrap → A5 latest-per-key → tombstone filter; " +
        "single hash-agg shuffle keyed by PK"),

    // Time travel to ts=3500: updates U1/U2 applied, deletes (ts 4000)
    // and re-inserts (ts 5000) not yet visible.
    Q("cdc_time_travel",
      (s, d) => Materialize.stateAsOf(unwrapped(s, d), Seq("id"), 3500L),
      Some("""SELECT o_orderkey AS id,
             |  CASE WHEN o_orderkey % 6 = 0 THEN 'U2'
             |       WHEN o_orderkey % 3 = 0 THEN 'U1'
             |       ELSE o_orderstatus END AS o_orderstatus,
             |  CASE WHEN o_orderkey % 6 = 0 THEN o_totalprice * 1.2
             |       WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
             |       ELSE o_totalprice END AS o_totalprice
             |FROM orders""".stripMargin),
      "state as-of a past timestamp: replay the change log below the cutoff"),

    Q("cdc_route_counts",
      (s, d) => {
        val parsed = Envelope.parse(Fixture.ordersCdcEvents(s, d), Fixture.rowSchema)
        Envelope.wellFormed(parsed)
          .select(Envelope.route(col("topic")).as("table_name"))
          .groupBy(col("table_name"))
          .agg(count(lit(1)).as("n_records"))
      },
      Some("""WITH recs AS (
             |  SELECT 'orders_t' || CAST(o_orderkey % 9 AS VARCHAR) AS table_name,
             |         5 - (o_orderkey % 3 <> 0)::INT - (o_orderkey % 6 <> 0)::INT
             |           - (o_orderkey % 5 <> 0)::INT - (o_orderkey % 10 <> 0)::INT AS n
             |  FROM orders)
             |SELECT table_name, CAST(sum(n) AS BIGINT) AS n_records
             |FROM recs GROUP BY table_name""".stripMargin),
      "P2 RegexRouter topic→table + per-table record counts (register-postgres-sink.json:25-27)"),

    Q("cdc_dlq_split",
      (s, d) => {
        val parsed = Envelope.parse(Fixture.ordersCdcEvents(s, d), Fixture.rowSchema)
        val good = Envelope.wellFormed(parsed).agg(count(lit(1)).as("n")).withColumn("side", lit("parsed"))
        val bad = Envelope.dlq(parsed).agg(count(lit(1)).as("n")).withColumn("side", lit("dlq"))
        good.unionByName(bad).select(col("side"), col("n"))
      },
      Some("""SELECT 'parsed' AS side, CAST(sum(
             |    5 - (o_orderkey % 3 <> 0)::INT - (o_orderkey % 6 <> 0)::INT
             |      - (o_orderkey % 5 <> 0)::INT - (o_orderkey % 10 <> 0)::INT) AS BIGINT) AS n
             |FROM orders
             |UNION ALL
             |SELECT 'dlq' AS side, count(*) AS n FROM orders WHERE o_orderkey % 97 = 0""".stripMargin),
      "ST6/S6 DLQ conservation: parsed + dlq = input (register-postgres-sink.json:18-21)"),

    Q("cdc_include_filter",
      (s, d) => {
        // P4 table include-list: admit only whitelisted topics
        // (register-mysql-connector.json:11-12)
        val whitelist = Seq("orders_t0", "orders_t3", "orders_t7")
          .map(t => s"${graft.core.Tables.topicPrefix}.$t")
        Envelope.wellFormed(
          Envelope.parse(Fixture.ordersCdcEvents(s, d), Fixture.rowSchema))
          .filter(col("topic").isin(whitelist: _*))
          .groupBy(col("topic")).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT 'mysql-server.pos_bi_db.orders_t' || CAST(o_orderkey % 9 AS VARCHAR) AS topic,
             |  CAST(sum(5 - (o_orderkey % 3 <> 0)::INT - (o_orderkey % 6 <> 0)::INT
             |       - (o_orderkey % 5 <> 0)::INT - (o_orderkey % 10 <> 0)::INT) AS BIGINT) AS n
             |FROM orders WHERE o_orderkey % 9 IN (0, 3, 7)
             |GROUP BY 1""".stripMargin),
      "P4 include-list topic filter (Column.isin whitelist)"),

    Q("cdc_op_histogram",
      (s, d) => unwrapped(s, d)
        .groupBy(col("op"))
        .agg(count(lit(1)).as("n"),
             max(col("ts_ms")).as("max_ts")),
      Some("""SELECT op, count(*) AS n, CAST(max(ts) AS BIGINT) AS max_ts FROM (
             |  SELECT 'r' AS op, 1000 AS ts FROM orders
             |  UNION ALL SELECT 'u', 2000 FROM orders WHERE o_orderkey % 3 = 0
             |  UNION ALL SELECT 'u', 3000 FROM orders WHERE o_orderkey % 6 = 0
             |  UNION ALL SELECT 'd', 4000 FROM orders WHERE o_orderkey % 5 = 0
             |  UNION ALL SELECT 'c', 5000 FROM orders WHERE o_orderkey % 10 = 0)
             |GROUP BY op""".stripMargin),
      "op-code distribution over the unwrapped change stream"),

    Q("cdc_merge_incremental",
      (s, d) => {
        // Split the change stream at ts_ms < 3000 into "already applied"
        // mirror vs "new batch", then merge — exercises J3 across a batch
        // boundary; final state must equal the one-shot materialization.
        val all = unwrapped(s, d)
        val mirror = Materialize.versionedState(all.filter(col("ts_ms") < 3000), Seq("id"))
        val batch = all.filter(col("ts_ms") >= 3000)
        Materialize.stripVersions(Materialize.merge(mirror, batch, Seq("id")))
      },
      Some(oracleFinalState),
      "J3 upsert-merge across batch boundaries == one-shot replay (idempotence of state)"),

    Q("cdc_log_mirror_state",
      (s, d) => {
        // The fixture stream's five event-time waves merged one batch
        // at a time into a LOG-STRUCTURED mirror (maxDeltas=3, so the
        // run crosses a compaction fold mid-stream), then read back:
        // the base+delta reconcile — delta-only writes, versioned
        // tombstones, folded base — must equal the one-shot
        // materialization the oracle derives from `orders`.
        val root = java.nio.file.Files
          .createTempDirectory("graft-logmirror-q").toString + "/orders"
        val all = unwrapped(s, d)
        Seq(1000L, 2000L, 3000L, 4000L, 5000L).zipWithIndex.foreach {
          case (ts, i) =>
            graft.sinks.LogMirror.merge(s, root,
              all.filter(col("ts_ms") === ts), Seq("id"), i.toLong,
              maxDeltas = 3, bucketCount = Some(4))
        }
        graft.sinks.LogMirror.read(s, root)
      },
      Some(oracleFinalState),
      "log-structured mirror spine: per-wave delta merges + mid-stream " +
        "compaction fold == one-shot materialization"),

    Q("mon_mirror_segments",
      (s, d) => {
        // The five fixture waves merged without folding, then the
        // mirror's per-segment health stats: one 1-row aggregate per
        // segment (footer-served counts), unioned. Wave sizes and the
        // delete wave's tombstone count are plain SQL over `orders`.
        val root = java.nio.file.Files
          .createTempDirectory("graft-segstats-q").toString + "/orders"
        val all = unwrapped(s, d)
        Seq(1000L, 2000L, 3000L, 4000L, 5000L).zipWithIndex.foreach {
          case (ts, i) =>
            graft.sinks.LogMirror.merge(s, root,
              all.filter(col("ts_ms") === ts), Seq("id"), i.toLong,
              maxDeltas = 16, bucketCount = None)
        }
        graft.sinks.LogMirror.segmentStats(s, root)
      },
      Some("""SELECT 'delta' AS kind, CAST(0 AS BIGINT) AS version,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(0 AS BIGINT) AS n_tombstones FROM orders
             |UNION ALL SELECT 'delta', 1, count(*), 0 FROM orders
             |  WHERE o_orderkey % 3 = 0
             |UNION ALL SELECT 'delta', 2, count(*), 0 FROM orders
             |  WHERE o_orderkey % 6 = 0
             |UNION ALL SELECT 'delta', 3, count(*), count(*) FROM orders
             |  WHERE o_orderkey % 5 = 0
             |UNION ALL SELECT 'delta', 4, count(*), 0 FROM orders
             |  WHERE o_orderkey % 10 = 0""".stripMargin),
      "log-mirror per-segment health stats (rows + tombstones per " +
        "live segment) — the compaction-cadence signal"),

    Q("cdc_state_at_version",
      (s, d) => {
        // COMMIT-time travel on the log mirror: the five fixture waves
        // merge as batches 0..4 (no fold), then readAsOf(2) reconciles
        // ONLY segments 0..2 — the r/U1/U2 waves with deletes and
        // re-inserts not yet committed. Same expected state as
        // cdc_time_travel (EVENT-time travel at ts=3500) reached by a
        // disjoint mechanism: segment-set selection instead of a
        // change-log replay filter.
        val root = java.nio.file.Files
          .createTempDirectory("graft-versiontravel-q").toString + "/orders"
        val all = unwrapped(s, d)
        Seq(1000L, 2000L, 3000L, 4000L, 5000L).zipWithIndex.foreach {
          case (ts, i) =>
            graft.sinks.LogMirror.merge(s, root,
              all.filter(col("ts_ms") === ts), Seq("id"), i.toLong,
              maxDeltas = 16, bucketCount = None)
        }
        graft.sinks.LogMirror.readAsOf(s, root, 2L)
      },
      Some("""SELECT o_orderkey AS id,
             |  CASE WHEN o_orderkey % 6 = 0 THEN 'U2'
             |       WHEN o_orderkey % 3 = 0 THEN 'U1'
             |       ELSE o_orderstatus END AS o_orderstatus,
             |  CASE WHEN o_orderkey % 6 = 0 THEN o_totalprice * 1.2
             |       WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
             |       ELSE o_totalprice END AS o_totalprice
             |FROM orders""".stripMargin),
      "commit-time travel on the log mirror: state as of batch 2 from " +
        "the segment history alone (the log layout IS the history)"),

    Q("cdc_replicated_state",
      (s, d) => {
        // The replication chain end-to-end: five fixture waves merged
        // into a SOURCE log mirror with maxDeltas=3 (wave 3 trips a
        // fold), a downstream replicator polling at waves 2, 3 and 5 —
        // the middle poll finds its checkpoint behind the folded base
        // and takes the re-snapshot path; the others apply deltas only.
        // The TARGET mirror's final state must equal the one-shot
        // materialization the oracle derives from `orders`.
        val root = java.nio.file.Files
          .createTempDirectory("graft-replicate-q").toString
        val (src, dst) = (s"$root/src", s"$root/dst")
        val sink = graft.sinks.LogMirrorSink()
        val all = unwrapped(s, d)
        def wave(ts: Long, i: Int): Unit = graft.sinks.LogMirror.merge(
          s, src, all.filter(col("ts_ms") === ts), Seq("id"), i.toLong,
          maxDeltas = 3, bucketCount = None)
        wave(1000L, 0); wave(2000L, 1)
        graft.sinks.ChangefeedReplicator.poll(s, src, dst, sink, Seq("id"))
        wave(3000L, 2) // third delta folds into base-2 → checkpoint 1 lost
        graft.sinks.ChangefeedReplicator.poll(s, src, dst, sink, Seq("id"))
        wave(4000L, 3); wave(5000L, 4)
        graft.sinks.ChangefeedReplicator.poll(s, src, dst, sink, Seq("id"))
        sink.read(s, dst)
      },
      Some(oracleFinalState),
      "changefeed replication e2e across a mid-stream compaction fold " +
        "(incremental polls + the retention-lost re-snapshot) == " +
        "one-shot materialization"),

    Q("cdc_changefeed",
      (s, d) => {
        // Outbound incremental consumption: the five fixture waves merged
        // as batches 0..4 into a log mirror (maxDeltas high enough that
        // nothing folds), then a downstream consumer checkpointed at
        // batch 1 polls changesSince(1) — the post-image of waves
        // ts=3000/4000/5000, one row per changed key, deletes as
        // key-only tombstone rows, each row stamped with the batch that
        // produced it. Payload reads touch ONLY delta segments 2..4 (the
        // post-image race probe reads just key+version columns of the
        // older segments) — the reference's sink-connector consumption
        // model, register-postgres-sink.json:15-17, served from the
        // mirror.
        val root = java.nio.file.Files
          .createTempDirectory("graft-changefeed-q").toString + "/orders"
        val all = unwrapped(s, d)
        Seq(1000L, 2000L, 3000L, 4000L, 5000L).zipWithIndex.foreach {
          case (ts, i) =>
            graft.sinks.LogMirror.merge(s, root,
              all.filter(col("ts_ms") === ts), Seq("id"), i.toLong,
              maxDeltas = 16, bucketCount = None)
        }
        graft.sinks.LogMirror.changesSince(s, root, 1L)
          .withColumnRenamed(graft.sinks.LogMirror.changeType, "change_type")
          .withColumnRenamed(graft.sinks.LogMirror.commitVersion,
            "commit_version")
      },
      // Keys touched after batch 1: u2 (id%6=0, batch 2), delete
      // (id%5=0, batch 3), re-insert (id%10=0, batch 4). Latest wins
      // per key; %10 implies %5 so the re-insert masks the delete.
      Some("""SELECT o_orderkey AS id,
             |  CASE WHEN o_orderkey % 10 = 0 THEN 'RE'
             |       WHEN o_orderkey % 5 = 0 THEN NULL
             |       ELSE 'U2' END AS o_orderstatus,
             |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice
             |       WHEN o_orderkey % 5 = 0 THEN NULL
             |       ELSE o_totalprice * 1.2 END AS o_totalprice,
             |  CASE WHEN o_orderkey % 5 = 0 AND o_orderkey % 10 <> 0
             |       THEN 'delete' ELSE 'upsert' END AS change_type,
             |  CAST(CASE WHEN o_orderkey % 10 = 0 THEN 4
             |            WHEN o_orderkey % 5 = 0 THEN 3
             |            ELSE 2 END AS BIGINT) AS commit_version
             |FROM orders
             |WHERE o_orderkey % 6 = 0 OR o_orderkey % 5 = 0""".stripMargin),
      "outbound incremental changefeed from the log mirror: net " +
        "per-key changes after a consumer checkpoint, delta-segment " +
        "reads only"),

    // SCD2 history: every alive version of a key becomes an interval
    // row; the fixture's modulo script makes the full expected history
    // derivable in SQL (FIXTURES.md §B). Deletes close intervals but
    // emit no row; the current version has valid_to NULL.
    Q("cdc_scd2_history",
      (s, d) => Materialize.history(unwrapped(s, d), Seq("id"))
        .select(col("id"), col("o_orderstatus"), col("o_totalprice"),
          col("valid_from"), col("valid_to")),
      Some("""WITH base AS (
             |  SELECT o_orderkey AS id, o_orderstatus, o_totalprice
             |  FROM orders)
             |SELECT id, o_orderstatus, o_totalprice,
             |  CAST(1000 AS BIGINT) AS valid_from,
             |  CAST(CASE WHEN id % 3 = 0 THEN 2000
             |            WHEN id % 5 = 0 THEN 4000 END AS BIGINT) AS valid_to
             |FROM base
             |UNION ALL
             |SELECT id, 'U1', o_totalprice * 1.1, CAST(2000 AS BIGINT),
             |  CAST(CASE WHEN id % 6 = 0 THEN 3000
             |            WHEN id % 5 = 0 THEN 4000 END AS BIGINT)
             |FROM base WHERE id % 3 = 0
             |UNION ALL
             |SELECT id, 'U2', o_totalprice * 1.2, CAST(3000 AS BIGINT),
             |  CAST(CASE WHEN id % 5 = 0 THEN 4000 END AS BIGINT)
             |FROM base WHERE id % 6 = 0
             |UNION ALL
             |SELECT id, 'RE', o_totalprice, CAST(5000 AS BIGINT),
             |  CAST(NULL AS BIGINT)
             |FROM base WHERE id % 10 = 0""".stripMargin),
      "type-2 dimension history from the change stream: one lead() " +
        "window pass per key; deletes close intervals, current rows " +
        "stay open"),

    // BITEMPORAL as-of read (Snodgrass): two independent time axes —
    // TRANSACTION time (when the warehouse learned it) and VALID time
    // (when it was true in the world) — so a retroactive correction
    // recorded at tx 3 changes what "valid at 1500" returns AS OF tx 3
    // without rewriting what AS OF tx 2 returned: the reproducibility
    // contract audit trails and ML feature stores need (train at tx 2,
    // explain later at tx 3, both answers stay derivable). The read is
    // NOT an interval theta join: per (T, V) probe the winner is
    // max(tx) among versions visible on both axes — packed with its
    // payload cents into ONE long so the argmax stays a plain
    // hash-aggregable max (the struct-ordering trap avoided); shuffle
    // keys on (T, V, id), output O(probes). Version derivation is
    // deterministic from orders (v1 everywhere; v2 supersedes on the
    // valid axis for id%3=0; v3 is a RETROACTIVE correction of v1's
    // interval recorded at tx 3 for id%4=0), cents stay integer via
    // DIV-10 scaling, so every probe value-checks.
    Q("cdc_bitemporal_asof",
      (s, d) => {
        val base = load(s, d, "orders").select(
          col("o_orderkey").as("id"),
          round(col("o_totalprice") * 100).cast("long").as("c"))
        // (tx_from, tx_to, valid_from, valid_to, cents)
        val v1 = base.select(col("id"), lit(1L).as("tx_from"),
          when(col("id") % 4 === 0, 3L).as("tx_to"),
          lit(1000L).as("valid_from"),
          when(col("id") % 3 === 0, 2000L).as("valid_to"), col("c"))
        val v2 = base.filter(col("id") % 3 === 0)
          .select(col("id"), lit(2L).as("tx_from"),
            lit(null).cast("long").as("tx_to"),
            lit(2000L).as("valid_from"), lit(null).cast("long").as("valid_to"),
            expr("(c * 11) DIV 10").as("c"))
        val v3 = base.filter(col("id") % 4 === 0)
          .select(col("id"), lit(3L).as("tx_from"),
            lit(null).cast("long").as("tx_to"),
            lit(1000L).as("valid_from"),
            when(col("id") % 3 === 0, 2000L).as("valid_to"),
            expr("(c * 9) DIV 10").as("c"))
        val versions = v1.unionByName(v2).unionByName(v3)
        val probes = s.createDataFrame(
          java.util.Arrays.asList(
            org.apache.spark.sql.Row(2L, 1500L),
            org.apache.spark.sql.Row(3L, 1500L),
            org.apache.spark.sql.Row(3L, 2500L)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("t",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("v",
              org.apache.spark.sql.types.LongType))))
        graft.cdc.Materialize.bitemporalAsOf(versions, probes)
          .groupBy(col("t"), col("v"))
          .agg(count(lit(1)).as("n"), sum(col("c")).as("total_cents"))
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey AS id,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS c
             |  FROM orders),
             |versions AS (
             |  SELECT id, CAST(1 AS BIGINT) AS tx_from,
             |    CASE WHEN id % 4 = 0 THEN CAST(3 AS BIGINT) END AS tx_to,
             |    CAST(1000 AS BIGINT) AS valid_from,
             |    CASE WHEN id % 3 = 0 THEN CAST(2000 AS BIGINT) END
             |      AS valid_to,
             |    c FROM base
             |  UNION ALL
             |  SELECT id, 2, NULL, 2000, NULL, (c * 11) // 10
             |  FROM base WHERE id % 3 = 0
             |  UNION ALL
             |  SELECT id, 3, NULL, 1000,
             |    CASE WHEN id % 3 = 0 THEN CAST(2000 AS BIGINT) END,
             |    (c * 9) // 10
             |  FROM base WHERE id % 4 = 0),
             |probes AS (
             |  SELECT 2 AS t, 1500 AS v
             |  UNION ALL SELECT 3, 1500 UNION ALL SELECT 3, 2500),
             |winners AS (
             |  SELECT t, v, id,
             |    max(tx_from * 4294967296 + c) AS pk
             |  FROM versions CROSS JOIN probes
             |  WHERE tx_from <= t AND (tx_to IS NULL OR t < tx_to)
             |    AND valid_from <= v AND (valid_to IS NULL OR v < valid_to)
             |  GROUP BY 1, 2, 3)
             |SELECT CAST(t AS BIGINT) AS t, CAST(v AS BIGINT) AS v,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(pk % 4294967296) AS BIGINT) AS total_cents
             |FROM winners GROUP BY 1, 2""".stripMargin),
      "bitemporal as-of: transaction-time × valid-time probes with a " +
        "packed-long max(tx) winner per entity — retroactive " +
        "corrections change later transaction views only; hash-agg, " +
        "no interval theta join"),

    // Point-in-time training-set assembly — the feature-store join: for
    // every (entity, label_ts) example, attach the feature row that was
    // CURRENT at label_ts, never a later one (leakage) and never an
    // expired one (resurrecting deleted state). Composition, not a new
    // operator: the SCD2 history's non-overlapping validity intervals
    // turn "interval containing ts" into an AS-OF lookup (latest
    // valid_from <= ts) plus a validity check (ts < valid_to) — ONE
    // keyed exchange + sort via AsofJoin, no range-join explosion, no
    // per-example rescan of the history. Labels at 1500/2500/3500/4500
    // sample every fixture generation, including the deleted window
    // (features null — the example survives, its features don't leak).
    Q("cdc_pit_features",
      (s, d) => {
        val hist = Materialize.history(unwrapped(s, d), Seq("id"))
          .select(col("id"), col("o_orderstatus"), col("o_totalprice"),
            col("valid_from"), col("valid_to"))
        val labels = graft.core.Tables.load(s, d, "orders")
          .filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey").as("entity_id"),
            (lit(1500L) + (col("o_orderkey") % 8) * 500).as("label_ts"))
        val valid = col("valid_to").isNull || col("label_ts") < col("valid_to")
        AsofJoin(labels, hist, "entity_id", "id", "label_ts", "valid_from",
            Seq("o_orderstatus", "o_totalprice", "valid_to"))
          .select(col("entity_id"), col("label_ts"),
            when(valid, col("o_orderstatus")).as("status"),
            when(valid, col("o_totalprice")).as("price"))
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey AS id, o_orderstatus, o_totalprice
             |  FROM orders),
             |hist AS (
             |  SELECT id, o_orderstatus, o_totalprice,
             |    CAST(1000 AS BIGINT) AS valid_from,
             |    CAST(CASE WHEN id % 3 = 0 THEN 2000
             |              WHEN id % 5 = 0 THEN 4000 END AS BIGINT) AS valid_to
             |  FROM base
             |  UNION ALL
             |  SELECT id, 'U1', o_totalprice * 1.1, CAST(2000 AS BIGINT),
             |    CAST(CASE WHEN id % 6 = 0 THEN 3000
             |              WHEN id % 5 = 0 THEN 4000 END AS BIGINT)
             |  FROM base WHERE id % 3 = 0
             |  UNION ALL
             |  SELECT id, 'U2', o_totalprice * 1.2, CAST(3000 AS BIGINT),
             |    CAST(CASE WHEN id % 5 = 0 THEN 4000 END AS BIGINT)
             |  FROM base WHERE id % 6 = 0
             |  UNION ALL
             |  SELECT id, 'RE', o_totalprice, CAST(5000 AS BIGINT),
             |    CAST(NULL AS BIGINT)
             |  FROM base WHERE id % 10 = 0),
             |labels AS (
             |  SELECT o_orderkey AS entity_id,
             |    CAST(1500 + (o_orderkey % 8) * 500 AS BIGINT) AS label_ts
             |  FROM orders WHERE o_orderkey % 2 = 0)
             |SELECT l.entity_id, l.label_ts,
             |  h.o_orderstatus AS status, h.o_totalprice AS price
             |FROM labels l LEFT JOIN hist h
             |  ON h.id = l.entity_id AND h.valid_from <= l.label_ts
             |  AND (h.valid_to IS NULL OR l.label_ts < h.valid_to)""".stripMargin),
      "point-in-time feature join: as-of lookup against SCD2 validity " +
        "intervals — no label leakage, no resurrection of deleted state, " +
        "one keyed exchange"),

    Q("cdc_join_view",
      (s, d) => {
        // Incrementally-maintained JOIN view: orders (fact) and
        // customer (dim) each live as CDC log mirrors fed in three
        // scripted waves; a maintenance poll runs BETWEEN waves, so the
        // final view state is reached through the delta rule (fact feed
        // ⋈ current dim, dim-touched keys re-derived, deletes on both
        // sides), never a full recompute after wave 0. Oracle = the
        // plain SQL join of the two final states.
        val view = runJoinViewWaves(s, d)
        graft.sinks.IncrementalJoinView.read(s, view)
      },
      Some("""SELECT o.o_orderkey, o.o_custkey,
             |  CASE WHEN o.o_orderkey % 4 = 0 THEN o.o_totalprice * 1.05
             |       ELSE o.o_totalprice END AS o_totalprice,
             |  CASE WHEN c.c_custkey % 7 = 0 THEN 'MOVED'
             |       ELSE c.c_mktsegment END AS c_mktsegment
             |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |WHERE o.o_orderkey % 9 <> 0 AND c.c_custkey % 13 <> 0""".stripMargin),
      "incrementally-maintained fact⋈dim view over two CDC mirrors: " +
        "delta maintenance (feed ⋈ current dim + dim-touched re-derive) " +
        "across three change waves == the full-join recompute"),

    Q("cdc_agg_view",
      (s, d) => {
        // Incrementally-maintained GROUP-BY view over the orders log
        // mirror, maintained through every path the operator has: the
        // fixture's five waves merge at maxDeltas=3 with a poll between
        // each, so the run covers (0) the initial snapshot, (1) an
        // incremental poll where U1 MOVES %3 keys into a new status
        // group — their old groups retract via the key→group sidecar
        // map, (2) a retention-lost resnapshot when wave 2's merge
        // folds the deltas past the checkpoint, (3) an incremental
        // delete wave whose tombstones find their groups in the map,
        // and (4) an incremental poll where the re-insert wave births
        // the 'RE' group. Final view state must equal the one-shot
        // GROUP BY over the materialized mirror the oracle derives
        // from `orders`.
        val root = java.nio.file.Files
          .createTempDirectory("graft-aggview-q").toString
        val (src, view) = (s"$root/src", s"$root/view")
        val all = unwrapped(s, d)
        import graft.sinks.{IncrementalAggView, LogMirror}
        val aggs = Seq(sum(col("o_totalprice")).as("sum_price"),
          count(lit(1)).as("n_rows"), max(col("id")).as("max_id"))
        Seq(1000L, 2000L, 3000L, 4000L, 5000L).zipWithIndex.foreach {
          case (ts, i) =>
            LogMirror.merge(s, src, all.filter(col("ts_ms") === ts),
              Seq("id"), i.toLong, maxDeltas = 3, bucketCount = None)
            IncrementalAggView.poll(s, src, view,
              Seq("o_orderstatus"), aggs)
        }
        IncrementalAggView.read(s, view)
          .select(col("o_orderstatus"),
            round(col("sum_price"), 1).as("sum_price"),
            col("n_rows"), col("max_id"))
      },
      Some(s"""WITH fin AS ($oracleFinalState)
              |SELECT o_orderstatus, round(sum(o_totalprice), 1) AS sum_price,
              |  count(*) AS n_rows, max(id) AS max_id
              |FROM fin GROUP BY 1""".stripMargin),
      "incrementally-maintained aggregate view over the log mirror's " +
        "changefeed: dirty-group recompute (moves retract via the " +
        "key→group map, deletes find their group there) across five " +
        "change waves and a mid-stream fold == the one-shot GROUP BY"),

    // Chained incremental star rollup: fact⋈dim JOIN view → GROUP-BY
    // view, BOTH maintained incrementally — the view composition claim
    // (a maintained view is itself a LogMirror, so anything that
    // consumes a mirror's changefeed can ride a view) proven end to
    // end. The agg view groups by the DIM attribute (c_mktsegment), the
    // star-schema stress case: a dim-side update moves every joined
    // fact row of that customer into a NEW group — the join view
    // re-derives the touched keys, its changefeed emits their
    // post-images, and the agg view's key→group sidecar retracts the
    // old segment's contribution. Poll cost at every step ∝ changed
    // rows, never a view or mirror rescan; the oracle is the one-shot
    // GROUP BY over the plain SQL join of the final states.
    Q("cdc_star_rollup_view",
      (s, d) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-starrollup-q").toString
        val rollup = s"$root/rollup"
        import graft.sinks.IncrementalAggView
        val aggs = Seq(sum(col("o_totalprice")).as("sum_price"),
          count(lit(1)).as("n_orders"))
        runJoinViewWaves(s, d, afterPoll = view =>
          IncrementalAggView.poll(s, view, rollup,
            Seq("c_mktsegment"), aggs))
        IncrementalAggView.read(s, rollup)
          .select(col("c_mktsegment"),
            round(col("sum_price"), 1).as("sum_price"), col("n_orders"))
      },
      Some("""WITH joined AS (
             |  SELECT CASE WHEN o.o_orderkey % 4 = 0 THEN o.o_totalprice * 1.05
             |              ELSE o.o_totalprice END AS o_totalprice,
             |    CASE WHEN c.c_custkey % 7 = 0 THEN 'MOVED'
             |         ELSE c.c_mktsegment END AS c_mktsegment
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  WHERE o.o_orderkey % 9 <> 0 AND c.c_custkey % 13 <> 0)
             |SELECT c_mktsegment, round(sum(o_totalprice), 1) AS sum_price,
             |  count(*) AS n_orders
             |FROM joined GROUP BY 1""".stripMargin),
      "chained incremental views: fact⋈dim join view feeding a " +
        "dim-attribute rollup view, both delta-maintained across three " +
        "change waves == the one-shot GROUP BY over the full join"),

    // Incrementally-maintained LEADERBOARD (top-k per group) — the view
    // shape plain delta rules cannot keep correct: when a leader is
    // deleted or demoted, the replacement is NOT in the change feed (it
    // was previously rank k+1, invisible). The dirty-group-recompute
    // rule handles it by construction — a touched group re-derives its
    // top-k from source current state — and the bounded TopK Aggregator
    // keeps the recompute itself map-side-partial (≤ k rows per group
    // per partition cross the wire, never the group's history). The
    // fixture's five waves demote leaders via %3/%6 status moves AND
    // delete %5 keys (leaders among them), so both invalidation paths
    // are exercised before the final read.
    Q("cdc_topk_view",
      (s, d) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-topkview-q").toString
        val (src, view) = (s"$root/src", s"$root/view")
        val all = unwrapped(s, d)
        import graft.sinks.{IncrementalAggView, LogMirror}
        import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
        val fn = udaf(new graft.functions.TopK.TopKAggregator(3),
          ExpressionEncoder[graft.functions.TopK.ScoredId]())
        val aggs = Seq(
          fn(col("o_totalprice").cast("double"), col("id").cast("long"))
            .as("top3"))
        Seq(1000L, 2000L, 3000L, 4000L, 5000L).zipWithIndex.foreach {
          case (ts, i) =>
            LogMirror.merge(s, src, all.filter(col("ts_ms") === ts),
              Seq("id"), i.toLong, maxDeltas = 16, bucketCount = None)
            IncrementalAggView.poll(s, src, view,
              Seq("o_orderstatus"), aggs)
        }
        IncrementalAggView.read(s, view)
          .select(col("o_orderstatus"), posexplode(col("top3")).as(Seq("rank", "e")))
          .select(col("o_orderstatus"), col("rank").cast("int").as("rank"),
            col("e.score").as("score"), col("e.id").as("id"))
      },
      Some(s"""WITH fin AS ($oracleFinalState),
              |ranked AS (
              |  SELECT o_orderstatus, o_totalprice, id,
              |    row_number() OVER (PARTITION BY o_orderstatus
              |      ORDER BY o_totalprice DESC, id) AS rk
              |  FROM fin)
              |SELECT o_orderstatus, CAST(rk - 1 AS INTEGER) AS rank,
              |  o_totalprice AS score, id
              |FROM ranked WHERE rk <= 3""".stripMargin),
      "incrementally-maintained top-k-per-group view: dirty-group " +
        "recompute repairs deleted/demoted leaders from source state; " +
        "bounded TopK Aggregator keeps the recompute map-side-partial"),

    // Cross-table consistent snapshot read: batch 0 lands orders AND
    // customer and commits SNAP-0; batch 1 then merges an orders
    // repricing but CRASHES before customer merged — no snapshot.
    // A snapshot reader joining the two tables must see the COMPLETE
    // batch-0 cut (original prices), not orders@1 ⋈ customer@0; the
    // on-disk orders mirror HAS the new prices (a live read would leak
    // them — the torn window the per-table JDBC sink of the reference
    // lives with). Oracle = the join over the ORIGINAL tables.
    Q("cdc_snapshot_read",
      (s, d) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-snapread-q").toString
        import graft.sinks.{LogMirror, SnapshotCatalog}
        val orders = graft.core.Tables.load(s, d, "orders")
        val cust = graft.core.Tables.load(s, d, "customer")
        def ordWave(df: org.apache.spark.sql.DataFrame, price: org.apache.spark.sql.Column,
                    op: String, ts: Long) =
          df.select(col("o_orderkey").as("id"), col("o_custkey"),
            price.as("o_totalprice"), lit(op).as("op"), lit(ts).as("ts_ms"),
            lit("t").as("topic"), lit(0).as("partition"),
            col("o_orderkey").as("offset"))
        LogMirror.merge(s, s"$root/orders",
          ordWave(orders, col("o_totalprice"), "r", 1000L), Seq("id"), 0L, 16, None)
        LogMirror.merge(s, s"$root/customer",
          cust.select(col("c_custkey").as("id"), col("c_mktsegment"),
            lit("r").as("op"), lit(1000L).as("ts_ms"), lit("t").as("topic"),
            lit(0).as("partition"), col("c_custkey").as("offset")),
          Seq("id"), 0L, 16, None)
        SnapshotCatalog.commit(s, root, 0L, Seq("orders", "customer"))
        // batch 1: repricing merged into orders only, then crash — the
        // snapshot for batch 1 is never committed
        LogMirror.merge(s, s"$root/orders",
          ordWave(orders.filter(col("o_orderkey") % 4 === 0),
            col("o_totalprice") * 1.05, "u", 2000L), Seq("id"), 1L, 16, None)
        SnapshotCatalog.readTable(s, root, "orders").as("o")
          .join(SnapshotCatalog.readTable(s, root, "customer").as("c"),
            col("o.o_custkey") === col("c.id"))
          .groupBy(col("c.c_mktsegment"))
          .agg(round(sum(col("o.o_totalprice")), 1).as("revenue"),
            count(lit(1)).as("n_orders"))
      },
      Some("""SELECT c_mktsegment, round(sum(o_totalprice), 1) AS revenue,
             |  count(*) AS n_orders
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1""".stripMargin),
      "consistent snapshot read: a torn batch (orders merged, customer " +
        "not, no snapshot) stays invisible — the reader gets the " +
        "complete previous cut, value-checked against the original join"),

    // Point lookups against the log mirror — the OLTP-shaped read a
    // replication target must serve without scanning: the base read
    // prunes to the key's bucket partition (directory-level), deltas
    // prune by row-group stats (segments are key-sorted), then the
    // handful of surviving rows reconcile. Probes three key classes:
    // an updated key (latest version wins), a deleted key (tombstone →
    // no row), and a never-existed key. O(bucket + delta row groups)
    // per probe, never O(table).
    Q("cdc_point_lookup",
      (s, d) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-lookup-q").toString
        import graft.sinks.LogMirror
        val all = unwrapped(s, d)
        Seq(1000L, 2000L, 3000L, 4000L, 5000L).zipWithIndex.foreach {
          case (ts, i) =>
            LogMirror.merge(s, root, all.filter(col("ts_ms") === ts),
              Seq("id"), i.toLong, maxDeltas = 16, bucketCount = Some(8))
        }
        // id=6 → updated twice (U2 at ts3000); id=5 → deleted at ts4000
        // (not re-inserted: 5 % 10 != 0); id=-1 → never existed
        Seq(6L, 5L, -1L).map { k =>
          LogMirror.lookup(s, root, Seq("id"), Seq(k))
            .select(lit(k).as("probe"), col("id"),
              col("o_orderstatus"), col("o_totalprice"))
        }.reduce(_ unionByName _)
      },
      Some(s"""WITH fin AS ($oracleFinalState),
              |probes AS (SELECT * FROM (VALUES (CAST(6 AS BIGINT)),
              |  (CAST(5 AS BIGINT)), (CAST(-1 AS BIGINT))) t(probe))
              |SELECT p.probe, f.id, f.o_orderstatus, f.o_totalprice
              |FROM probes p JOIN fin f ON f.id = p.probe""".stripMargin),
      "bucket- and stats-pruned point lookups on the log mirror: " +
        "updated key resolves to its latest version, deleted key to " +
        "nothing, unknown key to nothing"),

    // SCD2 history COMPACTION — the maintenance op every type-2
    // dimension eventually needs: upstream CDC emits version rows for
    // updates that didn't change any TRACKED column (untracked-column
    // churn, connector re-snapshots), and each no-op version bloats
    // the history and splits validity intervals that should be one.
    // Compaction is gaps-and-islands: per key in valid_from order,
    // flag payload changes (null-safe vs lag), running-sum flags into
    // island ids, collapse each island to [min(valid_from), last
    // valid_to] — an interval stays OPEN (null) if any member was
    // open. One (key)-keyed window + one (key, island) aggregate —
    // shuffle ∝ versions, group-bounded sorts, no self-join. The
    // version fixture plants both no-op churn (25% re-emit at t=2000,
    // 12.5% at t=4000) and real changes (50% repriced at t=3000), so
    // merged AND unmerged islands are live; n_merged counts the
    // collapsed rows.
    Q("cdc_scd2_compact",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // the four version branches each re-read base — persist once
        val base = persistOnce(load(s, d, "orders")
          .select(col("o_orderkey").as("id"),
            col("o_orderstatus").as("status"),
            round(col("o_totalprice") * 100).cast("long").as("price_c")))
        def v(vf: Long, f: DataFrame): DataFrame =
          f.withColumn("valid_from", lit(vf))
        val versions = v(1000L, base)
          .unionByName(v(2000L, base.filter(col("id") % 4 === 0)))
          .unionByName(v(3000L, base.filter(col("id") % 2 === 0)
            .withColumn("price_c", expr("price_c * 11 div 10"))))
          // id%8==0 implies id%2==0, so every t=4000 row repeats the
          // t=3000 repricing — pure no-op churn by construction
          .unionByName(v(4000L, base.filter(col("id") % 8 === 0)
            .withColumn("price_c", expr("price_c * 11 div 10"))))
        val wk = Window.partitionBy(col("id")).orderBy(col("valid_from"))
        versions
          .withColumn("valid_to", lead(col("valid_from"), 1).over(wk))
          .withColumn("chg",
            when(row_number().over(wk) === 1, 1L)
              // null-safe compares: a tracked column transitioning
              // to/from NULL is a real change, not a merge
              .otherwise(when(
                not(col("status") <=> lag(col("status"), 1).over(wk)) ||
                  not(col("price_c") <=> lag(col("price_c"), 1).over(wk)), 1L)
                .otherwise(0L)))
          .withColumn("island", sum(col("chg")).over(
            wk.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("id"), col("island"))
          .agg(max(col("status")).as("status"),
            max(col("price_c")).as("price_c"),
            min(col("valid_from")).as("valid_from"),
            when(max(col("valid_to").isNull.cast("int")) === 1, lit(null))
              .otherwise(max(col("valid_to"))).cast("long").as("valid_to"),
            (count(lit(1)) - 1).as("n_merged"))
          .select(col("id"), col("status"), col("price_c"),
            col("valid_from"), col("valid_to"), col("n_merged"))
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey AS id, o_orderstatus AS status,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
             |  FROM orders),
             |versions AS (
             |  SELECT id, status, price_c, CAST(1000 AS BIGINT) AS valid_from
             |    FROM base
             |  UNION ALL
             |  SELECT id, status, price_c, 2000 FROM base WHERE id % 4 = 0
             |  UNION ALL
             |  SELECT id, status, price_c * 11 // 10, 3000 FROM base
             |    WHERE id % 2 = 0
             |  UNION ALL
             |  SELECT id, status, price_c * 11 // 10, 4000
             |    FROM base WHERE id % 8 = 0),
             |seq AS (
             |  SELECT *,
             |    lead(valid_from) OVER w AS valid_to,
             |    CASE WHEN row_number() OVER w = 1 THEN 1
             |         WHEN status IS DISTINCT FROM lag(status) OVER w
             |           OR price_c IS DISTINCT FROM lag(price_c) OVER w
             |           THEN 1
             |         ELSE 0 END AS chg
             |  FROM versions
             |  WINDOW w AS (PARTITION BY id ORDER BY valid_from)),
             |isl AS (
             |  SELECT *, sum(chg) OVER (PARTITION BY id ORDER BY valid_from
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             |  FROM seq)
             |SELECT id, max(status) AS status,
             |  CAST(max(price_c) AS BIGINT) AS price_c,
             |  CAST(min(valid_from) AS BIGINT) AS valid_from,
             |  CAST(CASE WHEN max(CASE WHEN valid_to IS NULL THEN 1 ELSE 0
             |    END) = 1 THEN NULL ELSE max(valid_to) END AS BIGINT)
             |    AS valid_to,
             |  CAST(count(*) - 1 AS BIGINT) AS n_merged
             |FROM isl GROUP BY id, island""".stripMargin),
      "SCD2 history compaction: gaps-and-islands collapse of no-op " +
        "version churn — one keyed window + one aggregate, open " +
        "intervals stay open, n_merged counts removed bloat"),

    // Temporal ALIGNMENT of two version histories (the Snodgrass
    // temporal join): attribute A (status) and attribute B (price)
    // version independently; reporting needs ONE history whose
    // segments hold both values — the operation behind "join two SCD2
    // dimensions" and bitemporal reconstruction. Algorithm that
    // survives scale: per key, segment starts = the union of both
    // sides' valid_from boundaries (distinct + lead window), then each
    // side attaches by a backward AS-OF lookup — three key-partitioned
    // passes, no interval×interval theta join, output ∝ segments.
    // B's history STARTS LATER than A's (t=2000 vs 1000), so the
    // leading segments carry a null price — the null branch is live,
    // not an accident. Oracle: DuckDB's own ASOF LEFT JOINs — an
    // independent formulation of the same contract.
    Q("cdc_temporal_align",
      (s, d) => {
        val base = persistOnce(load(s, d, "orders")
          .select(col("o_orderkey").as("id"),
            col("o_orderstatus").as("status"),
            round(col("o_totalprice") * 100).cast("long").as("price_c")))
        val histA = base.select(col("id"), col("status"),
            lit(1000L).as("vf"))
          .unionByName(base.filter(col("id") % 3 === 0)
            .select(col("id"), concat(lit("S2-"), col("status")).as("status"),
              lit(2500L).as("vf")))
        val histB = base.select(col("id"), col("price_c"),
            lit(2000L).as("vf"))
          .unionByName(base.filter(col("id") % 2 === 0)
            .select(col("id"), expr("price_c * 11 div 10").as("price_c"),
              lit(3000L).as("vf")))
        val bounds = histA.select(col("id"), col("vf"))
          .unionByName(histB.select(col("id"), col("vf")))
          .distinct()
        val segs = bounds.withColumn("seg_to",
          lead(col("vf"), 1).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("id")).orderBy(col("vf"))))
          .select(col("id"), col("vf").as("seg_from"), col("seg_to"))
        val withA = AsofJoin(segs, histA.select(col("id").as("a_id"),
            col("vf").as("a_vf"), col("status")),
          "id", "a_id", "seg_from", "a_vf", Seq("status"))
        AsofJoin(withA, histB.select(col("id").as("b_id"),
            col("vf").as("b_vf"), col("price_c")),
          "id", "b_id", "seg_from", "b_vf", Seq("price_c"))
          .select(col("id"), col("seg_from"), col("seg_to"),
            col("status"), col("price_c"))
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey AS id, o_orderstatus AS status,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
             |  FROM orders),
             |ha AS (
             |  SELECT id, status, CAST(1000 AS BIGINT) AS vf FROM base
             |  UNION ALL
             |  SELECT id, 'S2-' || status, 2500 FROM base WHERE id % 3 = 0),
             |hb AS (
             |  SELECT id, price_c, CAST(2000 AS BIGINT) AS vf FROM base
             |  UNION ALL
             |  SELECT id, price_c * 11 // 10, 3000 FROM base
             |  WHERE id % 2 = 0),
             |seg AS (
             |  SELECT id, vf AS seg_from,
             |    lead(vf) OVER (PARTITION BY id ORDER BY vf) AS seg_to
             |  FROM (SELECT DISTINCT id, vf FROM (
             |    SELECT id, vf FROM ha UNION ALL SELECT id, vf FROM hb))),
             |wa AS (
             |  SELECT s.id, s.seg_from, s.seg_to, a.status
             |  FROM seg s ASOF LEFT JOIN ha a
             |    ON s.id = a.id AND s.seg_from >= a.vf)
             |SELECT w.id, w.seg_from, w.seg_to, w.status, b.price_c
             |FROM wa w ASOF LEFT JOIN hb b
             |  ON w.id = b.id AND w.seg_from >= b.vf""".stripMargin),
      "temporal alignment of two SCD2 histories: boundary union + two " +
        "backward as-of lookups — segments ∝ version count, no " +
        "interval theta join; DuckDB ASOF is the independent oracle"),

    // Debezium TRANSACTION-BOUNDARY assembly (provide.transaction.
    // metadata=true): data events carry transaction.id, a separate
    // transaction topic declares per-txn event counts on END, and a
    // consistency-demanding consumer releases a transaction's events
    // only when all declared events have arrived. Fixture: the wave
    // script groups 256 consecutive keys per wave into one txn; the
    // "lost" events (keys % 251 == 0 — a connector hiccup) make some
    // transactions incomplete. Shape that scales: one hash-agg per
    // stream at txn grain + one aggregate-grain equi-join — no
    // per-event state, no sort; buffering in the streaming analogue is
    // per-open-txn, not per-event.
    Q("cdc_txn_boundaries",
      (s, d) => {
        val o = load(s, d, "orders").select(col("o_orderkey").as("id"))
        def wave(w: Int, keep: org.apache.spark.sql.Column) =
          o.filter(keep).select(col("id"), lit(w).as("wave"))
        val ev = wave(0, lit(true))
          .unionByName(wave(1, col("id") % 3 === 0))
          .unionByName(wave(2, col("id") % 6 === 0))
          .unionByName(wave(3, col("id") % 5 === 0))
          .unionByName(wave(4, col("id") % 10 === 0))
          .withColumn("txn_id",
            col("wave").cast("long") * 10000000L + expr("id div 256"))
        val declared = ev.groupBy(col("txn_id"))
          .agg(count(lit(1)).as("declared"))
        val seen = ev.filter(col("id") % 251 =!= 0)
          .groupBy(col("txn_id")).agg(count(lit(1)).as("seen"))
        declared.join(seen, Seq("txn_id"), "left")
          .select(col("txn_id"), col("declared"),
            coalesce(col("seen"), lit(0L)).as("seen"),
            when(coalesce(col("seen"), lit(0L)) === col("declared"), 1L)
              .otherwise(0L).as("complete"))
      },
      Some("""WITH ev AS (
             |  SELECT o_orderkey AS id, w.wave
             |  FROM orders, (VALUES (0),(1),(2),(3),(4)) AS w(wave)
             |  WHERE w.wave = 0
             |     OR (w.wave = 1 AND o_orderkey % 3 = 0)
             |     OR (w.wave = 2 AND o_orderkey % 6 = 0)
             |     OR (w.wave = 3 AND o_orderkey % 5 = 0)
             |     OR (w.wave = 4 AND o_orderkey % 10 = 0)),
             |t AS (
             |  SELECT CAST(wave AS BIGINT) * 10000000 + id // 256 AS txn_id,
             |    id
             |  FROM ev),
             |decl AS (
             |  SELECT txn_id, count(*) AS declared FROM t GROUP BY 1),
             |seen AS (
             |  SELECT txn_id, count(*) AS seen FROM t
             |  WHERE id % 251 <> 0 GROUP BY 1)
             |SELECT d.txn_id, d.declared,
             |  coalesce(s.seen, 0) AS seen,
             |  CAST(CASE WHEN coalesce(s.seen, 0) = d.declared
             |       THEN 1 ELSE 0 END AS BIGINT) AS complete
             |FROM decl d LEFT JOIN seen s USING (txn_id)""".stripMargin),
      "Debezium transaction metadata: declared END counts vs arrived " +
        "events per txn, completeness gate — two txn-grain hash aggs + " +
        "one aggregate-grain join, no per-event buffering"),

    // Debezium OUTBOX EVENT ROUTER (the transactional-outbox pattern's
    // SMT): an outbox table row (aggregatetype, aggregateid, type,
    // payload JSON) routes to topic 'outbox.event.<aggregatetype>'
    // with key = aggregateid and value = the HOISTED payload; the
    // consumer re-expands the payload. The rollup sums a payload field
    // PARSED BACK from the routed value — so the route + hoist + JSON
    // round-trip is what's value-checked, in exact integer cents. All
    // map-side until one topic-grain agg (3 groups).
    Q("cdc_outbox_route",
      (s, d) => {
        val outbox = load(s, d, "orders").select(
          col("o_orderkey").as("id"),
          element_at(
            array(lit("order"), lit("invoice"), lit("shipment")),
            (col("o_orderkey") % 3 + 1).cast("int")).as("aggregatetype"),
          col("o_custkey").as("aggregateid"),
          to_json(struct(col("o_orderkey").as("orderkey"),
            col("o_totalprice").as("total"))).as("payload"))
        val routed = outbox.select(
          concat(lit("outbox.event."), col("aggregatetype")).as("topic"),
          col("aggregateid").as("key"),
          col("payload").as("value"))
        val valueSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("orderkey",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("total",
            org.apache.spark.sql.types.DoubleType)))
        routed
          .withColumn("p", from_json(col("value"), valueSchema))
          .groupBy(col("topic"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("key")).as("n_keys"),
            sum(round(col("p.total") * 100).cast("long")).as("total_cents"))
      },
      Some("""SELECT
             |  'outbox.event.' ||
             |    CASE o_orderkey % 3 WHEN 0 THEN 'order'
             |      WHEN 1 THEN 'invoice' ELSE 'shipment' END AS topic,
             |  count(*) AS n_events,
             |  count(DISTINCT o_custkey) AS n_keys,
             |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |    AS BIGINT) AS total_cents
             |FROM orders
             |GROUP BY 1""".stripMargin),
      "outbox event router SMT: aggregatetype->topic, aggregateid->key, " +
        "payload hoisted to the value and re-expanded by the consumer — " +
        "map-side route + parse, one 3-group agg; cents stay integer " +
        "through the JSON round-trip"),

    // DBLog-style INCREMENTAL SNAPSHOT (Debezium's ad-hoc snapshot
    // algorithm, Andradas & al. "DBLog", arXiv:2010.12597): key-range
    // chunks are selected WHILE the change stream flows; each chunk's
    // select is bracketed by low/high watermarks written into the
    // stream, and any chunk row whose key also appears as a change
    // event inside (lw, hw] is SUPPRESSED — the stream's copy is
    // fresher. Fixture: chunks of 512 keys; chunk c's watermark window
    // is [1500+(c%8)*500, +499], so successive chunks bracket
    // different update waves. The implementation is script-agnostic:
    // per-key cutoff filter + latest-per-key (one id-keyed hash agg
    // with map-side combine) + chunk-grain rollup; the oracle derives
    // the same counts from the wave arithmetic. The per-chunk output
    // (rows read at hw, rows suppressed by the window, rows emitted)
    // is exactly the DBLog progress report.
    Q("cdc_incremental_snapshot",
      (s, d) => {
        val ev = unwrapped(s, d)
          .select(col("id"), col("op"), col("ts_ms"), col("offset"))
          .withColumn("chunk", expr("id div 512"))
          .withColumn("hw", lit(1999L) + (col("chunk") % 8) * 500L)
        val perKey = ev
          .filter(col("ts_ms") <= col("hw")) // chunk select reads state at hw
          .groupBy(col("id"), col("chunk"), col("hw"))
          .agg(
            max_by(col("op"), struct(col("ts_ms"), col("offset")))
              .as("last_op"),
            max(when(col("ts_ms") >= col("hw") - 499L, 1L).otherwise(0L))
              .as("in_window"))
        perKey.filter(col("last_op") =!= "d")
          .groupBy(col("chunk"))
          .agg(count(lit(1)).as("n_read"),
            sum(col("in_window")).as("n_suppressed"),
            (count(lit(1)) - sum(col("in_window"))).as("n_emitted"))
      },
      Some("""WITH k AS (
             |  SELECT o_orderkey AS id, o_orderkey // 512 AS chunk,
             |    1500 + ((o_orderkey // 512) % 8) * 500 AS lw
             |  FROM orders),
             |f AS (SELECT id, chunk, lw, lw + 499 AS hw FROM k),
             |flags AS (
             |  SELECT chunk,
             |    CASE WHEN hw >= 5000 AND id % 10 = 0 THEN 1
             |         WHEN hw >= 4000 AND id % 5 = 0 THEN 0
             |         ELSE 1 END AS alive,
             |    CASE WHEN id % 3 = 0  AND 2000 BETWEEN lw AND hw THEN 1
             |         WHEN id % 6 = 0  AND 3000 BETWEEN lw AND hw THEN 1
             |         WHEN id % 5 = 0  AND 4000 BETWEEN lw AND hw THEN 1
             |         WHEN id % 10 = 0 AND 5000 BETWEEN lw AND hw THEN 1
             |         ELSE 0 END AS inw
             |  FROM f)
             |SELECT chunk, CAST(sum(alive) AS BIGINT) AS n_read,
             |  CAST(sum(alive * inw) AS BIGINT) AS n_suppressed,
             |  CAST(sum(alive) - sum(alive * inw) AS BIGINT) AS n_emitted
             |FROM flags GROUP BY chunk""".stripMargin),
      "DBLog incremental snapshot: watermark-bracketed chunk selects " +
        "deduped against the live change stream — per-key cutoff + one " +
        "id-keyed latest-per-key agg + chunk-grain rollup, no " +
        "snapshot-vs-stream join of row payloads"),

    // SCHEMA-DRIFT report over the raw envelope stream — the catalog
    // face of the S7 schema-evolution family (cdc/SchemaEvolution.scala
    // handles the merge; this query is the registry-style monitor that
    // TELLS you drift happened): three synthesized envelope epochs (a
    // column added in epoch 2, one dropped in epoch 3) are fingerprinted
    // by their actual JSON key set — json_object_keys over the raw
    // payload, sorted into a canonical signature — and rolled up to
    // (signature, count, first/last epoch). The implementation reads
    // keys from the JSON bytes (works for any stream); the oracle
    // derives the same signatures from the epoch arithmetic. Map-side
    // key extraction + one signature-grain agg.
    Q("cdc_schema_drift",
      (s, d) => {
        val o = load(s, d, "orders")
        def env(epoch: Int, df: DataFrame,
                after: org.apache.spark.sql.Column) =
          df.select(lit(epoch).as("epoch"),
            to_json(struct(struct(after.as("after")).as("payload")))
              .as("value"))
        val e1 = env(1, o, struct(col("o_orderkey").as("id"),
          col("o_orderstatus"), col("o_totalprice")))
        val e2 = env(2, o.filter(col("o_orderkey") % 2 === 0),
          struct(col("o_orderkey").as("id"), col("o_orderstatus"),
            col("o_totalprice"), col("o_custkey")))
        val e3 = env(3, o.filter(col("o_orderkey") % 7 === 0),
          struct(col("o_orderkey").as("id"), col("o_orderstatus")))
        e1.unionByName(e2).unionByName(e3)
          .select(col("epoch"),
            array_join(array_sort(json_object_keys(
              get_json_object(col("value"), "$.payload.after"))), ",")
              .as("sig"))
          .groupBy(col("sig"))
          .agg(count(lit(1)).as("n"),
            min(col("epoch")).cast("long").as("first_epoch"),
            max(col("epoch")).cast("long").as("last_epoch"))
      },
      Some("""WITH e AS (
             |  SELECT 1 AS epoch, 'id,o_orderstatus,o_totalprice' AS sig
             |  FROM orders
             |  UNION ALL
             |  SELECT 2, 'id,o_custkey,o_orderstatus,o_totalprice'
             |  FROM orders WHERE o_orderkey % 2 = 0
             |  UNION ALL
             |  SELECT 3, 'id,o_orderstatus'
             |  FROM orders WHERE o_orderkey % 7 = 0)
             |SELECT sig, count(*) AS n,
             |  CAST(min(epoch) AS BIGINT) AS first_epoch,
             |  CAST(max(epoch) AS BIGINT) AS last_epoch
             |FROM e GROUP BY 1""".stripMargin),
      "schema-drift monitor: canonical JSON key-set signatures read " +
        "from the raw envelope bytes, rolled to (signature, n, " +
        "first/last epoch) — map-side key extraction, one tiny agg; " +
        "oracle derives signatures from the epoch arithmetic"),

    // Kafka log-compaction simulation over the raw topic records —
    // what does the compacted head of each CDC topic hold once the
    // cleaner has run? Retention semantics: latest offset per
    // (topic, key) survives; 'd'-envelope heads are tombstones the
    // delete-retention GC then removes; compaction is VALUE-agnostic,
    // so a malformed record at the head survives verbatim (the %97
    // corrupt keys — a real operational hazard this query makes
    // visible). One (topic, key)-keyed hash agg (map-side combinable,
    // shuffle ∝ distinct keys — the compaction cost model itself) +
    // a 9-row topic rollup; head-op classification is a map-side
    // get_json_object, never a payload join. Oracle replays the
    // fixture script arithmetically from orders.
    Q("cdc_log_compaction",
      (s, d) => {
        val ev = graft.cdc.Fixture.ordersCdcEvents(s, d)
          .select(col("topic"), col("key"), col("offset"),
            coalesce(get_json_object(col("value"), "$.payload.op"),
              lit("corrupt")).as("opc"))
        val perKey = ev.groupBy(col("topic"), col("key"))
          .agg(count(lit(1)).as("cnt"),
            max_by(col("opc"), col("offset")).as("head"))
        perKey.groupBy(col("topic"))
          .agg(sum(col("cnt")).as("n_raw"), count(lit(1)).as("n_keys"),
            sum(col("cnt") - 1).as("n_reclaimed"),
            sum(when(col("head") === "d", 1L).otherwise(0L))
              .as("n_tombstone_heads"),
            sum(when(col("head") === "corrupt", 1L).otherwise(0L))
              .as("n_corrupt_heads"))
          .withColumn("n_keys_after_gc",
            col("n_keys") - col("n_tombstone_heads"))
      },
      Some("""WITH k AS (
             |  SELECT 'mysql-server.pos_bi_db.orders_t' ||
             |      CAST(o_orderkey % 9 AS VARCHAR) AS topic,
             |    1 + CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END
             |      + CASE WHEN o_orderkey % 6 = 0 THEN 1 ELSE 0 END
             |      + CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END
             |      + CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0 END
             |      + CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END
             |      AS cnt,
             |    CASE WHEN o_orderkey % 97 = 0 THEN 'corrupt'
             |         WHEN o_orderkey % 10 = 0 THEN 'c'
             |         WHEN o_orderkey % 5 = 0 THEN 'd'
             |         WHEN o_orderkey % 3 = 0 THEN 'u'
             |         ELSE 'r' END AS head
             |  FROM orders)
             |SELECT topic, CAST(sum(cnt) AS BIGINT) AS n_raw,
             |  CAST(count(*) AS BIGINT) AS n_keys,
             |  CAST(sum(cnt - 1) AS BIGINT) AS n_reclaimed,
             |  CAST(sum(CASE WHEN head = 'd' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_tombstone_heads,
             |  CAST(sum(CASE WHEN head = 'corrupt' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_corrupt_heads,
             |  CAST(count(*) - sum(CASE WHEN head = 'd' THEN 1 ELSE 0
             |    END) AS BIGINT) AS n_keys_after_gc
             |FROM k GROUP BY 1""".stripMargin),
      "Kafka log-compaction + tombstone-GC simulation: latest-offset " +
        "head per (topic, key), value-agnostic (corrupt heads " +
        "survive), one key-grain agg + topic rollup"))
}
