package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.cdc.{Envelope, Materialize}

/** The CDC replication pipeline as a Structured Streaming job — the
  * Spark-native equivalent of the reference's Kafka Connect sink chain
  * (EP1): envelope stream → route → per-table parse (each table has its
  * own registered schema) → DLQ split → unwrap → upsert-merge into
  * current-state mirrors.
  *
  * Semantics carried over from the reference:
  *   - at-least-once delivery + idempotent keyed merge = effectively-once
  *     (register-postgres-sink.json:15 upsert is the idempotency
  *     mechanism; our checkpoint replaces Connect's offset topics);
  *   - micro-batch trigger ≈ `linger.ms: 500`
  *     (register-postgres-sink.json:7);
  *   - poison records never stall the stream: malformed envelopes AND
  *     records on unroutable topics land in the DLQ table
  *     (errors.tolerance=all + DLQ topic, register-postgres-sink.json:18-21);
  *   - additive schema evolution on the mirrors (auto.evolve=true,
  *     register-postgres-sink.json:14): update the TableSpec registry and
  *     the merge backfills nulls.
  *
  * Scale design: the per-batch merge is one hash aggregation keyed by PK
  * per table; shuffle volume is bounded by batch size + mirror size. At
  * 100 TB the mirror read/rewrite would be a Delta/Iceberg MERGE (or
  * JDBC upsert, matching the reference) — the batch-side plan is
  * identical, only the sink swaps, so the merge logic stays shared with
  * [[graft.cdc.Materialize]].
  */
object CdcPipeline {

  // bounded pool for concurrent per-table parse+merge jobs
  // (scheduler-level parallelism; the work itself runs on executors)
  // 16 ≥ the reference's 9-table topology, so one batch's merges all
  // submit at once; threads are driver-side job submitters only
  private lazy val mergeEc = scala.concurrent.ExecutionContext.fromExecutor(
    java.util.concurrent.Executors.newFixedThreadPool(16, r => {
      val th = new Thread(r, "graft-merge")
      th.setDaemon(true)
      th
    }))

  /** Per-table registration: envelope row schema + primary key — the
    * engine analog of the reference's per-table sink declarations. */
  final case class TableSpec(rowSchema: StructType, keyCols: Seq[String])

  /** A maintained aggregate view: per-group COUNT/SUM/MIN/MAX and
    * HLL-distinct state over one table's change stream, updated
    * incrementally per batch (see [[IncrementalAgg]]). */
  final case class AggView(table: String, spec: IncrementalAgg.Spec)

  /** Table-grain expectation riding an agg view: after each batch the
    * view's O(groups) state rolls up to ONE stats row (`n_rows`,
    * `sum_*`, `max_*`, `min_*`) — never a mirror rescan — and `rules`
    * are evaluated against it, optionally next to `ref_n_rows`/
    * `ref_max_*` from a `reference` source-of-truth frame. This is the
    * reference's MAX(id)-parity integrity check
    * (cdc_data_integrity_dynamic_dag.py:48-60) as a continuous
    * expectation instead of a cron. */
  final case class TableExpectation(
      rules: Seq[graft.operators.Expectations.Rule],
      reference: Option[SparkSession => DataFrame] = None)

  /** @param rowSchema   default row schema (tables without an override)
    * @param keyCols     default primary-key columns
    * @param tableSpecs  per-table overrides (schema registry)
    * @param bucketCount when set, mirrors are written partitioned by
    *   `_bucket = pmod(hash(keys), n)` — at 100 TB this is what makes a
    *   key lookup a partition-pruned read instead of a full scan, and a
    *   mirror-vs-batch merge a co-partitioned join.
    * @param incrementalMirror with bucketCount set, store mirrors in the
    *   [[graft.sinks.BucketedMirror]] manifest layout: a merge reads and
    *   rewrites ONLY the buckets the batch touches (write amplification
    *   ∝ touched buckets, not mirror size) — the 100 TB merge path.
    * @param aggViews    maintained aggregate views by name; each batch
    *   folds its deltas into the view state (O(touched groups), never a
    *   mirror rescan), guarded by the applied batch id for idempotence
    *   under foreachBatch replay.
    * @param sinkOverride plug in any [[graft.sinks.MirrorSink]] — the
    *   adapter point for transactional table formats (a Delta/Iceberg
    *   MERGE sink implements the trait; the pipeline is unchanged).
    *   Unset, the sink derives from the flags: `incrementalMirror` →
    *   [[graft.sinks.BucketedMirrorSink]], else [[graft.sinks.SwapMirror]]. */
  final case class Config(
      rowSchema: StructType,
      keyCols: Seq[String],
      mirrorRoot: String,
      dlqDir: String,
      checkpointDir: String,
      triggerMs: Long = 500L,
      bucketCount: Option[Int] = None,
      // Target mirror file size for the swap (non-bucketed) layout:
      // write tasks are sized per table from the LIVE mirror's byte
      // count (ceil(bytes / target)), so a 30k-row bench table writes
      // ONE file instead of shuffle-partitions-many (the r11 merge
      // floor was the per-file create fork tax of a 288-file dynamic-
      // partition commit on non-native Hadoop), while a 100 TB table
      // still fans out to bytes/128MB parallel writers.
      targetFileBytes: Long = 128L << 20,
      incrementalMirror: Boolean = false,
      tableSpecs: Map[String, TableSpec] = Map.empty,
      aggViews: Map[String, AggView] = Map.empty,
      sinkOverride: Option[graft.sinks.MirrorSink] = None,
      expectations: Map[String, Seq[graft.operators.Expectations.Rule]] =
        Map.empty,
      quarantineDir: Option[String] = None,
      tableExpectations: Map[String, TableExpectation] = Map.empty,
      consistentSnapshots: Boolean = false,
      stageTimer: Option[StageTimings => Unit] = None,
      // Debezium-style signaling: a dir of execute-snapshot signal
      // JSON rows + per-table snapshot sources (the table's current
      // truth) drive chunked ad-hoc backfills — see SignalSnapshot
      signalDir: Option[String] = None,
      snapshotSources: Map[String, () => DataFrame] = Map.empty,
      snapshotChunkKeys: Int = 4096,
      // Cache the routed batch frame. The clean-path batch is read at
      // most twice (table stats + parse-cache fill), and building the
      // columnar cache for the full payload costs MORE than the saved
      // re-read when the source re-reads cheaply AND byte-stably
      // (MemoryStream / snapshot files / already-persisted frames:
      // ~1 s per 271k-event batch, measured — it dominated the route
      // stage). But an EXTERNAL source (Kafka) pays 2+ broker fetches
      // per trigger, and a re-read that isn't byte-stable would let
      // the table-stats pass and the merge/DLQ passes observe
      // DIFFERENT data. None (default) derives per batch from the
      // batch plan's leaves: skip the persist when every leaf is a
      // local/in-memory/file-snapshot relation, persist otherwise.
      // Some(b) forces either way.
      persistRoutedBatch: Option[Boolean] = None) {
    require(!consistentSnapshots ||
      sinkOverride.exists(_.isInstanceOf[graft.sinks.LogMirrorSink]),
      "consistentSnapshots pin LogMirror versions (readAsOf) — they " +
        "require the LogMirrorSink")
    require(!incrementalMirror || bucketCount.isDefined,
      "incrementalMirror requires bucketCount")
    require(expectations.values.forall(_.isEmpty) || quarantineDir.isDefined,
      "expectations require quarantineDir")
    require(tableExpectations.isEmpty || quarantineDir.isDefined,
      "tableExpectations require quarantineDir")
    require(tableExpectations.keySet.subsetOf(aggViews.keySet),
      "tableExpectations are keyed by agg-view name (the stats ride the " +
        "view's delta path) — register the view first")
    def specFor(table: String): TableSpec =
      tableSpecs.getOrElse(table, TableSpec(rowSchema, keyCols))
    def mirrorSink: graft.sinks.MirrorSink = sinkOverride.getOrElse {
      if (incrementalMirror) graft.sinks.BucketedMirrorSink(bucketCount.get)
      else graft.sinks.SwapMirror(bucketCount)
    }
  }

  /** Per-stage wall seconds for one processBatch call, reported through
    * [[Config.stageTimer]]. When the timer is set, the parse stage is
    * force-materialized (one count per cached schema frame) so `merge`
    * measures merging alone — attribution mode costs one extra cached
    * pass and is OFF on the production path (timer unset = zero
    * overhead, no extra jobs). */
  final case class StageTimings(
      route: Double, parse: Double, merge: Double, views: Double,
      snapshot: Double, dlq: Double) {
    def total: Double = route + parse + merge + views + snapshot + dlq
  }

  private def bucketCol(spec: TableSpec, n: Int) =
    pmod(hash(spec.keyCols.map(col): _*), lit(n))

  /** Start the pipeline on a streaming DataFrame of Kafka-shaped records
    * (topic, key, value, partition, offset) — from
    * `spark.readStream.format("kafka")` in production, MemoryStream in
    * tests. */
  def start(records: DataFrame, cfg: Config): StreamingQuery =
    records.writeStream
      .queryName("cdc-replication")
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(Trigger.ProcessingTime(cfg.triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, cfg)
      }
      .start()

  /** One micro-batch: route → parse (ONE pass per distinct registered
    * schema, not per table) → per-table merge (concurrent) → one
    * consolidated DLQ append. Runs on the driver but every DataFrame op
    * is distributed; the only driver-side data is the list of table
    * names present in the batch (≤ #tables).
    *
    * Tables sharing a row schema share one from_json pass and ONE cached
    * frame: with N same-schema tables the old per-table formulation
    * scanned the routed cache N times and pinned N subsets; this parses
    * every record exactly once regardless of fan-out. */
  def processBatch(batch: DataFrame, batchId: Long, cfg: Config): Unit = {
    val spark = batch.sparkSession
    val t0 = System.nanoTime()
    def secsSince(t: Long) = (System.nanoTime() - t) / 1e9
    // persistRoutedBatch trades one saved source re-read against the
    // columnar-cache build for the full payload — see Config. In auto
    // mode the decision derives from the batch's actual source type.
    val doPersist = cfg.persistRoutedBatch.getOrElse(!rereadIsStable(batch))
    val routed0 = batch
      .withColumn("table_name", Envelope.route(col("topic")))
    val routed = if (doPersist) routed0.persist() else routed0
    try {
      // one pass yields the table list plus the unroutable flag (and,
      // when caching is on, fills the route cache) — the DLQ stage
      // below then never has to rescan `routed` to learn whether any
      // topic routed nowhere
      val tstats = routed.groupBy(col("table_name")).count().collect()
      val tables = tstats.map(_.getString(0)).filter(_ != "")
      val hasUnroutable = tstats.exists(_.getString(0) == "")
      // per-table routed counts: reused below to size log-mirror delta
      // write tasks (files ∝ batch bytes, not shuffle partitions)
      val rowCounts: Map[String, Long] =
        tstats.filter(_.getString(0) != "")
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      val tRoute = secsSince(t0)

      val bySchema = tables.toSeq.groupBy(t => cfg.specFor(t).rowSchema)
      val parsedBySchema = bySchema.map { case (schema, ts) =>
        val sub = routed.filter(col("table_name").isin(ts: _*))
        // the well-formed bit is materialized INTO the cache: the
        // clean-batch DLQ probe below then skips every cached batch
        // via the boolean's min/max batch stats instead of
        // decompressing value+env for all rows to find nothing
        // (measured ~30% of batch wall before), and the merge filters
        // read one boolean instead of re-evaluating the predicate
        schema -> Envelope.parse(sub, schema)
          .withColumn("_wf", Envelope.isWellFormed.cast("int")).persist()
      }
      // attribution mode only: materialize the parse caches now so the
      // merge stage below times merging, not the first cache fill
      if (cfg.stageTimer.isDefined) parsedBySchema.values.foreach(_.count())
      val tParse = secsSince(t0)

      // Signal-driven incremental snapshots: plan this batch's chunk
      // per active table (DBLog dedup against THIS batch's changes);
      // chunks for tables also present in the batch ride the table's
      // regular merge below, idle tables merge their chunk alone.
      val snapPlan =
        if (cfg.signalDir.isEmpty) SignalSnapshot.noop
        else SignalSnapshot.plan(spark, cfg, batchId, t => {
          val spec = cfg.specFor(t)
          val parsed = parsedBySchema.getOrElse(spec.rowSchema,
            Envelope.parse(routed.filter(lit(false)), spec.rowSchema)
              .withColumn("_wf", Envelope.isWellFormed.cast("int")))
          Envelope.unwrap(parsed.filter(col("table_name") === t &&
            col("_wf") === 1), spec.keyCols)
        })
      try {
        // Merges are submitted concurrently: each is an independent Spark
        // job, so many small per-table batches don't serialize on the
        // driver (the reference is single-threaded here, tasks.max=1).
        // Tables sharing (row schema, key) merge in ONE job — one
        // (table, key)-keyed hash agg + one partitioned write for the
        // whole group instead of a shuffle + write + commit per table
        // (the reference's 9-table fan-out is exactly this regime).
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: ExecutionContext = mergeEc
        // mergeFor maps each table to the future completing its mirror
        // merge — view updates with max maintenance sequence on it (the
        // dirty-group recompute must read the POST-batch mirror)
        // Swap mirrors take the unified group-merge fast path (one job
        // per same-schema same-key group — a layout-specific
        // optimization); every other sink merges per table through the
        // MirrorSink interface.
        val groupMergeable: Option[Either[graft.sinks.SwapMirror,
            graft.sinks.LogMirrorSink]] = cfg.mirrorSink match {
          case s: graft.sinks.SwapMirror => Some(Left(s))
          case s: graft.sinks.LogMirrorSink => Some(Right(s))
          case _ => None
        }
        // Row-level expectations: violating CHANGE rows (deletes exempt
        // — removing a bad row is always clean) are quarantined to a
        // typed side table with their rule names and excluded from the
        // merge. Gated tables take the per-table path so the group-merge
        // fast path stays rule-free. The quarantine write is idempotent
        // under foreachBatch replay: rows are stamped with the batch id
        // and written into their `_batch_id=` partition with DYNAMIC
        // partition overwrite, so a replayed batch overwrites its own
        // partition instead of appending duplicates (the same guard the
        // agg views get from `_b_upto`).
        def gatedMerge(t: String, unwrapped: DataFrame,
                       rules: Seq[graft.operators.Expectations.Rule]): Unit = {
          // annotate once, persist once: the bad-row probe, the
          // quarantine write and the merge all reuse one evaluation of
          // the parse→wellFormed→unwrap lineage
          val ann = graft.operators.Expectations.annotate(unwrapped, rules)
            .persist()
          try {
            val isBad = col("op") =!= "d" && size(col("_violations")) > 0
            val bad = ann.filter(isBad)
            if (!bad.isEmpty) bad
              .withColumn("_batch_id", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("_batch_id")
              .parquet(s"${cfg.quarantineDir.get}/$t")
            cfg.mirrorSink.merge(spark, s"${cfg.mirrorRoot}/$t",
              ann.filter(!isBad).drop("_violations"), cfg.specFor(t).keyCols,
              batchId)
          } finally ann.unpersist()
        }
        def perTableJob(parsed: DataFrame, t: String): Future[Unit] = Future {
          val spec = cfg.specFor(t)
          val sub = parsed.filter(col("table_name") === t).drop("table_name")
          val base = Envelope.unwrap(sub.filter(col("_wf") === 1),
            spec.keyCols)
          // snapshot chunk rides the table's own merge (same delta,
          // same commit — atomic and replay-idempotent with the batch)
          val unwrapped = snapPlan.chunkFor(t)
            .map(base.unionByName(_)).getOrElse(base)
          cfg.expectations.get(t).filter(_.nonEmpty) match {
            case None => cfg.mirrorSink.merge(spark, s"${cfg.mirrorRoot}/$t",
              unwrapped, spec.keyCols, batchId)
            case Some(rules) => gatedMerge(t, unwrapped, rules)
          }
        }
        def hasRules(t: String) =
          cfg.expectations.get(t).exists(_.nonEmpty)
        val jobsWithTables: Seq[(Seq[String], Future[Unit])] =
          bySchema.toSeq.flatMap { case (schema, ts) =>
            val parsed = parsedBySchema(schema)
            groupMergeable match {
              case None =>
                ts.map(t => Seq(t) -> perTableJob(parsed, t))
              case Some(sink) =>
                val (gated, fast) = ts.partition(hasRules)
                gated.map(t => Seq(t) -> perTableJob(parsed, t)) ++
                  fast.groupBy(t => cfg.specFor(t).keyCols).values.toSeq
                    .map { group =>
                      group -> Future {
                        sink match {
                          case Left(swap) => mergeGroupIntoMirrors(
                            spark, parsed, group, cfg, swap.bucketCount,
                            batchId, snapPlan, rowCounts)
                          case Right(log) => mergeGroupIntoLogMirrors(
                            spark, parsed, group, cfg, log, batchId,
                            snapPlan, rowCounts)
                        }
                      }
                    }
            }
          }
        // active snapshot tables with NO events this batch still make
        // chunk progress: their chunk merges alone (manifest ids still
        // advance — the table had no merge this batch)
        val idleSnapJobs = (snapPlan.chunks.keySet -- tables.toSet)
          .toSeq.sorted.map { t =>
            Future {
              cfg.mirrorSink.merge(spark, s"${cfg.mirrorRoot}/$t",
                snapPlan.chunks(t), cfg.specFor(t).keyCols, batchId)
            }
          }
        val jobs = jobsWithTables.map(_._2) ++ idleSnapJobs
        val mergeFor: Map[String, Future[Unit]] =
          jobsWithTables.flatMap { case (ts, f) => ts.map(_ -> f) }.toMap
        // Maintained aggregate views ride the same batch: deltas come
        // from the already-parsed frame, so a view costs one extra
        // aggregation per batch, not a reparse. Each runs AFTER its
        // table's merge (max recompute reads the post-batch mirror)
        // but CONCURRENTLY with its sibling views (independent chained
        // futures). Extrema views of one table additionally SHARE one
        // lazily-cached post-merge mirror read: the StreamSweep views
        // sweep measured the per-view mirror reconcile as the dominant
        // multi-view cost (drain 36k -> 8k ev/s from 1 to 4 views when
        // every extrema view re-reconciled the log mirror itself).
        val sharedMirrors =
          new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
        val viewJobs = cfg.aggViews.toSeq
          .filter { case (_, v) => tables.contains(v.table) }
          .groupBy(_._2.table).toSeq.flatMap { case (table, vs) =>
            lazy val shared: DataFrame = { // thread-safe lazy init
              val m = mirror(spark, cfg, table).persist()
              sharedMirrors.add(m)
              m
            }
            vs.map { case (name, v) =>
              mergeFor(table).map { _ =>
                val parsed = parsedBySchema(cfg.specFor(table).rowSchema)
                  .filter(col("table_name") === table)
                updateAggView(spark, name, parsed, v, batchId, cfg,
                  () => shared)
                cfg.tableExpectations.get(name).foreach(te =>
                  checkTableExpectations(spark, name, v, te, batchId, cfg))
              }
            }
          }
        // Consolidated DLQ probe + append, OVERLAPPED with the merges
        // (spark_optimization_guide §2.6 — overlap independent jobs):
        // the probe depends only on the parse caches and the route
        // rollup, never on a merge, so running it as one more
        // concurrent job back-fills executor slots in the merge
        // stage's straggler tail instead of adding a sequential stage
        // at the end (measured 0.5-0.9 s/batch as a tail stage).
        // Submitted AFTER the merge futures so FIFO scheduling gives
        // the merges first claim on task slots. Replay semantics are
        // unchanged: the DLQ append was always at-least-once under
        // foreachBatch replay (the checkpoint commits only after the
        // whole batch returns), so ordering it before the merges
        // finish loses nothing.
        //
        // The emptiness probe itself is ONE aggregation job per cached
        // schema frame (min over the materialized _wf ints) instead of
        // the previous take(1) over a filter — take's limit-escalation
        // runs up to four sequential jobs (1, 4, 16, then all cache
        // partitions) to conclude a clean batch has nothing, paying
        // scheduler latency four times; the min-agg answers in one
        // cached columnar pass.
        val dlqJob: Future[Unit] = Future {
          val hasMalformed = hasUnroutable || parsedBySchema.values
            .exists(p => p.agg(coalesce(min(col("_wf")), lit(1)))
              .head().getInt(0) == 0)
          if (hasMalformed) {
            val unroutable = routed.filter(col("table_name") === "")
              .select(col("value").cast("string").as("payload_json"))
            val dlqAll = parsedBySchema.values
              .map(p => p.filter(col("_wf") === 0)
                .select(col("value").cast("string").as("payload_json")))
              .foldLeft(unroutable)(_ unionByName _)
            // poison records are a trickle by contract (errors.tolerance=
            // all quarantines stragglers, not the firehose): one writer
            // task per batch instead of #cache-partitions near-empty
            // files — bounded by the trigger's own batch cap
            dlqAll.repartition(1).write.mode("append").parquet(cfg.dlqDir)
          }
        }
        // The DLQ future must NEVER outlive the batch (ADVICE r13): if
        // a merge/view await below throws, the exception propagates
        // past the unpersist finallys while the orphan DLQ job could
        // still be appending to cfg.dlqDir — and the replayed batch's
        // own DLQ append could then collide with it in the shared
        // _temporary staging dir (lost/partial DLQ files, beyond the
        // acknowledged at-least-once duplicates). Await.ready in a
        // finally joins the job without masking a propagating merge
        // exception (its own failure already lands via the
        // Await.result at the join point on the success path).
        try {
          jobs.foreach(Await.result(_, Duration.Inf))
          // snapshot progress commits once every chunk landed; a replay
          // re-reads the PREVIOUS state and recomputes the same chunks
          snapPlan.commit()
          val tMerge = secsSince(t0)
          viewJobs.foreach(Await.result(_, Duration.Inf))
          sharedMirrors.forEach(_.unpersist())
          val tViews = secsSince(t0)

          // Cross-table consistency cut: AFTER every table's merge landed,
          // pin the batch as one atomic snapshot (SnapshotCatalog) —
          // snapshot readers can never observe table A at batch N joined
          // with table B at N-1, and a crash anywhere above leaves the
          // previous complete snapshot in place (replays recommit the
          // same id idempotently).
          if (cfg.consistentSnapshots)
            graft.sinks.SnapshotCatalog.commit(spark, cfg.mirrorRoot, batchId,
              tables.toSeq)
          val tSnap = secsSince(t0)

          // DLQ join point: malformed envelopes from every table +
          // records whose topic routes nowhere
          // (register-dlq-sink.json:16-17). The probe and any append ran
          // concurrently with the merges above; clean batches still skip
          // the write entirely (the probe reads the cached _wf ints —
          // or, if it wins the race to a not-yet-filled parse cache,
          // fills it first, sharing the work with the merges through the
          // cache's block locks; the unroutable side was answered by the
          // route-stage rollup). No per-trigger parquet commit pollutes
          // the DLQ dir on a long-running stream. The `dlq` stage timing
          // is the await RESIDUE — near zero whenever the probe
          // finished inside the merge window.
          Await.result(dlqJob, Duration.Inf)
          cfg.stageTimer.foreach(f => f(StageTimings(
            route = tRoute, parse = tParse - tRoute, merge = tMerge - tParse,
            views = tViews - tMerge, snapshot = tSnap - tViews,
            dlq = secsSince(t0) - tSnap)))
        } finally Await.ready(dlqJob, Duration.Inf)
      } finally parsedBySchema.values.foreach(_.unpersist())
    } finally if (doPersist) { routed.unpersist(); () }
  }

  /** True when re-evaluating `df` is cheap AND deterministic: every
    * leaf of its logical plan is a driver-local relation (MemoryStream
    * batches), an RDD-backed relation, or a file-snapshot relation
    * (parquet/csv/... fixtures — a re-read returns the same bytes).
    * Anything else — Kafka/JDBC/DSv2 external relations — is treated
    * as expensive/unstable, so the routed batch gets persisted to
    * guarantee the stats pass and the merge/DLQ passes observe the
    * SAME data. */
  private[streaming] def rereadIsStable(df: DataFrame): Boolean =
    df.queryExecution.logical.collectLeaves().forall {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation.isInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
      case leaf =>
        val n = leaf.getClass.getSimpleName
        n == "LogicalRDD" || n == "OneRowRelation"
    }

  /** Unified merge for a group of same-schema same-key tables: the
    * change stream is keyed by `(table_name, pk)` so the whole group is
    * ONE hash aggregation and ONE `partitionBy(table_name)` write; the
    * published state is then swapped per table (each table keeps its own
    * atomic two-rename publish + recovery, so crash semantics are
    * unchanged — a batch replay re-merges idempotently whatever subset
    * had already swapped). Write amplification is the same as the
    * per-table path (every touched table rewrites); scheduling overhead
    * drops from #tables jobs to one. */
  private def mergeGroupIntoMirrors(spark: SparkSession, parsed: DataFrame,
                                    ts: Seq[String], cfg: Config,
                                    bucketCount: Option[Int],
                                    batchId: Long,
                                    snap: SignalSnapshot.Planned =
                                      SignalSnapshot.noop,
                                    rowCounts: Map[String, Long] =
                                      Map.empty): Unit = {
    val spec = cfg.specFor(ts.head) // group = same rowSchema + keyCols
    val fs = new Path(cfg.mirrorRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ts.foreach(t => recoverMirror(fs, s"${cfg.mirrorRoot}/$t"))
    val changes0 = Envelope.unwrap(
      parsed.filter(col("table_name").isin(ts: _*) && col("_wf") === 1),
      spec.keyCols)
      .withColumn("table_name", Envelope.route(col("topic")))
    // snapshot chunks join the group's change set with an EXPLICIT
    // table_name (their synthetic topic routes nowhere)
    val changes = ts.flatMap(t => snap.chunkFor(t)
        .map(_.withColumn("table_name", lit(t))))
      .foldLeft(changes0)(_.unionByName(_))
    val existing = ts.flatMap { t =>
      val live = new Path(s"${cfg.mirrorRoot}/$t/live")
      if (fs.exists(live))
        Some(spark.read.parquet(live.toString).drop("_bucket")
          .withColumn("table_name", lit(t)))
      else None
    }
    val groupKey = "table_name" +: spec.keyCols
    // allowMissingColumns: sibling mirrors can lag an additive schema
    // evolution (a table that hasn't merged since the new column
    // appeared still has the old layout) — missing columns backfill null
    val merged = existing.reduceOption(_.unionByName(_, allowMissingColumns = true)) match {
      case Some(mirror) => Materialize.merge(mirror, changes, groupKey)
      case None => Materialize.versionedState(changes, groupKey)
    }
    // one write for the group, then per-table staging + swap
    val tmp = new Path(cfg.mirrorRoot,
      s".group_staging_${java.util.UUID.randomUUID().toString.take(8)}")
    val dbg = sys.env.contains("GRAFT_MERGE_DEBUG")
    def mark(label: String, t0: Long): Long = {
      if (dbg) println(f"[mergedebug] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      System.nanoTime()
    }
    try {
      var t = System.nanoTime()
      val writer = bucketCount match {
        case Some(n) => merged
          .withColumn("_bucket", bucketCol(spec, n))
          .repartition(n, col("table_name"), col("_bucket"))
          .write.partitionBy("table_name", "_bucket")
        case None if cfg.targetFileBytes <= 0 =>
          // escape hatch (and A/B baseline): unsized dynamic-partition
          // write — one file per (shuffle partition × table present)
          merged.write.partitionBy("table_name")
        case None =>
          // Size write tasks from live mirror bytes (FS metadata, one
          // listing per table): each table gets ceil(bytes/target)
          // files instead of one per (shuffle partition × table). At
          // bench scale that is 9 files, not 288 — and each file
          // create forks a chmod on non-native Hadoop (the measured
          // r11 merge floor). At 100 TB the same rule yields
          // bytes/128MB parallel writers per table. The extra
          // exchange this adds is O(state) — bounded by the O(state)
          // parquet rewrite the swap layout already pays per batch
          // (tables too big for that rewrite belong on the
          // bucketed/log layouts, which keep their own sizing).
          // Live bytes LAG state by one batch: on the FIRST batch
          // (live absent, bytes = 0) — or any large state-growing
          // batch, e.g. an initial 100 TB snapshot — sizing from live
          // alone would serialize the whole post-merge state through
          // ONE write task. Take the max with a batch-row-derived
          // floor (same 1M-rows/file heuristic as LogMirror
          // .mergeGroup's rowsPerFile fallback): post-merge state is
          // always ≥ the batch's upserts for that table.
          val rowsPerFile = 1000000L
          val nf: Map[String, Int] = ts.map { t =>
            val live = new Path(s"${cfg.mirrorRoot}/$t/live")
            val bytes =
              if (fs.exists(live)) fs.getContentSummary(live).getLength
              else 0L
            val fromBytes =
              math.ceil(bytes.toDouble / cfg.targetFileBytes).toInt
            val fromRows = ((rowCounts.getOrElse(t, 0L) + rowsPerFile - 1)
              / rowsPerFile).toInt
            t -> math.max(1, math.max(fromBytes, fromRows))
          }.toMap
          val nfCol = nf.foldLeft(lit(1)) { case (acc, (t, n)) =>
            when(col("table_name") === t, lit(n)).otherwise(acc)
          }
          val total = math.max(1, nf.values.sum)
          merged
            .withColumn("_fg",
              pmod(hash(spec.keyCols.map(col): _*), nfCol))
            .repartition(total, col("table_name"), col("_fg"))
            .drop("_fg")
            .write.partitionBy("table_name")
      }
      writer.mode("overwrite").parquet(tmp.toString)
      t = mark("group write", t)
      ts.foreach { tb =>
        val s0 = System.nanoTime()
        val part = new Path(tmp, s"table_name=$tb")
        if (fs.exists(part)) atomicSwap(fs, s"${cfg.mirrorRoot}/$tb") { staging =>
          if (!fs.rename(part, staging))
            sys.error(s"staging rename failed for $tb")
          graft.core.LocalFs.touch(fs, new Path(staging, "_SUCCESS"))
          graft.sinks.SwapMirror.writeBatchMarker(fs, staging, batchId)
        }
        if (dbg) println(f"[mergedebug]   swap $tb%-22s ${(System.nanoTime() - s0) / 1e9}%6.3f s")
      }
      t = mark("swaps", t)
    } finally fs.delete(tmp, true)
  }

  /** Group merge for same-schema same-key tables on the LOG-STRUCTURED
    * layout: one latest-per-key job + one partitioned write lands every
    * table's delta segment (see [[graft.sinks.LogMirror.mergeGroup]]) —
    * steady-state job count O(1) in the table count, write bytes still
    * ∝ batch. */
  private def mergeGroupIntoLogMirrors(spark: SparkSession,
                                       parsed: DataFrame, ts: Seq[String],
                                       cfg: Config,
                                       sink: graft.sinks.LogMirrorSink,
                                       batchId: Long,
                                       snap: SignalSnapshot.Planned =
                                         SignalSnapshot.noop,
                                       rowCounts: Map[String, Long] =
                                         Map.empty): Unit = {
    val spec = cfg.specFor(ts.head) // group = same rowSchema + keyCols
    val changes0 = Envelope.unwrap(
      parsed.filter(col("table_name").isin(ts: _*) && col("_wf") === 1),
      spec.keyCols)
      .withColumn("table_name", Envelope.route(col("topic")))
    // snapshot chunks join the group's change set with an EXPLICIT
    // table_name (their synthetic topic routes nowhere)
    val changes = ts.flatMap(t => snap.chunkFor(t)
        .map(_.withColumn("table_name", lit(t))))
      .foldLeft(changes0)(_.unionByName(_))
    graft.sinks.LogMirror.mergeGroup(spark, cfg.mirrorRoot, changes, ts,
      spec.keyCols, batchId, sink.maxDeltas, sink.bucketCount,
      rowCounts = rowCounts)
  }

  /** Keyed merge of one table's changes into its parquet mirror with an
    * atomic staging-dir swap (a stand-in for a transactional sink).
    * Delegates to [[graft.sinks.SwapMirror]]. */
  def mergeIntoMirror(spark: SparkSession, changes: DataFrame, table: String,
                      cfg: Config): Unit =
    graft.sinks.SwapMirror(cfg.bucketCount).merge(spark,
      s"${cfg.mirrorRoot}/$table", changes, cfg.specFor(table).keyCols,
      batchId = -1L)

  /** See [[graft.sinks.SwapMirror.recoverMirror]]. */
  private[streaming] def recoverMirror(
      fs: org.apache.hadoop.fs.FileSystem, tableRoot: String): Unit =
    graft.sinks.SwapMirror.recoverMirror(fs, tableRoot)

  /** Fold one batch's deltas into a maintained view's state. Delta
    * application is not idempotent, so the state carries the last
    * applied batch id as a constant column `_b_upto` (RLE-compressed to
    * nothing in parquet): state and watermark commit ATOMICALLY in the
    * same staging-dir swap, and a replayed batch (foreachBatch restart)
    * is skipped instead of double-counted. Reuses the mirror swap's
    * crash recovery. */
  private def updateAggView(spark: SparkSession, name: String,
      parsed: DataFrame, view: AggView, batchId: Long, cfg: Config,
      sharedMirror: () => DataFrame): Unit = {
    // merge's dirty probe + the state write would otherwise evaluate
    // the candidate fold twice per batch — measured as the dominant
    // per-view trigger cost (StreamSweep views mode)
    val cached = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    def cacheBatch(df: DataFrame): DataFrame = {
      val p = df.persist(); cached.add(p); p
    }
    val root = s"${cfg.mirrorRoot}/_views/$name"
    val live = new Path(s"$root/live")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverMirror(fs, root)
    val delta = IncrementalAgg.deltas(parsed, view.spec)
    // max maintenance recomputes dirty groups from the POST-batch
    // mirror (this view job is sequenced after the table's merge);
    // the mirror read is the batch-shared cached one
    val mirrorRows = Some(sharedMirror)
    val upto =
      if (!fs.exists(live)) -1L
      else graft.sinks.SwapMirror.readBatchMarker(fs, live).getOrElse {
        // legacy state (written before the marker rode the swap): fall
        // back to the parquet watermark column. coalesce guards the
        // empty-state file (all groups deleted, or a first batch that
        // was entirely malformed): max over zero rows is null, and a
        // bare getLong would NPE and crash-loop the stream on replay.
        // The marker path replaces a per-view-per-trigger Spark job
        // (scan + agg + head on the state file) with one tiny
        // filesystem read — measured as a real slice of the multi-view
        // drain cost (StreamSweep views mode)
        spark.read.parquet(live.toString)
          .agg(coalesce(max(col("_b_upto")), lit(-1L))).head().getLong(0)
      }
    if (upto >= batchId) return // replayed batch: already applied
    val merged =
      if (batchId > upto + 1)
        // GAP: batches merged into the mirror while this view wasn't
        // riding the pipeline (registered mid-stream, or the pipeline
        // ran with a config that omitted it). Folding only this
        // batch's delta would silently bake the missing batches out of
        // the state forever — REBUILD from the post-batch mirror
        // instead (correct by construction; the MvCatalog freshness
        // watermark advances only through here, so a lagging view
        // stays out of query rewrites until this runs).
        IncrementalAgg.rebuild(sharedMirror(), view.spec)
      else if (upto >= 0)
        IncrementalAgg.merge(
          spark.read.parquet(live.toString).drop("_b_upto"), delta,
          view.spec, mirrorRows, cacheBatch)
      else
        // empty-state merge (NOT a bare filter): a within-batch
        // insert+delete of a group's max row must already trigger the
        // dirty recompute on the very first batch
        IncrementalAgg.merge(delta.limit(0), delta, view.spec, mirrorRows,
          cacheBatch)
    try atomicSwap(fs, root) { staging =>
      // aggregate state is #groups rows — orders of magnitude smaller
      // than the stream; one file keeps the swap cheap and the read local
      merged.withColumn("_b_upto", lit(batchId))
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      // watermark marker rides the SAME atomic rename as the state, so
      // the cheap read path above can never disagree with the data
      graft.sinks.SwapMirror.writeBatchMarker(fs, staging, batchId)
    } finally cached.forEach(_.unpersist())
  }

  /** Two-rename atomic publish — see [[graft.sinks.SwapMirror.atomicSwap]]
    * (shared by group merges and view updates). */
  private def atomicSwap(fs: org.apache.hadoop.fs.FileSystem, root: String)
                        (write: Path => Unit): Unit =
    graft.sinks.SwapMirror.atomicSwap(fs, root)(write)

  /** Evaluate a view's table-grain expectations after its batch update:
    * the O(groups) view state rolls up to one stats row, rules run
    * against it (× the reference stats when declared), and failed rules
    * land as one quarantine row per batch under
    * `quarantineDir/_table/<view>` — batch-partitioned with dynamic
    * overwrite, so foreachBatch replays overwrite their own partition
    * (same idempotence as the row-level quarantine). Cost per batch:
    * one O(groups) rollup + (with a reference) one stats-only scan of
    * the reference — the reference probe is MAX(pk)/COUNT, which
    * parquet serves from footer statistics. */
  private def checkTableExpectations(spark: SparkSession, name: String,
      view: AggView, te: TableExpectation, batchId: Long,
      cfg: Config): Unit = {
    val spec = view.spec
    val state = aggView(spark, cfg, name)
    val aggs = sum(col("n_rows")).as("n_rows") +:
      (spec.sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
        spec.maxCols.map(c => max(col(s"max_$c")).as(s"max_$c")) ++
        spec.minCols.map(c => min(col(s"min_$c")).as(s"min_$c")))
    val sink = state.agg(aggs.head, aggs.tail: _*)
    val full = te.reference match {
      case Some(f) => sink.crossJoin(graft.operators.Expectations
        .tableStats(f(spark), spec.maxCols, prefix = "ref_"))
      case None => sink
    }
    val bad = graft.operators.Expectations.annotate(full, te.rules)
      .filter(size(col("_violations")) > 0)
    if (!bad.isEmpty) bad
      .withColumn("_batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(s"${cfg.quarantineDir.get}/_table/$name")
  }

  /** Recorded table-grain expectation violations for a view: one row
    * per (batch, failed-rule-set) with the stats the rules saw. Empty
    * when the view has never violated. Feed these to the alert fan-in
    * the same way health rows go — each row is a fired condition. */
  def tableViolations(spark: SparkSession, cfg: Config,
                      name: String): DataFrame = {
    val dir = new Path(s"${cfg.quarantineDir.get}/_table/$name")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) spark.read.parquet(dir.toString)
    else spark.emptyDataFrame
  }

  /** Table-grain violations as dispatchable alerts — one per
    * (batch, rule), keyed so [[AlertDispatcher]] delivers each fired
    * condition exactly once across repeated dispatches (the same
    * fan-in path the probe and query-health alerts ride). */
  def tableViolationAlerts(spark: SparkSession, cfg: Config,
                           name: String): Seq[AlertSink.Alert] = {
    val v = tableViolations(spark, cfg, name)
    if (v.columns.isEmpty) return Seq.empty
    // _batch_id is a partition column — read back inferred as int
    v.select(col("_batch_id").cast("long"), explode(col("_violations")).as("rule"))
      .collect().map { r =>
        val b = r.getLong(0)
        val rule = r.getString(1)
        AlertSink.Alert(s"texp:$name:$b:$rule", "error",
          s"table expectation $rule failed for view $name",
          s"batch $b violated table-grain rule '$rule' " +
            s"(stats row quarantined under _table/$name)")
      }.toSeq
  }

  /** Read a maintained aggregate view's current state (with derived
    * `avg_*` columns and, for `distinctCols`, `distinct_*` estimates in
    * place of the raw sketch binaries). */
  def aggView(spark: SparkSession, cfg: Config, name: String): DataFrame = {
    val spec = cfg.aggViews(name).spec
    IncrementalAgg.withDistinctEstimates(
      IncrementalAgg.withAverages(
        spark.read.parquet(s"${cfg.mirrorRoot}/_views/$name/live")
          .drop("_b_upto")
          // candidate-list internals stay in the state file, not the
          // read surface
          .drop(IncrementalAgg.hiddenCols(spec): _*),
        spec),
      spec)
  }

  /** KEY-GAP detection over the CDC path (the continuous form of the
    * `quality_key_gaps` probe): reads a maintained DENSITY view — an
    * agg view whose spec carries `cellGroups = Seq((src, width))`, so
    * the state holds one row per touched `width`-key cell, updated by
    * the delta path (only cells the batch touched, O(cells) state) —
    * and returns every cell whose live-key count is below the cell's
    * domain width, including cells that vanished entirely (a
    * fully-dropped key range leaves no state row; the spine anti-join
    * resurfaces it as n_keys = 0). Cost: one O(cells) state read + an
    * O(cells) spine — never a mirror scan.
    *
    * `expectedMaxKey` bounds the domain from REFERENCE truth (the
    * source table's MAX(pk) — the same probe TableExpectation.reference
    * reads from parquet footer stats). Without it the spine ends at the
    * highest SURVIVING cell, which cannot see a fully-dropped TAIL
    * range (losing cells 3 AND 4 of 0..4 shrinks the observed max to 2
    * and the monitor reads healthy) and must exclude the last cell
    * (domain end unknown) — pass the reference bound when auditing for
    * truncation, not just interior holes. */
  def lowDensityCells(spark: SparkSession, cfg: Config,
                      viewName: String, src: String,
                      expectedMaxKey: Option[Long] = None): DataFrame = {
    val spec = cfg.aggViews(viewName).spec
    val width = spec.cellGroups.find(_._1 == src).map(_._2)
      .getOrElse(sys.error(
        s"view $viewName has no cell group over '$src' — register the " +
          s"AggView with cellGroups = Seq((\"$src\", width))"))
    val cellCol = s"cell_$src"
    val state = aggView(spark, cfg, viewName)
      .select(col(cellCol).cast("long").as("cell"),
        col("n_rows").as("n_keys"))
    // spine end: the reference bound's cell (tail drops visible, last
    // cell's domain known) or the highest surviving cell minus one
    // (observed-only mode; see the scaladoc limitation). mx < 0 means
    // no auditable cells — sequence() would DESCEND on start > stop,
    // so branch to an empty array instead
    val maxCell = expectedMaxKey match {
      case Some(mk) => state.sparkSession.range(1)
        .select(lit(mk / width).as("mx"), lit(mk).as("maxkey"))
      case None => state
        .agg((coalesce(max(col("cell")), lit(0L)) - 1).as("mx"),
          lit(null).cast("long").as("maxkey"))
    }
    val spine = maxCell
      .select(explode(when(col("mx") >= 0, sequence(lit(0L), col("mx")))
        .otherwise(array().cast("array<bigint>"))).as("cell"),
        col("maxkey"))
    spine.join(state, Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("n_keys"), lit(0L)).as("n_keys"),
        // the reference-bounded last cell is partial: clip its domain
        when(col("maxkey").isNotNull,
          least(lit(width), col("maxkey") - col("cell") * width + 1))
          .otherwise(lit(width)).as("domain"),
        (when(col("maxkey").isNotNull,
          least(lit(width), col("maxkey") - col("cell") * width + 1))
          .otherwise(lit(width)) -
          coalesce(col("n_keys"), lit(0L))).as("n_missing"))
      .filter(col("n_missing") > 0)
  }

  /** Read a table's current (live, unversioned) mirror state. */
  def mirror(spark: SparkSession, cfg: Config, table: String): DataFrame =
    cfg.mirrorSink.read(spark, s"${cfg.mirrorRoot}/$table")

  /** Point lookup by primary key: pruned to one bucket/partition dir by
    * the sink (O(bucket), not O(table)). */
  def lookup(spark: SparkSession, cfg: Config, table: String,
             keyValues: Seq[Any]): DataFrame =
    cfg.mirrorSink.lookup(spark, s"${cfg.mirrorRoot}/$table",
      cfg.specFor(table).keyCols, keyValues)

  /** Read the dead-letter table. A pipeline that never saw a poison
    * record has no DLQ dir (clean batches don't write) — that reads as
    * an empty, correctly-schemed frame. */
  def deadLetters(spark: SparkSession, cfg: Config): DataFrame = {
    val dir = new Path(cfg.dlqDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) spark.read.parquet(cfg.dlqDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("`payload_json` STRING"))
  }

  /** Fold the DLQ's per-trigger appended part files into a compact set
    * — a stream that poisons regularly accretes one file per dirty
    * trigger, and every [[deadLetters]] read then pays a footer per
    * file. Call between batches from the pipeline's own driver (the
    * single writer): the fold lists the data files present, writes
    * their union as ~`targetBytes` files, moves those in, then deletes
    * the originals. A crash inside the move window can leave a row
    * duplicated — the same at-least-once semantics DLQ appends already
    * have under foreachBatch replay (dead letters are reviewed, not
    * arithmetic). */
  def compactDlq(spark: SparkSession, cfg: Config,
                 targetBytes: Long = 128L << 20): Unit = {
    val dir = new Path(cfg.dlqDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return
    val originals = fs.listStatus(dir).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    if (originals.length <= 1) return
    val totalBytes = originals.map(_.getLen).sum
    val nOut = math.max(1, (totalBytes / targetBytes).toInt +
      (if (totalBytes % targetBytes == 0) 0 else 1))
    val tmp = new Path(dir, ".dlq-compact")
    fs.delete(tmp, true)
    spark.read.parquet(originals.map(_.getPath.toString).toSeq: _*)
      .coalesce(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    val moved = fs.listStatus(tmp).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    moved.zipWithIndex.foreach { case (p, i) =>
      // unique names so a re-run never collides with a previous fold
      val dst = new Path(dir,
        s"compact-${java.util.UUID.randomUUID().toString.take(8)}-$i.parquet")
      if (!fs.rename(p, dst)) sys.error(s"DLQ compaction move failed: $p")
    }
    originals.foreach(st => fs.delete(st.getPath, false))
    fs.delete(tmp, true)
  }
}
