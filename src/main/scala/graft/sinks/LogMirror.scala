package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.Materialize

/** Log-structured CDC mirror: an immutable BASE segment plus an ordered
  * list of per-batch DELTA segments, committed through an atomic
  * manifest pointer — the layout that makes a merge's write cost
  * proportional to the BATCH, not to the mirror or even a bucket of it.
  *
  * The other two parquet-native layouts both rewrite state a batch
  * didn't change: [[SwapMirror]] rewrites the whole table,
  * [[BucketedMirror]] rewrites every touched bucket (a 1-row change
  * still rewrites its whole ~GB bucket at scale). Here a merge writes
  * ONLY the batch collapsed to latest-per-key — the delta segment —
  * and never reads the base at all:
  *
  *   - merge: `versionedState(batch)` → `segments/delta-<batchId>`,
  *     manifest appends the segment. Zero base reads, write bytes
  *     ∝ batch keys. This is the reference's row-level upsert cost
  *     model (register-postgres-sink.json:15-17 writes only the
  *     batch's rows) realized on immutable storage.
  *   - read: base ∪ deltas reconciled by the stored (ts_ms, offset)
  *     version per key — the same ordering every mirror layout uses,
  *     so late/replayed changes can never regress a newer row.
  *   - compaction (automatic past `maxDeltas`, or explicit): folds
  *     base+deltas into a fresh base segment and resets the delta
  *     list — amortized O(mirror/maxDeltas) per batch, the standard
  *     LSM trade: read cost is bounded by `maxDeltas` reconcile
  *     inputs, write amplification is bounded by the fold cadence.
  *
  * Crash safety follows [[BucketedMirror]]'s versioned-dir + pointer
  * design: segment dirs land BEFORE the manifest commit (tmp-file +
  * atomic rename, readers take the highest manifest id), so a crash at
  * any point leaves the previous manifest pointing at complete
  * segments. Replays are idempotent — a replayed batch overwrites its
  * own delta dir and recommits an identical manifest; tombstones are
  * RETAINED through compaction, so a replayed batch containing a
  * pre-delete change can never resurrect a deleted key.
  *
  * At 100 TB: deltas are small sorted files (row-group stats serve
  * point lookups); the base is bucket-partitioned (`n:` in the
  * manifest) so key lookups prune to one base partition + the deltas;
  * compaction is the only mirror-sized job and runs on YOUR cadence,
  * off the ingest path if desired (`maxDeltas = Int.MaxValue` +
  * explicit `compact()` in a maintenance window).
  */
object LogMirror {

  /** Committed mirror layout: key columns + optional base bucket count,
    * the base segment id, and the ordered live delta ids. */
  final case class Manifest(keyCols: Seq[String], bucketCount: Option[Int],
                            base: Option[Long], deltas: Seq[Long])

  private[sinks] def manifestId(p: Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("MANIFEST-")) n.stripPrefix("MANIFEST-").toLongOption
    else None
  }

  private[sinks] def latestManifest(fs: FileSystem, root: String): Option[Path] = {
    val dir = new Path(root)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).map(_.getPath)
      .flatMap(p => manifestId(p).map(_ -> p))
      .sortBy(_._1).lastOption.map(_._2)
  }

  /** Absent manifest = never-written mirror. */
  def readManifest(fs: FileSystem, root: String): Option[Manifest] =
    latestManifest(fs, root).map { mf =>
      val in = fs.open(mf)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val lines = txt.linesIterator.filter(_.nonEmpty).toSeq
      Manifest(
        keyCols = lines.collectFirst {
          case l if l.startsWith("k:") => l.stripPrefix("k:").split(',').toSeq
        }.getOrElse(Seq.empty),
        bucketCount = lines.collectFirst {
          case l if l.startsWith("n:") => l.stripPrefix("n:").toInt
        },
        base = lines.collectFirst {
          case l if l.startsWith("base:") => l.stripPrefix("base:").toLong
        },
        deltas = lines.collect {
          case l if l.startsWith("delta:") => l.stripPrefix("delta:").toLong
        }.sorted)
    }

  private def writeManifest(fs: FileSystem, root: String, commitId: Long,
                            m: Manifest): Unit = {
    val tmp = new Path(s"$root/.MANIFEST-$commitId.tmp")
    // LocalFs: one manifest per TABLE per TRIGGER rides this path — the
    // local-FS create otherwise forks a chmod per call (~12 ms)
    graft.core.LocalFs.writeSmall(fs, tmp, (
      Seq(s"k:${m.keyCols.mkString(",")}") ++
        m.bucketCount.map(n => s"n:$n") ++
        m.base.map(b => s"base:$b") ++
        m.deltas.map(d => s"delta:$d"))
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    val dst = new Path(s"$root/MANIFEST-$commitId")
    fs.delete(dst, false) // replay of the same batch recommits
    if (!fs.rename(tmp, dst)) sys.error(s"manifest commit failed for $root")
    // sweep superseded manifests (readers take the newest)
    fs.listStatus(new Path(root)).map(_.getPath)
      .filter(p => manifestId(p).exists(_ < commitId))
      .foreach(p => fs.delete(p, false))
  }

  private def basePath(root: String, v: Long) = s"$root/segments/base-$v"
  private def deltaPath(root: String, v: Long) = s"$root/segments/delta-$v"

  private def bucketExpr(keyCols: Seq[String], n: Int) =
    pmod(hash(keyCols.map(col): _*), lit(n))

  /** Latest row per key across segments by the stored version order —
    * the cross-segment analog of [[Materialize.latestPerKey]], running
    * on already-versioned rows. One hash aggregation with map-side
    * partial `max_by`; shuffle keyed by PK. */
  private def reconcile(segments: DataFrame, keyCols: Seq[String]): DataFrame = {
    val payload = segments.columns.filterNot(keyCols.contains)
    segments
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.toSeq.map(col): _*),
        struct(col(Materialize.versionTs), col(Materialize.versionOffset)))
        .as("_latest"))
      .select(keyCols.map(col) ++ payload.map(c => col(s"_latest.$c").as(c)): _*)
  }

  /** allowMissingColumns: a delta written after an additive schema
    * evolution carries columns the base predates — they backfill null
    * (auto.evolve=true, register-postgres-sink.json:14). */
  private def unionSegments(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))

  private def segmentFrames(spark: SparkSession, root: String,
                            m: Manifest): Seq[DataFrame] =
    (m.base.map(v => spark.read.parquet(basePath(root, v))).toSeq ++
      m.deltas.map(v => spark.read.parquet(deltaPath(root, v))))
      .map(_.drop("_bucket"))

  /** Merge one unwrapped change batch: write the batch's latest-per-key
    * delta segment (NO base read), commit, and fold when the delta list
    * reaches `maxDeltas`. */
  def merge(spark: SparkSession, root: String, changes: DataFrame,
            keyCols: Seq[String], batchId: Long, maxDeltas: Int,
            bucketCount: Option[Int]): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    precheck(fs, root, keyCols, batchId)
    val delta = Materialize.versionedState(changes, keyCols).persist()
    try {
      if (delta.isEmpty) return // nothing survived the batch (all malformed)
      // delta files are key-sorted so parquet row-group min/max stats
      // prune point lookups inside each segment
      delta.sortWithinPartitions(keyCols.map(col): _*)
        .write.mode("overwrite").parquet(deltaPath(root, batchId))
    } finally delta.unpersist()
    commitDelta(spark, fs, root, keyCols, batchId, maxDeltas, bucketCount)
  }

  private def precheck(fs: FileSystem, root: String, keyCols: Seq[String],
                       batchId: Long): Unit = {
    readManifest(fs, root).foreach { m =>
      // a merge keyed differently from the committed layout would
      // reconcile the wrong per-key state — fail loudly
      require(m.keyCols == keyCols,
        s"LogMirror at $root is keyed by ${m.keyCols}; merge got $keyCols")
    }
    // readers resolve the HIGHEST manifest id, so a commit below it
    // would be invisible while its sweep destroys the visible segments;
    // equality is the foreachBatch replay (allowed — it recommits)
    latestManifest(fs, root).flatMap(manifestId).filter(_ > batchId)
      .foreach(newest => sys.error(
        s"LogMirror commit ids must advance: batch $batchId behind " +
          s"committed manifest $newest at $root"))
  }

  /** Manifest commit for an already-written `delta-<batchId>` segment
    * (+ the past-`maxDeltas` fold). */
  private def commitDelta(spark: SparkSession, fs: FileSystem, root: String,
                          keyCols: Seq[String], batchId: Long, maxDeltas: Int,
                          bucketCount: Option[Int]): Unit = {
    val prev = readManifest(fs, root)
    val deltas = prev.map(_.deltas).getOrElse(Seq.empty)
      .filterNot(_ == batchId) :+ batchId // replay overwrites its own slot
    val m = Manifest(keyCols, bucketCount, prev.flatMap(_.base), deltas)
    if (deltas.length >= maxDeltas) compactTo(spark, fs, root, m, batchId)
    else {
      writeManifest(fs, root, batchId, m)
      sweep(fs, root, m)
    }
  }

  /** Group merge for same-schema same-key tables (the steady-state
    * shape of a multi-table CDC pipeline): ONE `(table, key)`-keyed
    * latest-per-key aggregation and ONE `partitionBy(table)` write land
    * EVERY table's delta segment in a single Spark job; each table then
    * receives its segment by a metadata rename and commits its own
    * manifest. Per-table crash semantics are unchanged — segments land
    * before manifests, a replayed batch overwrites its own slot — and a
    * crash mid-loop leaves the remaining tables' manifests at the prior
    * batch, which the replay completes. Steady-state job count is O(1)
    * in the table count instead of O(tables) — the log-structured
    * analog of the swap layout's group merge. `changes` must carry
    * `tableCol`; tables absent from the batch are untouched. */
  def mergeGroup(spark: SparkSession, mirrorRoot: String, changes: DataFrame,
                 tables: Seq[String], keyCols: Seq[String], batchId: Long,
                 maxDeltas: Int, bucketCount: Option[Int],
                 tableCol: String = "table_name",
                 rowCounts: Map[String, Long] = Map.empty): Unit = {
    val fs = new Path(mirrorRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    tables.foreach(t => precheck(fs, s"$mirrorRoot/$t", keyCols, batchId))
    val delta0 = Materialize.versionedState(changes, tableCol +: keyCols)
    // Size delta-segment write tasks from the batch's per-table row
    // counts (when the pipeline supplies them): a 3k-row trigger
    // otherwise fans a 32-partition agg across 9 dynamic partitions —
    // up to 288 near-empty files per trigger, each create forking a
    // chmod on non-native Hadoop. ~1M rows/file ≈ the 128 MB target
    // at this envelope's ~128 B/row; a table above that still gets
    // proportional parallel writers.
    val delta = if (rowCounts.isEmpty) delta0 else {
      val rowsPerFile = 1000000L
      val nf = tables.map(t => t ->
        math.max(1L, (rowCounts.getOrElse(t, 0L) + rowsPerFile - 1)
          / rowsPerFile).toInt).toMap
      val nfCol = nf.foldLeft(lit(1)) { case (acc, (t, n)) =>
        when(col(tableCol) === t, lit(n)).otherwise(acc)
      }
      delta0
        .withColumn("_fg", pmod(hash(keyCols.map(col): _*), nfCol))
        .repartition(math.max(1, nf.values.sum), col(tableCol), col("_fg"))
        .drop("_fg")
    }
    val tmp = new Path(mirrorRoot,
      s".log_group_staging_${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      // one write: partition dirs split per table, rows key-sorted
      // within each task so every file's row groups carry usable stats
      delta.sortWithinPartitions((tableCol +: keyCols).map(col): _*)
        .write.partitionBy(tableCol).mode("overwrite").parquet(tmp.toString)
      tables.foreach { t =>
        val part = new Path(tmp, s"$tableCol=$t")
        if (fs.exists(part)) { // absent = no surviving changes for t
          val root = s"$mirrorRoot/$t"
          val dst = new Path(deltaPath(root, batchId))
          fs.delete(dst, true) // replay overwrites its own slot
          graft.core.LocalFs.mkdirs(fs, dst.getParent)
          if (!fs.rename(part, dst))
            sys.error(s"delta segment rename failed for $t")
          // stagger the folds: the group shares one batch counter, so
          // every table would hit maxDeltas on the SAME trigger and the
          // amortized fold would become a global pause; a deterministic
          // per-table offset spreads folds over [maxDeltas, 1.5×maxDeltas)
          val stagger = math.abs(t.hashCode) % (maxDeltas / 2 + 1)
          commitDelta(spark, fs, root, keyCols, batchId,
            maxDeltas + stagger, bucketCount)
        }
      }
    } finally fs.delete(tmp, true)
  }

  /** Fold base+deltas into a fresh base segment (explicit entry point
    * for off-ingest-path compaction; merge calls it automatically past
    * `maxDeltas`). No-op when there is nothing to fold. Tombstones are
    * retained: a replayed batch may still carry changes OLDER than a
    * key's delete, and only the tombstone's stored version outranks
    * them. */
  def compact(spark: SparkSession, root: String): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    readManifest(fs, root).filter(_.deltas.nonEmpty).foreach { m =>
      compactTo(spark, fs, root, m, m.deltas.max)
    }
  }

  private def compactTo(spark: SparkSession, fs: FileSystem, root: String,
                        m: Manifest, commitId: Long): Unit =
    writeBase(spark, fs, root, m, commitId,
      reconcile(unionSegments(segmentFrames(spark, root, m)), m.keyCols))

  /** Hard-delete: remove EVERY trace of the given keys — live rows AND
    * tombstones — from the mirror (the right-to-be-forgotten obligation
    * a replication platform carries; soft deletes keep tombstones, a
    * purge may not). One forced fold: reconcile all segments, anti-join
    * the purge set, publish as a FRESH base at `currentVersion + 1` and
    * sweep every old segment — write cost ∝ mirror, the same job class
    * as a compaction, run it in the same maintenance window
    * (single-writer discipline: quiesce the ingest stream first — the
    * version bump makes a concurrent writer's in-flight batch fail
    * loudly rather than resurrect data). Changefeed consumers behind
    * the purge get the retention-lost re-snapshot, so purged keys never
    * reach them; `keys` carries the mirror's key columns (any size —
    * it joins, it is never collected). */
  def purgeKeys(spark: SparkSession, root: String, keys: DataFrame): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    readManifest(fs, root).foreach { m =>
      val purgeId = latestManifest(fs, root).flatMap(manifestId).get + 1
      val folded = reconcile(unionSegments(segmentFrames(spark, root, m)),
        m.keyCols)
        .join(keys.select(m.keyCols.map(col): _*), m.keyCols, "left_anti")
      writeBase(spark, fs, root, m, purgeId, folded)
    }
  }

  private def writeBase(spark: SparkSession, fs: FileSystem, root: String,
                        m: Manifest, commitId: Long,
                        folded: DataFrame): Unit = {
    val writer = m.bucketCount match {
      case Some(n) => folded
        .withColumn("_bucket", bucketExpr(m.keyCols, n))
        .repartition(n, col("_bucket"))
        .sortWithinPartitions(("_bucket" +: m.keyCols).map(col): _*)
        .write.partitionBy("_bucket")
      case None => folded
        .sortWithinPartitions(m.keyCols.map(col): _*)
        .write
    }
    writer.mode("overwrite").parquet(basePath(root, commitId))
    val next = m.copy(base = Some(commitId), deltas = Seq.empty)
    writeManifest(fs, root, commitId, next)
    sweep(fs, root, next)
  }

  /** Per-segment health stats — (kind, version, n_rows, n_tombstones)
    * for the base and every live delta — the numbers an operator
    * watches to size `maxDeltas` / schedule compaction (deep deltas =
    * slow reads; tombstone-heavy base = fold overdue). One plan: each
    * segment aggregates to a single row (parquet footers serve the
    * counts; no full scan materializes), then a union of 1-row frames.
    * Feed the result into the monitoring spine like any health frame. */
  def segmentStats(spark: SparkSession, root: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("kind", StringType), StructField("version", LongType),
      StructField("n_rows", LongType), StructField("n_tombstones", LongType)))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    readManifest(fs, root) match {
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case Some(m) =>
        def statsOf(kind: String, v: Long, path: String): DataFrame =
          spark.read.parquet(path).agg(
            lit(kind).as("kind"), lit(v).as("version"),
            count(lit(1)).as("n_rows"),
            coalesce(sum(col(Materialize.deletedFlag).cast("long")), lit(0L))
              .as("n_tombstones"))
            .select("kind", "version", "n_rows", "n_tombstones")
        (m.base.map(v => statsOf("base", v, basePath(root, v))).toSeq ++
          m.deltas.map(v => statsOf("delta", v, deltaPath(root, v))))
          .reduce(_.unionByName(_))
    }
  }

  /** Stats-driven compaction policy: fold when the delta list is
    * deeper than `maxDeltaDepth` OR tombstones exceed
    * `maxTombstoneRatio` of all segment rows (a tombstone-heavy mirror
    * pays reconcile work for keys that no longer exist — only a fold
    * collapses a tombstone onto the base row it masks). Returns true
    * when it compacted. Decision cost is [[segmentStats]] — footer
    * metadata, not a scan — so this is safe to call every batch from a
    * maintenance cadence (`merge`'s own `maxDeltas` fold stays the
    * inline backstop). */
  def compactIfNeeded(spark: SparkSession, root: String,
                      maxDeltaDepth: Int = 8,
                      maxTombstoneRatio: Double = 0.2): Boolean = {
    require(maxDeltaDepth >= 1, "maxDeltaDepth must be >= 1")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    readManifest(fs, root).filter(_.deltas.nonEmpty) match {
      case None => false
      case Some(m) =>
        val due =
          if (m.deltas.length > maxDeltaDepth) true
          else {
            val r = segmentStats(spark, root)
              .agg(sum("n_rows"), sum("n_tombstones")).head()
            r.getLong(1) > r.getLong(0) * maxTombstoneRatio
          }
        if (due) compactTo(spark, fs, root, m, m.deltas.max)
        due
    }
  }

  /** Drop segment dirs the committed manifest no longer references
    * (superseded bases, folded deltas, crash leftovers). Single-writer
    * discipline, same as [[BucketedMirror]]'s version sweep: a reader
    * holding the immediately-previous manifest may race a compaction
    * sweep — run compaction off the read path or tolerate a retry. */
  private def sweep(fs: FileSystem, root: String, m: Manifest): Unit = {
    val dir = new Path(s"$root/segments")
    if (!fs.exists(dir)) return
    val live = m.base.map(v => s"base-$v").toSet ++
      m.deltas.map(v => s"delta-$v")
    fs.listStatus(dir).map(_.getPath)
      .filterNot(p => live(p.getName))
      .foreach(p => fs.delete(p, true))
  }

  /** Versioned snapshot (tombstones + bookkeeping retained). */
  def readVersioned(spark: SparkSession, root: String): DataFrame = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    readManifest(fs, root) match {
      case Some(m) =>
        reconcile(unionSegments(segmentFrames(spark, root, m)), m.keyCols)
      case None =>
        // never-written mirror: committed segments are always non-empty
        // (versionedState of a non-empty batch keeps tombstones), so the
        // only schema-less case is this one — bookkeeping columns only
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            s"`${Materialize.versionTs}` BIGINT, " +
              s"`${Materialize.versionOffset}` BIGINT, " +
              s"`${Materialize.deletedFlag}` BOOLEAN"))
    }
  }

  /** Live current-state read. */
  def read(spark: SparkSession, root: String): DataFrame =
    Materialize.stripVersions(readVersioned(spark, root))

  /** Version time travel: the mirror's state as of committed batch
    * `version` — reconcile the base plus ONLY the delta segments with
    * id ≤ `version`, exactly the segment set a reader at that commit
    * saw. Same cost class as [[read]] (bounded by the delta depth at
    * that point), no extra storage: the log layout IS the history.
    *
    * Retention contract mirrors [[changesSince]]: compaction folds
    * deltas into a base stamped with the newest folded id, so once the
    * base id has advanced past `version` the per-batch segments that
    * made up that state are gone — this throws
    * [[RetentionLostException]] rather than serving a state assembled
    * from the wrong segments. Size `maxDeltas` (the retention window)
    * to the oldest state you need to reproduce, or compact explicitly
    * on that cadence. Complements [[Materialize.stateAsOf]] (EVENT-time
    * travel over a change log): this is COMMIT-time travel over the
    * mirror's own segment history, the "query the table as of batch N"
    * obligation of a replication target. */
  def readAsOf(spark: SparkSession, root: String, version: Long): DataFrame = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    readManifest(fs, root) match {
      case None => read(spark, root)
      case Some(m) =>
        m.base.filter(_ > version).foreach(b => throw
          new RetentionLostException(
            s"LogMirror at $root folded batches up to $b into its base; " +
              s"the state as of $version can no longer be reconstructed " +
              "(retention = maxDeltas)."))
        val visible = m.copy(deltas = m.deltas.filter(_ <= version))
        if (visible.base.isEmpty && visible.deltas.isEmpty)
          // requested a version before the first commit: empty state in
          // the live schema
          read(spark, root).limit(0)
        else Materialize.stripVersions(
          reconcile(unionSegments(segmentFrames(spark, root, visible)),
            m.keyCols))
    }
  }

  /** Thrown by [[changesSince]] when compaction has folded batches
    * newer than the requested checkpoint into the base — the per-batch
    * segments are gone, so the consumer must re-snapshot via [[read]] /
    * [[readVersioned]] and resume from [[currentVersion]]. */
  final class RetentionLostException(msg: String)
    extends RuntimeException(msg)

  /** Change-type marker column emitted by [[changesSince]]. */
  val changeType = "_change_type"

  /** Commit-version column emitted by [[changesSince]]: the id of the
    * batch whose change survived reconciliation for the key. */
  val commitVersion = "_commit_version"

  /** Latest committed version (newest manifest id); None for a
    * never-written mirror. Downstream consumers checkpoint this and
    * hand it back to [[changesSince]] on their next poll. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    latestManifest(fs, root).flatMap(manifestId)
  }

  private def asFeed(versioned: DataFrame): DataFrame =
    versioned
      .withColumn(changeType,
        when(col(Materialize.deletedFlag), "delete").otherwise("upsert"))
      .drop(Materialize.versionTs, Materialize.versionOffset,
        Materialize.deletedFlag)

  /** Outbound incremental changefeed: the POST-IMAGE of every key whose
    * mirror state changed after `sinceVersion` — one row per changed
    * key, marked `_change_type` ('upsert'|'delete', deletes keep only
    * key columns) and `_commit_version` (the batch whose change
    * survived). Late event-time arrivals that lost the version race to
    * pre-checkpoint state emit nothing (the mirror didn't change), so a
    * consumer that applies the feed BLINDLY to its copy of the state as
    * of `sinceVersion` lands exactly on the mirror's current state —
    * the downstream half of the reference's replication chain (a sink
    * connector consuming row-level changes,
    * register-postgres-sink.json:15-17), emitted from the mirror
    * instead of the source DB.
    *
    * Cost: reads ONLY the delta segments with id > `sinceVersion` —
    * bytes ∝ new data since the consumer's checkpoint; the base (the
    * mirror-sized part) is never opened. At 100 TB this is what lets N
    * downstream consumers each poll at their own cadence without any of
    * them paying a table scan.
    *
    * Retention contract: compaction folds deltas into the base, and a
    * folded batch's per-batch identity is gone — when the base id has
    * advanced past `sinceVersion` this throws, and the consumer must
    * re-snapshot via [[read]] and resume from [[currentVersion]]. Size
    * `maxDeltas` (the retention window) to the slowest consumer's lag,
    * or run explicit `compact()` on a cadence that respects it. */
  def changesSince(spark: SparkSession, root: String,
                   sinceVersion: Long): DataFrame =
    asFeed(changesSinceVersioned(spark, root, sinceVersion))

  /** Replication-grade form of [[changesSince]]: the same per-key
    * POST-IMAGE window, but RETAINING the stored (`_v_ts_ms`,
    * `_v_offset`) version columns and tombstone flag alongside
    * `_commit_version` — a replicator re-applies source ordering
    * exactly, so a target mirror converges to byte-identical versioned
    * state.
    *
    * Post-image semantics: a window change that LOST the version race
    * to pre-checkpoint state (a late event-time arrival for a key whose
    * mirror value is already newer) changed nothing — it emits NO row.
    * Without this, a consumer applying the feed blindly would regress
    * such keys to the stale value. The check reads ONLY the key and
    * version columns of the pre-checkpoint segments (parquet prunes the
    * payload) and semi-joins the window's keys; version ties (the same
    * event redelivered in a later batch) resolve to the prior copy,
    * i.e. no emission. */
  def changesSinceVersioned(spark: SparkSession, root: String,
                            sinceVersion: Long): DataFrame = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    readManifest(fs, root) match {
      case None =>
        readVersioned(spark, root).withColumn(commitVersion, lit(-1L))
      case Some(m) =>
        m.base.filter(_ > sinceVersion).foreach(b => throw
          new RetentionLostException(
            s"LogMirror at $root folded batches up to $b into its base; " +
              s"the per-batch changes after $sinceVersion are gone " +
              "(retention = maxDeltas). Re-snapshot via read() and resume " +
              "from currentVersion()."))
        val window = m.deltas.filter(_ > sinceVersion)
        if (window.isEmpty) {
          // consumer is caught up: empty feed in the live schema
          val any = (m.deltas.lastOption.map(deltaPath(root, _)) orElse
            m.base.map(basePath(root, _))).get
          spark.read.parquet(any).drop("_bucket")
            .withColumn(commitVersion, lit(-1L)).limit(0)
        } else {
          val frames = window.map(v =>
            spark.read.parquet(deltaPath(root, v)).drop("_bucket")
              .withColumn(commitVersion, lit(v)))
          // commitVersion rides the payload through max_by, so each
          // surviving row carries the id of the batch that produced it
          val windowNet = reconcile(unionSegments(frames), m.keyCols)
          val verCols = Seq(Materialize.versionTs, Materialize.versionOffset)
          // prior version per affected key, from KEY+VERSION columns
          // only — the parquet scan prunes the payload (bytes ∝ key and
          // version columns of the older segments, not the mirror)
          val olderFrames =
            (m.base.map(v => spark.read.parquet(basePath(root, v))).toSeq ++
              m.deltas.filter(_ <= sinceVersion)
                .map(v => spark.read.parquet(deltaPath(root, v))))
              .map(_.select((m.keyCols ++ verCols).map(col): _*))
          if (olderFrames.isEmpty) windowNet
          else {
            val prior = olderFrames.reduce(_.unionByName(_))
              .join(windowNet.select(m.keyCols.map(col): _*), m.keyCols,
                "left_semi")
              .groupBy(m.keyCols.map(col): _*)
              .agg(max(struct(verCols.map(col): _*)).as("_prior_v"))
            // a window change emits only when it STRICTLY outranks the
            // pre-checkpoint version: late arrivals that lost the race
            // and exact redeliveries (ties) emit nothing
            windowNet.join(prior, m.keyCols, "left")
              .filter(col("_prior_v").isNull ||
                struct(verCols.map(col): _*) > col("_prior_v"))
              .drop("_prior_v")
          }
        }
    }
  }

  /** Point lookup: the base read prunes to the key's `_bucket=`
    * partition (manifest's stored n), each delta is key-filtered with
    * row-group stats doing the pruning (segments are key-sorted) — then
    * the handful of surviving rows reconcile. O(base partition +
    * #deltas row groups), never O(table). */
  def lookup(spark: SparkSession, root: String, keyCols: Seq[String],
             keyValues: Seq[Any]): DataFrame = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    readManifest(fs, root) match {
      case None => Materialize.stripVersions(readVersioned(spark, root))
      case Some(m) =>
        val schema = spark.read.parquet(
          (m.base.map(basePath(root, _)) orElse
            m.deltas.lastOption.map(deltaPath(root, _))).get).schema
        // typed literals: murmur3 hashes Int and Long differently, so an
        // uncast probe would compute a bucket the row isn't in
        val typed = keyCols.zip(keyValues).map { case (k, v) =>
          lit(v).cast(schema(k).dataType)
        }
        def keyFilter(df: DataFrame): DataFrame =
          keyCols.zip(typed).foldLeft(df)((d, kv) => d.filter(col(kv._1) === kv._2))
        val baseRows = m.base.map { v =>
          val b = spark.read.parquet(basePath(root, v))
          keyFilter(m.bucketCount match {
            case Some(n) if b.columns.contains("_bucket") =>
              b.filter(col("_bucket") === pmod(hash(typed: _*), lit(n)))
            case _ => b
          }).drop("_bucket")
        }.toSeq
        val deltaRows = m.deltas.map(v =>
          keyFilter(spark.read.parquet(deltaPath(root, v))))
        Materialize.stripVersions(
          reconcile(unionSegments(baseRows ++ deltaRows), keyCols))
    }
  }
}

/** [[LogMirror]] behind the [[MirrorSink]] interface — the in-repo
  * realization of the row-level MERGE sink the trait was declared for:
  * per-batch write cost ∝ batch size (delta-only writes), read-side
  * reconcile bounded by `maxDeltas`, compaction amortized. */
final case class LogMirrorSink(maxDeltas: Int = 16,
                               bucketCount: Option[Int] = None)
    extends MirrorSink {
  require(maxDeltas >= 1, "maxDeltas must be >= 1")

  override def merge(spark: SparkSession, tableRoot: String, changes: DataFrame,
                     keyCols: Seq[String], batchId: Long): Unit =
    LogMirror.merge(spark, tableRoot, changes, keyCols, batchId, maxDeltas,
      bucketCount)

  override def read(spark: SparkSession, tableRoot: String): DataFrame =
    LogMirror.read(spark, tableRoot)

  override def lookup(spark: SparkSession, tableRoot: String,
                      keyCols: Seq[String], keyValues: Seq[Any]): DataFrame =
    LogMirror.lookup(spark, tableRoot, keyCols, keyValues)

  /** The log layout versions natively: the latest manifest id IS the
    * last merged batch id. */
  override def lastBatchId(spark: SparkSession,
                           tableRoot: String): Option[Long] = {
    val root = new Path(tableRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    LogMirror.latestManifest(fs, tableRoot).flatMap(LogMirror.manifestId)
  }
}
