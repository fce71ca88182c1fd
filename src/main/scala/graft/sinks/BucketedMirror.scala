package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.Materialize

/** Incremental CDC mirror: versioned per-bucket parquet directories
  * committed through an atomic pointer file — the layout that keeps a
  * keyed merge incremental at 100 TB.
  *
  * The plain swap mirror ([[graft.streaming.CdcPipeline.mergeIntoMirror]])
  * reads and REWRITES the whole table every batch: correct, but write
  * amplification is mirror_size/batch_size — unusable once the mirror
  * dwarfs the batch. Here the table is hash-bucketed by primary key
  * (`pmod(hash(pk), n)`) and a batch only touches the buckets its keys
  * fall in:
  *
  *   - merge reads ONLY the touched buckets' current version dirs
  *     (a path-pruned scan — no list/filter over the rest of the table),
  *   - writes each touched bucket as a NEW versioned dir
  *     `buckets/<b>/v<batchId>`,
  *   - commits by renaming a freshly written MANIFEST pointer file over
  *     the old one — a single atomic metadata operation, exactly the
  *     versioned-directory + pointer-file design of log-structured table
  *     formats (Delta/Iceberg); this is the minimal parquet-native form.
  *
  * Crash safety: data dirs are written BEFORE the manifest commit, so a
  * crash at any point leaves the old manifest pointing at the old
  * versions — readers never see partial state. Orphaned uncommitted
  * version dirs are swept lazily on the next successful commit.
  * Replays are idempotent: version ids are the batch id, so a replayed
  * batch rewrites the same dirs and re-commits the same manifest.
  *
  * Merge cost per batch: shuffle + rewrite ∝ (batch size + size of
  * touched buckets); with n buckets and uniformly hashed keys a batch
  * touching k keys costs ~(k/n)·mirror, not mirror. Bucket count is the
  * scale knob — at 100 TB choose n so a bucket ≈ a few GB.
  */
object BucketedMirror {

  // Manifests are never modified in place: each commit writes
  // MANIFEST-<batchId> via tmp-file + atomic rename, readers take the
  // highest id present. A crash at ANY point leaves either the previous
  // manifest as the max (commit never happened) or the new complete one
  // (rename is atomic) — there is no window where the table is missing
  // or partial.
  private def manifestId(p: Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("MANIFEST-")) n.stripPrefix("MANIFEST-").toLongOption
    else None
  }

  private def latestManifest(fs: FileSystem, root: String): Option[Path] = {
    val dir = new Path(root)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).map(_.getPath)
      .flatMap(p => manifestId(p).map(_ -> p))
      .sortBy(_._1).lastOption.map(_._2)
  }

  /** Reads bucket -> committed version. Absent manifest = empty table. */
  def readManifest(fs: FileSystem, root: String): Map[Int, Long] =
    readManifestFull(fs, root)._1

  /** The manifest's declared bucket count (header line `n:<count>`).
    * None for a never-written mirror or a pre-header manifest. */
  def readBucketCount(fs: FileSystem, root: String): Option[Int] =
    readManifestFull(fs, root)._2

  private def readManifestFull(fs: FileSystem,
                               root: String): (Map[Int, Long], Option[Int]) =
    latestManifest(fs, root) match {
      case None => (Map.empty, None)
      case Some(mf) =>
        val in = fs.open(mf)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        val lines = txt.linesIterator.filter(_.nonEmpty).toSeq
        val n = lines.collectFirst {
          case l if l.startsWith("n:") => l.stripPrefix("n:").toInt
        }
        val versions = lines.filterNot(_.startsWith("n:")).map { line =>
          val Array(b, v) = line.split(':')
          b.toInt -> v.toLong
        }.toMap
        (versions, n)
    }

  private def writeManifest(fs: FileSystem, root: String, batchId: Long,
                            versions: Map[Int, Long], nBuckets: Int): Unit = {
    val tmp = new Path(s"$root/.MANIFEST-$batchId.tmp")
    graft.core.LocalFs.writeSmall(fs, tmp, (s"n:$nBuckets" +:
      versions.toSeq.sorted.map { case (b, v) => s"$b:$v" })
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    val dst = new Path(s"$root/MANIFEST-$batchId")
    fs.delete(dst, false) // replay of the same batch recommits
    if (!fs.rename(tmp, dst)) sys.error(s"manifest commit failed for $root")
    // sweep superseded manifests (keep the newest only)
    fs.listStatus(new Path(root)).map(_.getPath)
      .filter(p => manifestId(p).exists(_ < batchId))
      .foreach(p => fs.delete(p, false))
  }

  private def bucketPath(root: String, b: Int, v: Long) =
    s"$root/buckets/$b/v$v"

  // Schema sidecar: the versioned row schema as DDL. Sidecars are
  // VERSIONED like manifests (`_SCHEMA-<batchId>`, tmp + atomic rename,
  // never modified in place): a reader always finds a complete sidecar —
  // there is no delete-then-rename window — and reads pick the sidecar
  // whose id matches the committed manifest, so a crash between the
  // sidecar write and the manifest commit leaves an orphan that no
  // reader selects (swept on the next successful commit). Lets an empty
  // mirror (all keys tombstone-compacted, buckets = empty marker dirs)
  // still serve correctly-schemed reads.
  private def schemaId(p: Path): Option[Long] = {
    val n = p.getName
    if (n == "_SCHEMA") Some(0L) // pre-versioning layout: treat as id 0
    else if (n.startsWith("_SCHEMA-")) n.stripPrefix("_SCHEMA-").toLongOption
    else None
  }

  private def writeSchema(fs: FileSystem, root: String, batchId: Long,
                          schema: org.apache.spark.sql.types.StructType): Unit = {
    val tmp = new Path(s"$root/._SCHEMA-$batchId.tmp")
    graft.core.LocalFs.writeSmall(fs, tmp,
      schema.toDDL.getBytes("UTF-8"))
    val dst = new Path(s"$root/_SCHEMA-$batchId")
    fs.delete(dst, false) // replay of the same batch recommits
    if (!fs.rename(tmp, dst)) sys.error(s"schema commit failed for $root")
  }

  /** Sidecar matching the committed manifest: greatest id ≤ the latest
    * manifest's id — an orphan from a crashed commit (newer than any
    * manifest) is never selected. */
  private def readSchema(fs: FileSystem,
                         root: String): Option[org.apache.spark.sql.types.StructType] = {
    val committed = latestManifest(fs, root).flatMap(manifestId)
    val dir = new Path(root)
    if (!fs.exists(dir)) return None
    val candidates = fs.listStatus(dir).map(_.getPath)
      .flatMap(p => schemaId(p).map(_ -> p))
      .filter { case (id, _) => committed.forall(id <= _) }
    candidates.sortBy(_._1).lastOption.map { case (_, p) =>
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      org.apache.spark.sql.types.StructType.fromDDL(txt)
    }
  }

  // Never-written mirror: no data, no sidecar. The minimal schema that
  // keeps read()'s stripVersions total — bookkeeping columns only.
  private def bookkeepingSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      s"`${Materialize.versionTs}` BIGINT, `${Materialize.versionOffset}` BIGINT, " +
        s"`${Materialize.deletedFlag}` BOOLEAN")

  private def bucketExpr(keyCols: Seq[String], n: Int) =
    pmod(hash(keyCols.map(col): _*), lit(n))

  /** Merge one unwrapped change batch into the mirror at `root`.
    * Only buckets containing batch keys are read or written. */
  def merge(spark: SparkSession, root: String, changes: DataFrame,
            keyCols: Seq[String], nBuckets: Int, batchId: Long): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val withBucket = changes.withColumn("_bucket", bucketExpr(keyCols, nBuckets))
      .persist()
    try {
      val touched = withBucket.select("_bucket").distinct()
        .collect().map(_.getInt(0)).sorted
      if (touched.isEmpty) return
      val prevManifestId = latestManifest(fs, root).flatMap(manifestId)
      val (current, storedN) = readManifestFull(fs, root)
      // a merge with the wrong bucket count would hash keys into buckets
      // the manifest doesn't know about and read the wrong dirs — rows
      // silently vanish. Fail loudly; migrate with [[rebucket]].
      storedN.filter(_ != nBuckets).foreach(n => sys.error(
        s"BucketedMirror at $root is bucketed n=$n but merge was called " +
          s"with nBuckets=$nBuckets; run rebucket() to change the layout"))

      // path-pruned read: only the touched buckets' committed dirs
      val livePaths = touched.filter(current.contains)
        .map(b => bucketPath(root, b, current(b)))
      val merged = {
        val batchPart = withBucket.drop("_bucket")
        val mirrorPart =
          if (livePaths.isEmpty) None
          else Some(spark.read.parquet(livePaths: _*).drop("_bucket"))
        mirrorPart match {
          case Some(m) => Materialize.merge(m, batchPart, keyCols)
          case None => Materialize.versionedState(batchPart, keyCols)
        }
      }

      // one distributed write of all touched buckets, partitioned so
      // each bucket lands in its own staging subdir. Write parallelism
      // scales with BATCH size, not touched-bucket count: a 40-event
      // steady-state batch touching 30 buckets writes from a couple of
      // tasks (partitionBy still splits the dirs), instead of paying 30
      // task commits for a handful of rows.
      val batchRows = withBucket.count() // cached; drives parallelism
      val nPart = math.max(1, math.min(touched.length,
        (batchRows / 50000L + 1).toInt * 4))
      val staging = new Path(s"$root/.staging-b$batchId")
      fs.delete(staging, true)
      merged
        .withColumn("_bucket", bucketExpr(keyCols, nBuckets))
        .repartition(nPart, col("_bucket"))
        // key-sorted within each bucket: parquet row-group min/max stats
        // then prune point lookups INSIDE the bucket too
        .sortWithinPartitions(("_bucket" +: keyCols).map(col): _*)
        .write.partitionBy("_bucket").mode("overwrite").parquet(staging.toString)

      // move each touched bucket's staging dir to its versioned home;
      // buckets whose keys were ALL tombstone-compacted away may be
      // absent from the write — they get an empty marker dir so the
      // version advances uniformly
      val next = touched.map { b =>
        val dst = new Path(bucketPath(root, b, batchId))
        fs.delete(dst, true) // replay leftovers
        fs.mkdirs(dst.getParent)
        val src = new Path(staging, s"_bucket=$b")
        if (fs.exists(src)) fs.rename(src, dst) else fs.mkdirs(dst)
        b -> batchId
      }.toMap
      fs.delete(staging, true)

      // atomic commit (sidecar first, manifest second — readers select
      // the sidecar by committed manifest id, so this order is crash-safe),
      // then lazy sweep of superseded/orphaned versions
      val committed = current ++ next
      writeSchema(fs, root, batchId, merged.schema)
      writeManifest(fs, root, batchId, committed, nBuckets)
      // sidecar sweep with ONE GENERATION of retention: keep the sidecar
      // the new manifest selects AND the one the previous committed
      // manifest selected — a concurrent reader that resolved the
      // previous manifest id must still find a sidecar <= its manifest
      // (sweeping everything < batchId would leave it only the too-new
      // sidecar and force the bookkeeping-schema fallback). Older
      // orphans, including a legacy bare `_SCHEMA` (id 0) once it is no
      // longer selected, are dropped.
      val sidecars = fs.listStatus(new Path(root)).map(_.getPath)
        .flatMap(p => schemaId(p).map(_ -> p))
      val keep = (prevManifestId.flatMap(prev =>
        sidecars.map(_._1).filter(_ <= prev).maxOption).toSeq :+ batchId).toSet
      sidecars.filterNot { case (id, _) => keep(id) }
        .foreach { case (_, p) => fs.delete(p, false) }
      touched.foreach { b =>
        val dir = new Path(s"$root/buckets/$b")
        if (fs.exists(dir)) fs.listStatus(dir)
          .filter(s => s.getPath.getName != s"v${committed(b)}")
          .foreach(s => fs.delete(s.getPath, true))
      }
    } finally withBucket.unpersist()
  }

  /** Versioned snapshot read (all buckets at their committed versions).
    * An empty mirror — never written, or every key tombstone-compacted
    * away — yields an EMPTY frame with the committed schema (from the
    * `_SCHEMA` sidecar), never an exception. */
  def readVersioned(spark: SparkSession, root: String): DataFrame = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = readManifest(fs, root)
    val paths = manifest.toSeq.sorted
      .map { case (b, v) => bucketPath(root, b, v) }
      // an empty marker dir has no parquet footers — skip it
      .filter(p => fs.listStatus(new Path(p)).exists(_.getPath.getName.endsWith(".parquet")))
    if (paths.nonEmpty) spark.read.parquet(paths: _*)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      readSchema(fs, root).getOrElse(bookkeepingSchema))
  }

  /** Live current-state read (tombstones and bookkeeping dropped). */
  def read(spark: SparkSession, root: String): DataFrame =
    Materialize.stripVersions(readVersioned(spark, root))

  /** Migrate the mirror to `newN` buckets: one full read of the
    * committed state, one partitioned rewrite, one manifest commit —
    * the ONLY operation that may change the bucket count (merges with a
    * mismatched count fail loudly instead of mis-routing keys). Run it
    * between batches when buckets outgrow their target size (the scale
    * knob: a bucket ≈ a few GB at 100 TB). Crash-safe like a merge: new
    * version dirs land before the manifest pointer flips, and a replay
    * with the same `batchId` recommits the same layout. `batchId` must
    * advance past the last committed manifest — readers resolve the
    * HIGHEST manifest id, so a lower id would commit a manifest nobody
    * reads while the sweep removes the dirs the old one points at.
    * Every bucket is rewritten and the old versions swept on commit, so
    * run it in a maintenance window (between batches, no concurrent
    * readers) — the same regime as any full-table rewrite. */
  def rebucket(spark: SparkSession, root: String, keyCols: Seq[String],
               newN: Int, batchId: Long): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prevManifestId = latestManifest(fs, root).flatMap(manifestId)
    prevManifestId.filter(_ >= batchId).foreach(prev => sys.error(
      s"rebucket batchId=$batchId must exceed the committed manifest id " +
        s"$prev at $root — readers take the highest id, so a lower commit " +
        "would be invisible while the sweep destroys the visible versions"))
    val state = readVersioned(spark, root)
    val staging = new Path(s"$root/.rebucket-b$batchId")
    fs.delete(staging, true)
    state
      .withColumn("_bucket", bucketExpr(keyCols, newN))
      .repartition(newN, col("_bucket"))
      .sortWithinPartitions(("_bucket" +: keyCols).map(col): _*)
      .write.partitionBy("_bucket").mode("overwrite").parquet(staging.toString)
    val next = (0 until newN).map { b =>
      val dst = new Path(bucketPath(root, b, batchId))
      fs.delete(dst, true)
      fs.mkdirs(dst.getParent)
      val src = new Path(staging, s"_bucket=$b")
      if (fs.exists(src)) fs.rename(src, dst) else fs.mkdirs(dst)
      b -> batchId
    }.toMap
    fs.delete(staging, true)
    writeSchema(fs, root, batchId, state.schema)
    writeManifest(fs, root, batchId, next, newN)
    // sweep the old layout: every bucket dir version the new manifest
    // doesn't point at (including buckets >= newN when shrinking),
    // plus superseded sidecars (same one-generation rule as merge)
    val bucketsRoot = new Path(s"$root/buckets")
    if (fs.exists(bucketsRoot)) fs.listStatus(bucketsRoot).foreach { st =>
      val b = st.getPath.getName.toIntOption
      b match {
        case Some(bid) if next.contains(bid) =>
          fs.listStatus(st.getPath)
            .filter(s => s.getPath.getName != s"v${next(bid)}")
            .foreach(s => fs.delete(s.getPath, true))
        case _ => fs.delete(st.getPath, true)
      }
    }
    val sidecars = fs.listStatus(new Path(root)).map(_.getPath)
      .flatMap(p => schemaId(p).map(_ -> p))
    val keep = (prevManifestId.flatMap(prev =>
      sidecars.map(_._1).filter(_ <= prev).maxOption).toSeq :+ batchId).toSet
    sidecars.filterNot { case (id, _) => keep(id) }
      .foreach { case (_, p) => fs.delete(p, false) }
  }

  /** Point lookup: resolves the key's bucket from the manifest and reads
    * ONLY that bucket's committed dir — O(bucket), not O(table). The
    * manifest's own bucket count wins over the caller's (a stale config
    * after a [[rebucket]] would otherwise probe the wrong bucket). */
  def lookup(spark: SparkSession, root: String, keyCols: Seq[String],
             keyValues: Seq[Any], nBuckets: Int): DataFrame = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (manifest, storedN) = readManifestFull(fs, root)
    // empty/never-written mirror: an empty (correctly-schemed when the
    // sidecar exists) result, matching the swap-mirror lookup path
    if (manifest.isEmpty)
      return Materialize.stripVersions(readVersioned(spark, root))
    // same typed-literal hash as the write side (cast avoids the
    // murmur3(Int) vs murmur3(Long) trap)
    val schema = readVersioned(spark, root).schema
    val typed = keyCols.zip(keyValues).map { case (k, v) =>
      lit(v).cast(schema(k).dataType)
    }
    val b = spark.range(1)
      .select(pmod(hash(typed: _*), lit(storedN.getOrElse(nBuckets))).as("b"))
      .head().getInt(0)
    manifest.get(b) match {
      case None => spark.emptyDataFrame
      case Some(v) =>
        val keyed = keyCols.zip(typed).foldLeft(
          spark.read.parquet(bucketPath(root, b, v)))(
          (df, kv) => df.filter(col(kv._1) === kv._2))
        Materialize.stripVersions(keyed)
    }
  }
}
