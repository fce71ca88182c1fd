package graft.functions

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data-skipping index — the Delta/Iceberg
  * file-stats idea on plain parquet directories.
  *
  * Parquet already prunes ROW GROUPS by footer min/max, but at 100 TB
  * the footer reads themselves are the cost: a selective point/range
  * query over a million files pays a million footer round-trips before
  * skipping anything. This index folds each file's column envelopes
  * into ONE tiny sidecar table (O(#files) rows, built with one scan),
  * so pruning is a metadata lookup and only surviving files are ever
  * opened. Pairs with [[Layout.zorderWrite]]: clustered layouts make
  * per-file envelopes tight, which is what makes skipping effective
  * (see `ZOrderSpec` for the span measurements).
  *
  * Freshness contract (same design as the MV rewrite's fingerprint):
  * the index records the exact file set it covered; if the directory's
  * current listing differs, [[prunedRead]] falls back to the full scan
  * — stale metadata can cost acceleration, never correctness.
  */
object StatsIndex {

  /** Sidecar directory: sibling of the data dir, never inside it (a
    * nested dir would pollute `spark.read.parquet(dataPath)`). */
  def statsPath(dataPath: String): String =
    dataPath.stripSuffix("/") + "._stats"

  /** Build the index over `cols` with one scan: per-file min/max per
    * column keyed by `input_file_name()`. */
  def build(spark: SparkSession, dataPath: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "stats index needs at least one column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dataPath)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(statsPath(dataPath))
  }

  /** Incremental maintenance: scan ONLY data files absent from the
    * sidecar, union their envelopes with the retained rows, and swap
    * the sidecar atomically (staged dir + rename — a crash between
    * delete and rename leaves no sidecar, which [[prunedRead]] treats
    * as stale → full scan, never a wrong prune). O(new files) data
    * work instead of [[build]]'s full rescan, which is the difference
    * between "the index keeps paying off" and "the index silently
    * degrades to full scans exactly when the table grows".
    *
    * Single-writer, append-only contract (same as [[build]]): rows of
    * files that vanished from the listing are dropped, but a REWRITE
    * that reuses a file name is invisible to the name-keyed compare —
    * rewriters must call [[build]]. */
  def append(spark: SparkSession, dataPath: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "stats index needs at least one column")
    maintainSidecar(spark, dataPath, statsPath(dataPath),
      () => build(spark, dataPath, cols),
      newFiles => {
        val aggs = cols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
        spark.read.parquet(newFiles: _*)
          .groupBy(input_file_name().as("file"))
          .agg(aggs.head, aggs.tail: _*)
      })
  }

  /** Shared O(new-files) sidecar maintenance skeleton ([[append]] and
    * [[BloomIndex.append]]): diff the data listing against the
    * sidecar's name-keyed rows, aggregate ONLY absent files, carry
    * existing rows verbatim, staged-dir atomic swap (crash between
    * delete and rename ⇒ no sidecar ⇒ stale ⇒ full-scan fallback,
    * never a wrong prune). The crash-atomicity ordering lives in ONE
    * place so the two indexes cannot diverge. */
  private[functions] def maintainSidecar(spark: SparkSession,
      dataPath: String, sidecar: String, rebuild: () => Unit,
      aggregateNewFiles: Seq[String] => DataFrame): Unit = {
    val sp = new Path(sidecar)
    val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(sp)) return rebuild()
    val actual = listDataFiles(spark, dataPath)
    val actualByName = actual.map(p => fileName(p) -> p).toMap
    val indexed = spark.read.parquet(sidecar)
    val indexedNames = indexed.select("file")
      .collect().map(r => fileName(r.getString(0))).toSet
    val newFiles = actualByName.filterNot { case (n, _) => indexedNames(n) }
      .values.toSeq.sorted
    val retainedNames = actualByName.keySet
    val retained = indexed.filter(
      udf((f: String) => retainedNames.contains(
        f.substring(f.lastIndexOf('/') + 1))).apply(col("file")))
    val merged =
      if (newFiles.isEmpty) retained
      else retained.unionByName(aggregateNewFiles(newFiles))
    val staged = new Path(sidecar + ".staged")
    merged.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    fs.delete(sp, true)
    fs.rename(staged, sp)
  }

  /** Files whose envelopes intersect EVERY `(col, lo, hi)` interval
    * (inclusive). O(#files) metadata work on the driver — the same
    * place Delta-style log replay does its pruning. */
  def prunedFiles(spark: SparkSession, dataPath: String,
      bounds: Seq[(String, Any, Any)]): Seq[String] = {
    require(bounds.nonEmpty, "pruning needs at least one interval")
    val cond = bounds.map { case (c, lo, hi) =>
      col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi)
    }.reduce(_ && _)
    spark.read.parquet(statsPath(dataPath))
      .filter(cond).select("file")
      .collect().map(_.getString(0)).toSeq
  }

  /** The interval scan: metadata-prune files, open only survivors,
    * re-apply the exact predicate. Bit-identical to the full
    * scan+filter — the envelope test can only discard files that
    * provably contain no matching row. Falls back to the full scan
    * when the index does not cover the directory's current file set.
    * The directory is listed ONCE and that single snapshot feeds both
    * the freshness compare and the survivor set actually read, so a
    * file landing between the two can never be silently excluded —
    * it either misses the snapshot entirely (plain batch-read
    * semantics) or flips the compare to stale → full scan. */
  def prunedRead(spark: SparkSession, dataPath: String,
      bounds: Seq[(String, Any, Any)]): DataFrame = {
    val pred = bounds.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    val snapshot = listDataFiles(spark, dataPath)
    if (!coveredBy(spark, dataPath, snapshot))
      return spark.read.parquet(dataPath).filter(pred)
    val surviving = prunedFiles(spark, dataPath, bounds)
      .map(fileName).toSet
    val files = snapshot.filter(p => surviving(fileName(p)))
    if (files.isEmpty) spark.read.parquet(dataPath).filter(lit(false))
    else spark.read.parquet(files: _*).filter(pred)
  }

  /** True iff the index covers exactly the data files present now. */
  def fresh(spark: SparkSession, dataPath: String): Boolean =
    coveredBy(spark, dataPath, listDataFiles(spark, dataPath))

  private def coveredBy(spark: SparkSession, dataPath: String,
      actual: Seq[String]): Boolean = {
    val sp = new Path(statsPath(dataPath))
    val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(sp)) return false
    val indexed = spark.read.parquet(statsPath(dataPath))
      .select("file").collect().map(_.getString(0)).toSet
    // compare by file NAME: input_file_name() returns fully-qualified
    // URIs whose scheme/authority rendering can differ from listStatus
    indexed.map(fileName) == actual.map(fileName).toSet
  }

  private[functions] def listDataFiles(spark: SparkSession,
      dataPath: String): Seq[String] = {
    val dp = new Path(dataPath)
    val fs = dp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dp).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toUri.toString)
  }

  private[functions] def fileName(p: String): String =
    p.substring(p.lastIndexOf('/') + 1)
}

/** File-level BLOOM skipping index — the point-lookup complement of
  * [[StatsIndex]]. Min/max envelopes prune range queries on CLUSTERED
  * layouts; on an unclustered (hash/arrival-ordered) layout every
  * file's envelope spans the whole key domain and envelope pruning
  * degenerates to a full scan. A per-file Bloom filter still works
  * there: a key lookup opens only the files whose filter admits the
  * key — false positives cost an extra file open, never a wrong
  * answer, and the exact predicate re-applies on read.
  *
  * Same sidecar/freshness contract as [[StatsIndex]]: one scan builds
  * O(#files) rows of (file, bloom bits) using Spark's own
  * `bloom_filter_agg` over `xxhash64(key)`; a listing mismatch falls
  * back to the full scan. Probing is a `might_contain` FILTER over the
  * sidecar rows — O(#files) metadata work, no data file opened until
  * the survivor set is known. */
object BloomIndex {

  def bloomPath(dataPath: String): String =
    dataPath.stripSuffix("/") + "._bloom"

  /** Build the sidecar for key column `keyCol`: one scan, one bloom
    * per file via Spark's native codegen'd aggregate ([[BloomFunctions
    * .bloom_agg]]). ~8 bits per expected item ≈ 2-3% false positives —
    * a fp costs one extra file open, never a wrong row. */
  def build(spark: SparkSession, dataPath: String, keyCol: String,
      expectedPerFile: Long = 200000L): Unit = {
    spark.read.parquet(dataPath)
      .groupBy(input_file_name().as("file"))
      .agg(BloomFunctions.bloom_agg(col(keyCol), expectedPerFile,
        expectedPerFile * 8).as("bloom"))
      .coalesce(1)
      .write.mode("overwrite").parquet(bloomPath(dataPath))
  }

  /** Incremental maintenance, mirroring [[StatsIndex.append]]: build
    * blooms ONLY for data files absent from the sidecar, carry the
    * existing rows verbatim, staged-dir atomic swap (a crash between
    * delete and rename leaves no sidecar → stale → full scan, never a
    * wrong prune). O(new files) data work; same single-writer,
    * append-only, name-keyed contract — rewriters call [[build]]. */
  def append(spark: SparkSession, dataPath: String, keyCol: String,
      expectedPerFile: Long = 200000L): Unit =
    StatsIndex.maintainSidecar(spark, dataPath, bloomPath(dataPath),
      () => build(spark, dataPath, keyCol, expectedPerFile),
      newFiles => spark.read.parquet(newFiles: _*)
        .groupBy(input_file_name().as("file"))
        .agg(BloomFunctions.bloom_agg(col(keyCol), expectedPerFile,
          expectedPerFile * 8).as("bloom")))

  /** Files whose Bloom filter admits `value` (plus, by construction, a
    * false-positive fraction). The probe runs on the DRIVER over the
    * O(#files) sidecar rows — `BloomFilterMightContain` only accepts
    * foldable/subquery bits, and a driver loop over file metadata is
    * the natural shape anyway (where Delta-log pruning lives). The
    * aggregate inserted `xxhash64(key)`, so the probe hashes the same
    * way before asking the sketch. */
  def candidateFiles(spark: SparkSession, dataPath: String,
      value: Column): Seq[String] = {
    val hash = spark.range(1).select(xxhash64(value)).head().getLong(0)
    spark.read.parquet(bloomPath(dataPath))
      .select("file", "bloom").collect()
      .filter { r =>
        org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
          .mightContainLong(hash)
      }
      .map(_.getString(0)).toSeq
  }

  /** Point-lookup read: open only Bloom-admitted files, re-apply the
    * exact equality. Bit-identical to the full scan+filter; stale
    * sidecar (listing mismatch) falls back to the full scan. */
  def prunedEqRead(spark: SparkSession, dataPath: String,
      keyCol: String, value: Column): DataFrame = {
    val pred = col(keyCol) === value
    val snapshot = StatsIndex.listDataFiles(spark, dataPath)
    if (!coveredBy(spark, dataPath, snapshot))
      return spark.read.parquet(dataPath).filter(pred)
    val surviving = candidateFiles(spark, dataPath, value)
      .map(StatsIndex.fileName).toSet
    val files = snapshot.filter(p => surviving(StatsIndex.fileName(p)))
    if (files.isEmpty) spark.read.parquet(dataPath).filter(lit(false))
    else spark.read.parquet(files: _*).filter(pred)
  }

  private def coveredBy(spark: SparkSession, dataPath: String,
      actual: Seq[String]): Boolean = {
    val bp = new Path(bloomPath(dataPath))
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(bp)) return false
    val indexed = spark.read.parquet(bloomPath(dataPath))
      .select("file").collect().map(_.getString(0)).toSet
    indexed.map(StatsIndex.fileName) ==
      actual.map(StatsIndex.fileName).toSet
  }
}
