package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DedupFunctions._
import graft.functions.SimilarityFunctions.{cosine, dequantize, hyperplaneSignature, quantize8}
import graft.functions.TextFunctions.wordShingles

/** Cross-batch streaming near-duplicate detection: an append-only
  * MinHash-LSH band-key index on disk, probed by each arriving batch.
  *
  * Per batch: (1) signature + band keys for the new docs — narrow
  * per-row algebra plus one hash-agg keyed by doc; (2) equi-join the
  * batch's keys against the index on (band, key) → cross-batch
  * candidate pairs, plus a within-batch self-join; (3) append the
  * batch's keys to the index under `batch=<id>` (overwrite per batch
  * id, so a foreachBatch replay rewrites the same partition instead of
  * duplicating it — the probe result is deterministic and the index
  * stays exactly-once).
  *
  * Scale: the index grows with the corpus but the probe is an
  * equi-join keyed by (band, key) — shuffle ∝ batch keys + colliding
  * index keys, never an index scan per document. At 100 TB the index
  * would be bucketed by key hash so the join co-partitions
  * (`bucketBy`/Delta Z-order); the join shape is already the right
  * one. Sub-second triggers accrete one tiny dir per batch — fold them
  * periodically with [[compact]], which preserves replay semantics. Candidate pairs are LSH candidates — callers verify with
  * [[graft.functions.DedupFunctions.jaccard]] on the shingle sets of
  * the pair, exactly as in the batch path.
  */
object StreamingDedup {

  /** `compactEvery`: fold the index every N batches (after the batch's
    * keys commit) — the operational default for sub-second triggers;
    * None leaves compaction to explicit [[compact]] calls. */
  final case class Config(indexDir: String, k: Int = 32, bands: Int = 8,
                          shingleSize: Int = 3,
                          compactEvery: Option[Int] = None)

  private def batchDirId(p: Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("batch=")) n.stripPrefix("batch=").toLongOption else None
  }

  private def compactedId(p: Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("compacted=")) n.stripPrefix("compacted=").toLongOption
    else None
  }

  /** Index keys from batches strictly before `batchId`, or None when the
    * index is empty. `< batchId` (not `!= batchId`) so that after a
    * checkpoint reset/replay from an earlier offset, stale
    * higher-numbered keys are never probed — including keys INSIDE a
    * compacted segment, which keeps each key's original `batch` id as a
    * column (sorted, so the replay filter prunes row groups).
    *
    * Layout resolved here: the newest `compacted=<floor>` segment holds
    * every batch < floor folded by [[compact]] — [[resetBelowFloor]]
    * maintains that invariant across checkpoint resets, so the segment
    * filter is just `batch < batchId`. Loose dirs below the floor can
    * only be crash leftovers of a half-finished sweep whose keys the
    * segment already contains — probing them merely duplicates
    * candidates, which the callers' distinct() folds. */
  private def priorKeys(spark: org.apache.spark.sql.SparkSession,
                        fs: org.apache.hadoop.fs.FileSystem,
                        indexDir: String, batchId: Long): Option[DataFrame] = {
    val root = new Path(indexDir)
    if (!fs.exists(root)) return None
    val entries = fs.listStatus(root).map(_.getPath)
    val floor = entries.flatMap(compactedId(_)).maxOption.getOrElse(0L)
    val loose = entries
      .filter(p => batchDirId(p).exists(_ < batchId))
      .map(_.toString).sorted
    val looseDf =
      if (loose.isEmpty) None
      else Some(spark.read.parquet(loose.toSeq: _*))
    val compactedDf =
      if (floor == 0L) None
      else Some(spark.read.parquet(s"$indexDir/compacted=$floor")
        .filter(col("batch") < batchId).drop("batch"))
    (compactedDf.toSeq ++ looseDf.toSeq).reduceOption(_ unionByName _)
  }

  /** Restore the segment invariant after a checkpoint reset BELOW the
    * compaction floor: a batch about to be written with `batchId` <
    * floor means every segment key from `batchId` onward belongs to the
    * pre-reset timeline — it must never be probed again (the re-ingested
    * replacement keys arrive as new loose dirs). The segment is
    * truncated to `batch < batchId` and renamed `compacted=<batchId>`
    * (the floor drops to the reset point), and stale loose dirs >=
    * batchId from the old timeline are removed. Idempotent: a replay of
    * the same reset batch re-runs the truncation to the same result; a
    * crash between the new segment's rename and the old one's delete
    * self-heals on that replay. No-op in normal operation. */
  private def resetBelowFloor(spark: org.apache.spark.sql.SparkSession,
                              fs: org.apache.hadoop.fs.FileSystem,
                              indexDir: String, batchId: Long): Unit = {
    val root = new Path(indexDir)
    if (!fs.exists(root)) return
    val entries = fs.listStatus(root).map(_.getPath)
    val floor = entries.flatMap(compactedId(_)).maxOption.getOrElse(0L)
    if (floor == 0L || batchId >= floor) return
    val stale = spark.read.parquet(s"$indexDir/compacted=$floor")
    val truncated = stale.filter(col("batch") < batchId)
    if (truncated.isEmpty) () // reset to the very start: no segment at all
    else {
      val target = new Path(s"$indexDir/compacted=$batchId")
      val tmp = new Path(s"$indexDir/.compacting-$batchId")
      fs.delete(tmp, true)
      truncated.sortWithinPartitions("batch")
        .write.mode("overwrite").parquet(tmp.toString)
      fs.delete(target, true)
      if (!fs.rename(tmp, target))
        sys.error(s"segment truncation commit failed for $indexDir")
    }
    // drop the pre-reset segment and the old timeline's loose dirs
    entries.foreach { p =>
      if (compactedId(p).exists(_ > batchId) || batchDirId(p).exists(_ >= batchId))
        fs.delete(p, true)
    }
  }

  /** Fold every loose `batch=<id>` partition with id < `upTo` (plus any
    * previous compacted segment) into a single `compacted=<upTo>`
    * segment — the small-file compaction a 500 ms-trigger stream needs:
    * steady state otherwise accretes one tiny dir per trigger, and every
    * probe pays a full listing plus thousands of parquet footer reads.
    *
    * Keys keep their originating `batch` id as a column so a
    * checkpoint-reset replay below the compaction floor still probes
    * strictly-prior keys only. Crash-safe: the segment is staged and
    * atomically renamed BEFORE the folded sources are swept, so a probe
    * at any point sees either the old layout or the new one, never a
    * partial segment; a crash mid-sweep leaves already-folded leftovers
    * that [[priorKeys]] ignores and the next compact removes. Replays
    * of the same `upTo` are idempotent. */
  def compact(spark: org.apache.spark.sql.SparkSession, indexDir: String,
              upTo: Long): Unit = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val entries = fs.listStatus(root).map(_.getPath)
    val prevFloor = entries.flatMap(compactedId(_)).maxOption
    if (prevFloor.exists(_ >= upTo)) return // already folded this far
    val loose = entries
      .filter(p => batchDirId(p).exists(id => id >= prevFloor.getOrElse(0L) && id < upTo))
    if (loose.isEmpty) return // nothing new to fold — the floor must not
    // advance past batches that were never folded (a floor ahead of the
    // stream would make resetBelowFloor misread normal progress as a
    // checkpoint reset)
    // The new floor is bounded by what was ACTUALLY folded, not the
    // caller's upTo: a floor claiming unfolded (possibly still-arriving)
    // batches would let the sweep below delete a racing append that the
    // segment never absorbed.
    val boundary = math.min(upTo,
      loose.flatMap(batchDirId(_)).max + 1)
    val looseDf =
      // basePath surfaces the dir name as a `batch` partition column —
      // the id each key must carry into the segment
      spark.read.option("basePath", indexDir)
        .parquet(loose.map(_.toString).toSeq: _*)
        .withColumn("batch", col("batch").cast("long"))
    val prevDf = prevFloor.map(f => spark.read.parquet(s"$indexDir/compacted=$f"))
    val all = (prevDf.toSeq :+ looseDf).reduce(_ unionByName _)

    val target = new Path(s"$indexDir/compacted=$boundary")
    val tmp = new Path(s"$indexDir/.compacting-$boundary")
    fs.delete(tmp, true)
    all.sortWithinPartitions("batch") // row-group pruning for replays
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(target, true) // replayed compaction recommits
    if (!fs.rename(tmp, target)) sys.error(s"compaction commit failed for $indexDir")

    // sweep ONLY what the segment absorbed: the folded dirs, leftovers
    // below the previous floor (already inside the previous segment),
    // and superseded segments. A batch dir appended while the fold ran
    // is untouched — it stays loose and probed until the next fold.
    val foldedPaths = loose.map(_.toString).toSet
    fs.listStatus(root).map(_.getPath).foreach { p =>
      if (foldedPaths.contains(p.toString) ||
          batchDirId(p).exists(_ < prevFloor.getOrElse(0L)) ||
          compactedId(p).exists(_ != boundary))
        fs.delete(p, true)
    }
  }

  private def bandKeysOf(docs: DataFrame, idCol: String, textCol: String,
                         cfg: Config): DataFrame = {
    val shingled = docs.select(col(idCol).as("doc"),
      array_distinct(wordShingles(col(textCol), cfg.shingleSize)).as("sh"))
      .filter(size(col("sh")) > 0)
    minhashSignatures(shingled, "doc", "sh", cfg.k)
      .select(col("doc"),
        explode(lshBandKeys(col("sig"), cfg.bands, cfg.k / cfg.bands)).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Process one batch of documents: returns candidate near-dup pairs
    * `(a, b)` where `a` is a new doc and `b` an already-indexed doc
    * (cross-batch), or both are new with `a < b` (within-batch). The
    * batch's keys are committed to the index before returning.
    *
    * The returned frame is persisted and already materialized (its
    * lineage reads index partitions this method may later overwrite, so
    * caching is correctness, not an optimization) — the CALLER owns the
    * cache entry and must `unpersist()` it once consumed, typically at
    * the end of the enclosing `foreachBatch` body. */
  def processBatch(docs: DataFrame, idCol: String, textCol: String,
                   batchId: Long, cfg: Config): DataFrame = {
    val spark = docs.sparkSession
    val fs = new Path(cfg.indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    resetBelowFloor(spark, fs, cfg.indexDir, batchId)
    val keys = bandKeysOf(docs, idCol, textCol, cfg).persist()

    val intra = keys.as("l").join(keys.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.doc") < col("r.doc"))
      .select(col("l.doc").as("a"), col("r.doc").as("b"))

    // probe STRICTLY PRIOR batches only (< batchId, not != batchId):
    // a replayed batch must not pair its docs against themselves, and
    // after a checkpoint reset that reprocesses from an earlier offset,
    // stale higher-numbered batch dirs must not leak into candidates
    val cross = priorKeys(spark, fs, cfg.indexDir, batchId) match {
      case None => intra.limit(0)
      case Some(prior) =>
        keys.as("l").join(prior.as("r"),
            col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
              col("l.doc") =!= col("r.doc"))
          .select(col("l.doc").as("a"), col("r.doc").as("b"))
    }

    val pairs = intra.unionByName(cross).distinct()
      // materialize before the index write below invalidates nothing —
      // pairs only depend on `keys` (persisted) and prior partitions
      .persist()
    pairs.count()

    keys.write.mode("overwrite")
      .parquet(s"${cfg.indexDir}/batch=$batchId")
    keys.unpersist()
    cfg.compactEvery.foreach { every =>
      if (batchId > 0 && batchId % every == 0)
        compact(spark, cfg.indexDir, batchId) // folds strictly-prior dirs
    }
    pairs
  }

  /** Embedding-space analog: multi-table random-hyperplane LSH index
    * with INT8-QUANTIZED vectors (4-8× smaller index at 100 TB; the
    * quantization cosine error is bounded — see QuantizeSpec — so the
    * threshold applies to the dequantized score). Candidate pairs =
    * bucket collisions in ANY table, verified by cosine ≥ threshold
    * inside the join. */
  final case class AnnConfig(indexDir: String, nBits: Int = 12,
                             nTables: Int = 2, threshold: Double = 0.9)

  private def annKeysOf(vecs: DataFrame, idCol: String, vecCol: String,
                        cfg: AnnConfig): DataFrame =
    vecs.select(col(idCol).as("id"), quantize8(col(vecCol)).as("qv"),
        explode(array((0 until cfg.nTables).map(t => struct(lit(t).as("t"),
          hyperplaneSignature(col(vecCol), cfg.nBits, seed = t).as("bucket"))): _*))
          .as("tb"))
      .select(col("id"), col("qv"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))

  /** Returns verified near-dup pairs `(a, b, score)`; `a` is a new
    * vector, `b` indexed (cross-batch) or both new with `a < b`.
    * As with [[processBatch]], the result is persisted + materialized;
    * the caller must `unpersist()` it once consumed. */
  def processEmbeddingBatch(vecs: DataFrame, idCol: String, vecCol: String,
                            batchId: Long, cfg: AnnConfig): DataFrame = {
    val spark = vecs.sparkSession
    val fs = new Path(cfg.indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    resetBelowFloor(spark, fs, cfg.indexDir, batchId)
    val keys = annKeysOf(vecs, idCol, vecCol, cfg).persist()

    def verified(l: DataFrame, r: DataFrame, cond: Column) =
      l.as("l").join(r.as("r"),
          col("l.t") === col("r.t") && col("l.bucket") === col("r.bucket") && cond)
        .select(col("l.id").as("a"), col("r.id").as("b"),
          round(cosine(dequantize(col("l.qv")), dequantize(col("r.qv"))), 6)
            .as("score"))
        .filter(col("score") >= cfg.threshold)

    val intra = verified(keys, keys, col("l.id") < col("r.id"))
    val cross = priorKeys(spark, fs, cfg.indexDir, batchId) match {
      case None => intra.limit(0)
      case Some(prior) => verified(keys, prior, col("l.id") =!= col("r.id"))
    }

    val pairs = intra.unionByName(cross).distinct().persist()
    pairs.count()
    keys.write.mode("overwrite").parquet(s"${cfg.indexDir}/batch=$batchId")
    keys.unpersist()
    pairs
  }
}
