package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while counting rows in a distributed table scan pipeline"

  private def cfg() = StreamingDedup.Config(
    Files.createTempDirectory("graft-sdedup").toString + "/index")

  test("near-dup arriving in a later batch is detected against the index") {
    val c = cfg()
    val b1 = Seq(
      (1L, base),
      (2L, "completely different words about streams joins and windows " +
        "aggregations watermarks triggers checkpoints and state stores")).toDF("doc_id", "text")
    val p1 = StreamingDedup.processBatch(b1, "doc_id", "text", 0L, c)
    assert(p1.count() == 0, "unrelated docs must not pair")

    val b2 = Seq(
      (3L, base + " extra"), // near-dup of doc 1
      (4L, "yet another unrelated document mentioning parquet files " +
        "manifests buckets partitions and compaction strategies entirely")).toDF("doc_id", "text")
    val p2 = StreamingDedup.processBatch(b2, "doc_id", "text", 1L, c)
      .as[(Long, Long)].collect().toSet
    assert(p2.contains((3L, 1L)), s"cross-batch near-dup missed: $p2")
    assert(!p2.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated new doc must not pair: $p2")
  }

  test("replayed batch is idempotent: no self-pairs, index not duplicated") {
    val c = cfg()
    val b1 = Seq((1L, base)).toDF("doc_id", "text")
    StreamingDedup.processBatch(b1, "doc_id", "text", 0L, c)
    // replay the same batch id — its own keys are excluded from probe
    val replay = StreamingDedup.processBatch(b1, "doc_id", "text", 0L, c)
    assert(replay.count() == 0, "replay must not pair a doc with itself")
    // index holds exactly one copy of the batch partition
    val idx = spark.read.parquet(s"${c.indexDir}/batch=0")
    assert(idx.select("doc").distinct().count() == 1)
  }

  test("checkpoint reset: stale higher-numbered index batches are not probed") {
    val c = cfg()
    StreamingDedup.processBatch(
      Seq((1L, base)).toDF("doc_id", "text"), "doc_id", "text", 0L, c)
    StreamingDedup.processBatch(
      Seq((5L, base + " tail")).toDF("doc_id", "text"), "doc_id", "text", 2L, c)
    // reset to an earlier offset: batch id 1 replays while a stale
    // batch=2 dir (doc 5, a near-dup) still exists on disk — candidates
    // must only come from batches STRICTLY BEFORE 1, i.e. doc 1
    val pairs = StreamingDedup.processBatch(
      Seq((3L, base + " extra")).toDF("doc_id", "text"), "doc_id", "text", 1L, c)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 1L)), s"prior-batch near-dup missed: $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
      s"stale future-batch doc must not appear in candidates: $pairs")
  }

  test("compaction folds batch dirs into one segment; probes unchanged") {
    val c = cfg()
    val unrelated = "completely different words about streams joins and " +
      "windows aggregations watermarks triggers checkpoints state stores"
    StreamingDedup.processBatch(
      Seq((1L, base)).toDF("doc_id", "text"), "doc_id", "text", 0L, c)
    StreamingDedup.processBatch(
      Seq((2L, unrelated)).toDF("doc_id", "text"), "doc_id", "text", 1L, c)
    StreamingDedup.processBatch(
      Seq((3L, unrelated + " suffix")).toDF("doc_id", "text"), "doc_id", "text", 2L, c)

    StreamingDedup.compact(spark, c.indexDir, upTo = 3L)
    val fs = new org.apache.hadoop.fs.Path(c.indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(c.indexDir))
      .map(_.getPath.getName).toSet
    assert(names == Set("compacted=3"), s"loose dirs must be folded: $names")

    // a probe against the compacted segment behaves exactly as before
    val pairs = StreamingDedup.processBatch(
      Seq((9L, base + " extra")).toDF("doc_id", "text"), "doc_id", "text", 3L, c)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((9L, 1L)), s"compacted probe diverged: $pairs")

    // incremental compaction folds the previous segment + new batches
    StreamingDedup.compact(spark, c.indexDir, upTo = 4L)
    val pairs2 = StreamingDedup.processBatch(
      Seq((10L, base + " more")).toDF("doc_id", "text"), "doc_id", "text", 4L, c)
      .as[(Long, Long)].collect().toSet
    assert(pairs2 == Set((10L, 1L), (10L, 9L)), s"recompacted probe diverged: $pairs2")
  }

  test("checkpoint reset below the compaction floor probes strictly-" +
    "prior keys only") {
    val c = cfg()
    StreamingDedup.processBatch(
      Seq((1L, base)).toDF("doc_id", "text"), "doc_id", "text", 0L, c)
    StreamingDedup.processBatch(
      Seq((5L, base + " tail")).toDF("doc_id", "text"), "doc_id", "text", 2L, c)
    StreamingDedup.compact(spark, c.indexDir, upTo = 3L)
    // replay batch 1 with the whole index folded into compacted=3: doc 5
    // (batch 2, a near-dup) is INSIDE the segment but must not be probed
    val pairs = StreamingDedup.processBatch(
      Seq((3L, base + " extra")).toDF("doc_id", "text"), "doc_id", "text", 1L, c)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 1L)), s"prior-batch near-dup missed: $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
      s"compacted future-batch keys must not be probed on replay: $pairs")
  }

  test("compactEvery folds the index automatically as batches flow") {
    val c = StreamingDedup.Config(
      Files.createTempDirectory("graft-sdedup-auto").toString + "/index",
      compactEvery = Some(2))
    val unrelated = Seq(
      "first body about shuffles exchanges and partition counts overall",
      "second body counting parquet footers manifests and bucket layouts",
      "third body on watermarks state stores and trigger cadence matters",
      "fourth body mentioning salting skew and replicated dimension rows")
    unrelated.zipWithIndex.foreach { case (t, i) =>
      StreamingDedup.processBatch(
        Seq((10L + i, t)).toDF("doc_id", "text"), "doc_id", "text", i.toLong, c)
    }
    val fs = new org.apache.hadoop.fs.Path(c.indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(c.indexDir))
      .map(_.getPath.getName).toSet
    // batch 2 folded {0,1}; batch 3 stays loose until the next boundary
    assert(names == Set("compacted=2", "batch=2", "batch=3"), names)
    // probes unaffected: a near-dup of batch 0's doc still surfaces
    val pairs = StreamingDedup.processBatch(
      Seq((50L, unrelated.head + " probe")).toDF("doc_id", "text"),
      "doc_id", "text", 4L, c)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((50L, 10L)), s"auto-compacted probe diverged: $pairs")
  }

  test("checkpoint reset BELOW the compaction floor: pre-reset segment " +
    "keys from the reset point onward are never probed; re-ingested " +
    "batches are") {
    val c = cfg()
    val keepText = "stable early document that predates the reset " +
      "and must remain probe-able forever after truncation"
    val staleText = base // pre-reset timeline content at batch 2
    StreamingDedup.processBatch(
      Seq((1L, keepText)).toDF("doc_id", "text"), "doc_id", "text", 0L, c)
    StreamingDedup.processBatch(
      Seq((2L, staleText)).toDF("doc_id", "text"), "doc_id", "text", 1L, c)
    StreamingDedup.compact(spark, c.indexDir, upTo = 2L)

    // reset to batch 1, which now re-ingests DIFFERENT content
    val newText = "entirely new replacement content flowing after the " +
      "checkpoint reset replaced what batch one used to hold"
    StreamingDedup.processBatch(
      Seq((5L, newText)).toDF("doc_id", "text"), "doc_id", "text", 1L, c)

    // batch 2 of the new timeline: near-dups of the STALE batch-1 text
    // must find nothing (those keys were truncated out of the segment);
    // near-dups of the kept batch-0 text and the re-ingested batch-1
    // text must both surface
    val pairs = StreamingDedup.processBatch(
      Seq((7L, staleText + " probe"), (8L, keepText + " probe"),
        (9L, newText + " probe")).toDF("doc_id", "text"),
      "doc_id", "text", 2L, c)
      .as[(Long, Long)].collect().toSet
    assert(!pairs.contains((7L, 2L)),
      s"stale pre-reset segment key was probed: $pairs")
    assert(pairs.contains((8L, 1L)), s"pre-reset-point key lost: $pairs")
    assert(pairs.contains((9L, 5L)), s"re-ingested key not probed: $pairs")
  }

  test("crash leftovers below the compaction floor are ignored, not " +
    "double-probed") {
    val c = cfg()
    StreamingDedup.processBatch(
      Seq((1L, base)).toDF("doc_id", "text"), "doc_id", "text", 0L, c)
    // simulate a crash mid-sweep: the segment committed but batch=0
    // survived — copy it aside, compact, then restore the leftover
    val fs = new org.apache.hadoop.fs.Path(c.indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keep = spark.read.parquet(s"${c.indexDir}/batch=0").collect()
    val schema = spark.read.parquet(s"${c.indexDir}/batch=0").schema
    StreamingDedup.compact(spark, c.indexDir, upTo = 1L)
    spark.createDataFrame(
      spark.sparkContext.parallelize(keep.toIndexedSeq), schema)
      .write.parquet(s"${c.indexDir}/batch=0")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"${c.indexDir}/batch=0")))

    val pairs = StreamingDedup.processBatch(
      Seq((7L, base + " extra")).toDF("doc_id", "text"), "doc_id", "text", 1L, c)
    // the leftover duplicates the segment's keys; candidates must still
    // be the distinct pair set
    assert(pairs.as[(Long, Long)].collect().toSet == Set((7L, 1L)))
    // and the next compaction sweeps the leftover for good
    StreamingDedup.compact(spark, c.indexDir, upTo = 2L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${c.indexDir}/batch=0")))
  }

  test("embedding probe: cross-batch near-identical vector detected") {
    val c = StreamingDedup.AnnConfig(
      Files.createTempDirectory("graft-sann").toString + "/index")
    val dim = 16
    def unit(axis: Int): Seq[Double] =
      (0 until dim).map(i => if (i == axis) 1.0 else 0.0)
    def nearly(axis: Int): Seq[Double] =
      (0 until dim).map(i => if (i == axis) 0.99 else 0.002)
    val b1 = Seq((1L, unit(0)), (2L, unit(5))).toDF("vec_id", "embedding")
    val p1 = StreamingDedup.processEmbeddingBatch(
      b1, "vec_id", "embedding", 0L, c)
    assert(p1.count() == 0, "orthogonal vectors must not pair")

    val b2 = Seq((3L, nearly(0)), (4L, unit(11))).toDF("vec_id", "embedding")
    val p2 = StreamingDedup.processEmbeddingBatch(
      b2, "vec_id", "embedding", 1L, c)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(p2.contains((3L, 1L)), s"cross-batch embedding dup missed: $p2")
    assert(!p2.exists(p => p._1 == 4L || p._2 == 4L), s"spurious pair: $p2")
  }

  test("within-batch near-dups also surface") {
    val c = cfg()
    val b = Seq((10L, base), (11L, base + " tail")).toDF("doc_id", "text")
    val p = StreamingDedup.processBatch(b, "doc_id", "text", 0L, c)
      .as[(Long, Long)].collect().toSet
    assert(p.contains((10L, 11L)), s"within-batch pair missed: $p")
  }
}
