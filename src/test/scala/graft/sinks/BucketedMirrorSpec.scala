package graft.sinks

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Manifest-layout incremental mirror: correctness vs the one-shot
  * materialization, INCREMENTALITY (untouched buckets' files must not
  * be rewritten), crash-safety of the pointer-file commit, replay
  * idempotence, and single-bucket lookups. */
class BucketedMirrorSpec extends SparkSpec {
  import spark.implicits._

  private val keyCols = Seq("id")
  private val n = 8

  private def changes(rows: (Long, String, String, Long, Long)*): DataFrame =
    rows.toDF("id", "v", "op", "ts_ms", "offset")
      .selectExpr("id", "v", "op", "ts_ms", "'t' AS topic",
        "0 AS partition", "offset")

  private def fsOf(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def state(root: String): Map[Long, String] =
    BucketedMirror.read(spark, root).select("id", "v")
      .as[(Long, String)].collect().toMap

  test("never-written mirror reads/looks up as empty, never throws") {
    val root = Files.createTempDirectory("bm-empty").toString + "/none"
    assert(BucketedMirror.read(spark, root).count() == 0)
    assert(BucketedMirror.readVersioned(spark, root).count() == 0)
    assert(BucketedMirror.lookup(spark, root, keyCols, Seq(1L), n).count() == 0)
  }

  test("fully tombstone-compacted mirror keeps the committed schema") {
    val root = Files.createTempDirectory("bm-tomb").toString
    BucketedMirror.merge(spark, root,
      changes((1L, "a", "r", 1000L, 0L)), keyCols, n, batchId = 0)
    // delete the only key; live state is now empty
    BucketedMirror.merge(spark, root,
      changes((1L, "", "d", 2000L, 1L)), keyCols, n, batchId = 1)
    val live = BucketedMirror.read(spark, root)
    assert(live.count() == 0)
    // schema survives via the _SCHEMA sidecar: row columns still present
    assert(live.columns.toSet == Set("id", "v"))
    assert(BucketedMirror.lookup(spark, root, keyCols, Seq(1L), n).count() == 0)
  }

  test("sidecar sweep keeps one generation; legacy bare _SCHEMA is read") {
    val root = Files.createTempDirectory("bm-sc").toString
    val fs = fsOf(root)
    def sidecars: Set[String] = fs.listStatus(new Path(root))
      .map(_.getPath.getName).filter(_.startsWith("_SCHEMA")).toSet

    BucketedMirror.merge(spark, root,
      changes((1L, "a", "r", 1000L, 0L)), keyCols, n, batchId = 0)
    BucketedMirror.merge(spark, root,
      changes((2L, "b", "r", 2000L, 1L)), keyCols, n, batchId = 1)
    // a reader that resolved MANIFEST-0 before the batch-1 commit must
    // still find its sidecar: one generation of retention
    assert(sidecars == Set("_SCHEMA-0", "_SCHEMA-1"), sidecars)

    BucketedMirror.merge(spark, root,
      changes((3L, "c", "r", 3000L, 2L)), keyCols, n, batchId = 2)
    assert(sidecars == Set("_SCHEMA-1", "_SCHEMA-2"),
      s"two-generations-old sidecar must be swept: $sidecars")

    // pre-versioning mirrors wrote a bare `_SCHEMA`: still readable.
    // Empty the mirror (schema then comes from the sidecar alone) and
    // replace its versioned sidecars with the legacy name.
    (1L to 3L).zipWithIndex.foreach { case (id, i) =>
      BucketedMirror.merge(spark, root,
        changes((id, "", "d", 9000L + i, 10L + i)), keyCols, n, batchId = 3 + i)
    }
    val legacy = new Path(root, "_SCHEMA")
    assert(fs.rename(new Path(root, s"_SCHEMA-5"), legacy))
    fs.listStatus(new Path(root)).map(_.getPath)
      .filter(p => p.getName.startsWith("_SCHEMA-"))
      .foreach(p => fs.delete(p, false))
    val live = BucketedMirror.read(spark, root)
    assert(live.count() == 0)
    assert(live.columns.toSet == Set("id", "v"),
      s"legacy _SCHEMA not honored: ${live.columns.mkString(",")}")
  }

  test("bucket-count mismatch fails loudly; rebucket migrates the layout") {
    val root = Files.createTempDirectory("bm-rb").toString
    val fs = fsOf(root)
    BucketedMirror.merge(spark, root,
      changes((1L to 32L).map(i => (i, s"v$i", "r", 1000L, i)): _*),
      keyCols, n, batchId = 0)
    assert(BucketedMirror.readBucketCount(fs, root).contains(n))

    // a merge with the wrong count would hash keys into dirs the
    // manifest doesn't know about — it must refuse, not mis-route
    val err = intercept[RuntimeException] {
      BucketedMirror.merge(spark, root,
        changes((1L, "x", "u", 2000L, 40L)), keyCols, nBuckets = 16, batchId = 1)
    }
    assert(err.getMessage.contains("rebucket"))

    // migrate 8 -> 16 buckets: state preserved, new layout committed
    BucketedMirror.rebucket(spark, root, keyCols, newN = 16, batchId = 1)
    assert(BucketedMirror.readBucketCount(fs, root).contains(16))
    assert(state(root) == (1L to 32L).map(i => i -> s"v$i").toMap)

    // merges and lookups continue on the new layout
    BucketedMirror.merge(spark, root,
      changes((1L, "x", "u", 2000L, 40L), (33L, "new", "c", 2000L, 41L)),
      keyCols, nBuckets = 16, batchId = 2)
    assert(state(root)(1L) == "x" && state(root)(33L) == "new")
    // a STALE caller count can't mis-probe: the manifest's n wins
    val hit = BucketedMirror.lookup(spark, root, keyCols, Seq(33L), n)
      .select("id", "v").as[(Long, String)].collect().toSeq
    assert(hit == Seq((33L, "new")), s"stale-n lookup mis-probed: $hit")

    // shrink back down: buckets beyond the new count are swept
    BucketedMirror.rebucket(spark, root, keyCols, newN = 4, batchId = 3)
    assert(state(root).size == 33)
    val bucketDirs = fs.listStatus(new Path(s"$root/buckets"))
      .map(_.getPath.getName.toInt).toSet
    assert(bucketDirs == (0 until 4).toSet, s"old buckets not swept: $bucketDirs")
  }

  test("pre-header manifests (no n: line) stay readable and mergeable") {
    val root = Files.createTempDirectory("bm-legacy").toString
    val fs = fsOf(root)
    BucketedMirror.merge(spark, root,
      changes((1L, "a", "r", 1000L, 0L)), keyCols, n, batchId = 0)
    // strip the header line, simulating a manifest written before the
    // bucket count was recorded
    val mf = fs.listStatus(new Path(root)).map(_.getPath)
      .filter(_.getName.startsWith("MANIFEST-")).head
    val in = fs.open(mf)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val out = fs.create(mf, true)
    try out.write(txt.linesIterator.filterNot(_.startsWith("n:"))
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()

    assert(BucketedMirror.readBucketCount(fs, root).isEmpty)
    assert(state(root) == Map(1L -> "a"))
    // legacy mirrors merge without the guard (count unknown) and the
    // next commit records the count
    BucketedMirror.merge(spark, root,
      changes((2L, "b", "c", 2000L, 1L)), keyCols, n, batchId = 1)
    assert(BucketedMirror.readBucketCount(fs, root).contains(n))
    assert(state(root) == Map(1L -> "a", 2L -> "b"))
  }

  test("chained incremental merges equal one-shot materialization") {
    val root = Files.createTempDirectory("bm").toString
    val b1 = changes((1L, "a", "r", 1000L, 0L), (2L, "b", "r", 1000L, 1L),
      (3L, "c", "r", 1000L, 2L))
    val b2 = changes((1L, "a2", "u", 2000L, 3L), (2L, "", "d", 2000L, 4L),
      (4L, "d", "c", 2000L, 5L))
    BucketedMirror.merge(spark, root, b1, keyCols, n, batchId = 0)
    BucketedMirror.merge(spark, root, b2, keyCols, n, batchId = 1)
    assert(state(root) == Map(1L -> "a2", 3L -> "c", 4L -> "d"))
  }

  test("merge rewrites ONLY touched buckets; untouched files untouched") {
    val root = Files.createTempDirectory("bm").toString
    val fs = fsOf(root)
    // spread 64 keys over all 8 buckets
    BucketedMirror.merge(spark, root,
      changes((1L to 64L).map(i => (i, s"v$i", "r", 1000L, i)): _*),
      keyCols, n, batchId = 0)
    val before = BucketedMirror.readManifest(fs, root)
    assert(before.values.forall(_ == 0L) && before.size == n)

    // one-key batch: exactly one bucket may advance
    BucketedMirror.merge(spark, root,
      changes((7L, "v7b", "u", 2000L, 100L)), keyCols, n, batchId = 1)
    val after = BucketedMirror.readManifest(fs, root)
    assert(after.count(_._2 == 1L) == 1,
      s"exactly one bucket should advance: $after")
    assert(after.count(_._2 == 0L) == n - 1)
    // untouched buckets still point at their ORIGINAL v0 dirs (same
    // files, zero write amplification outside the touched bucket)
    val touched = after.collectFirst { case (b, 1L) => b }.get
    (0 until n).filterNot(_ == touched).foreach { b =>
      assert(fs.exists(new Path(s"$root/buckets/$b/v0")))
      assert(!fs.exists(new Path(s"$root/buckets/$b/v1")))
    }
    assert(state(root)(7L) == "v7b")
    assert(state(root).size == 64)
  }

  test("crash before manifest commit leaves the previous state readable") {
    val root = Files.createTempDirectory("bm").toString
    val fs = fsOf(root)
    BucketedMirror.merge(spark, root,
      changes((1L, "a", "r", 1000L, 0L)), keyCols, n, batchId = 0)
    // simulate a crashed batch-1: orphan version dirs + staging exist,
    // but no MANIFEST-1 was committed
    val b = BucketedMirror.readManifest(fs, root).keys.head
    fs.mkdirs(new Path(s"$root/buckets/$b/v1"))
    fs.mkdirs(new Path(s"$root/.staging-b1"))
    assert(state(root) == Map(1L -> "a"), "reader must follow the manifest")
    // the next successful merge of the same batch id supersedes orphans
    BucketedMirror.merge(spark, root,
      changes((1L, "a1", "u", 2000L, 1L)), keyCols, n, batchId = 1)
    assert(state(root) == Map(1L -> "a1"))
  }

  test("replaying a batch is idempotent") {
    val root = Files.createTempDirectory("bm").toString
    val b1 = changes((1L, "a", "r", 1000L, 0L), (2L, "b", "r", 1000L, 1L))
    val b2 = changes((2L, "b2", "u", 2000L, 2L))
    BucketedMirror.merge(spark, root, b1, keyCols, n, batchId = 0)
    BucketedMirror.merge(spark, root, b2, keyCols, n, batchId = 1)
    val first = state(root)
    BucketedMirror.merge(spark, root, b2, keyCols, n, batchId = 1) // replay
    assert(state(root) == first)
    assert(first == Map(1L -> "a", 2L -> "b2"))
  }

  test("delete-then-reinsert across batches resolves by version") {
    val root = Files.createTempDirectory("bm").toString
    BucketedMirror.merge(spark, root,
      changes((5L, "x", "r", 1000L, 0L)), keyCols, n, 0)
    BucketedMirror.merge(spark, root,
      changes((5L, "", "d", 2000L, 1L)), keyCols, n, 1)
    assert(state(root).isEmpty || !state(root).contains(5L))
    BucketedMirror.merge(spark, root,
      changes((5L, "x2", "c", 3000L, 2L)), keyCols, n, 2)
    assert(state(root) == Map(5L -> "x2"))
    // and a LATE older change cannot resurrect the pre-delete value
    BucketedMirror.merge(spark, root,
      changes((5L, "stale", "u", 1500L, 9L)), keyCols, n, 3)
    assert(state(root) == Map(5L -> "x2"))
  }

  test("lookup reads exactly one bucket dir") {
    val root = Files.createTempDirectory("bm").toString
    BucketedMirror.merge(spark, root,
      changes((1L to 32L).map(i => (i, s"v$i", "r", 1000L, i)): _*),
      keyCols, n, batchId = 0)
    val out = BucketedMirror.lookup(spark, root, keyCols, Seq(13L), n)
    assert(out.select("id", "v").as[(Long, String)].collect().toSeq ==
      Seq((13L, "v13")))
    // mistyped probe literal (Int for Long key) still lands in the bucket
    val outInt = BucketedMirror.lookup(spark, root, keyCols, Seq(13), n)
    assert(outInt.count() == 1)
    // plan-level: exactly one bucket dir is scanned
    val scanned = out.queryExecution.executedPlan.toString
    assert(scanned.contains("buckets/"), scanned)
  }

  test("pipeline end-to-end with incrementalMirror config") {
    val root = Files.createTempDirectory("bm-pipe").toString
    val cfg = graft.streaming.CdcPipeline.Config(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))),
      Seq("id"), s"$root/mirror", s"$root/dlq", s"$root/ckpt",
      bucketCount = Some(4), incrementalMirror = true)
    def rec(id: Long, v: String, op: String, ts: Long, off: Long) =
      (s"mysql-server.pos_bi_db.ventas", s"""{"payload":{"id":$id}}""",
        if (op == "d") s"""{"payload":{"after":null,"op":"d","ts_ms":$ts}}"""
        else s"""{"payload":{"after":{"id":$id,"v":"$v"},"op":"$op","ts_ms":$ts}}""",
        0, off)
    val b1 = Seq(rec(1, "a", "r", 1000, 0), rec(2, "b", "r", 1000, 1))
      .toDF("topic", "key", "value", "partition", "offset")
    val b2 = Seq(rec(1, "a2", "u", 2000, 2), rec(2, "", "d", 2000, 3))
      .toDF("topic", "key", "value", "partition", "offset")
    graft.streaming.CdcPipeline.processBatch(b1, 0L, cfg)
    graft.streaming.CdcPipeline.processBatch(b2, 1L, cfg)
    val rows = graft.streaming.CdcPipeline.mirror(spark, cfg, "ventas")
      .select("id", "v").as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "a2")))
    val hit = graft.streaming.CdcPipeline.lookup(spark, cfg, "ventas", Seq(1L))
    assert(hit.select("v").as[String].collect().toSeq == Seq("a2"))
  }
}
