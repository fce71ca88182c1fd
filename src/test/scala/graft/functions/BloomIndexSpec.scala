package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  // arrival-ordered (UNclustered) keys: every file's min/max envelope
  // spans nearly the whole domain, so envelope pruning is useless here
  // — exactly the layout Bloom skipping exists for
  private def scattered = (0 until 20000)
    .map(i => ((i * 7919L) % 20011L, i.toLong)).toDF("k", "payload")
    .repartition(8)

  test("on an unclustered layout the envelope index prunes nothing but " +
    "the Bloom index opens a strict subset, bit-identically") {
    val dir = Files.createTempDirectory("bloomidx").toString + "/d1"
    scattered.write.parquet(dir)
    StatsIndex.build(spark, dir, Seq("k"))
    BloomIndex.build(spark, dir, "k", expectedPerFile = 4000L)

    val total = spark.read.parquet(dir).select(input_file_name())
      .distinct().count()
    // envelope pruning degenerates: the point interval intersects
    // every file's (near-full-domain) envelope
    val probe = 4242L * 7919L % 20011L
    val envelope = StatsIndex.prunedFiles(spark, dir,
      Seq[(String, Any, Any)](("k", probe, probe))).size
    assert(envelope == total, s"unclustered envelopes should not prune: " +
      s"$envelope of $total")
    val bloom = BloomIndex.candidateFiles(spark, dir, lit(probe)).size
    assert(bloom < total, s"bloom must prune: $bloom of $total")

    val got = BloomIndex.prunedEqRead(spark, dir, "k", lit(probe))
      .select("payload").as[Long].collect().sorted
    val exact = spark.read.parquet(dir).filter($"k" === probe)
      .select("payload").as[Long].collect().sorted
    assert(got.sameElements(exact) && got.nonEmpty)
  }

  test("an absent key prunes everything yet stays correct; a stale " +
    "sidecar falls back to the full scan") {
    val dir = Files.createTempDirectory("bloomidx").toString + "/d2"
    scattered.write.parquet(dir)
    BloomIndex.build(spark, dir, "k", expectedPerFile = 4000L)

    // 20011 is outside the residue set (k = i*7919 mod 20011 < 20011,
    // and 20011 itself never occurs for i < 20000)
    assert(BloomIndex.prunedEqRead(spark, dir, "k", lit(999999L)).count() == 0)

    // new data lands without a rebuild: the pruned read must not hide it
    Seq((999999L, -1L)).toDF("k", "payload")
      .coalesce(1).write.mode("append").parquet(dir)
    val got = BloomIndex.prunedEqRead(spark, dir, "k", lit(999999L))
      .select("payload").as[Long].collect()
    assert(got.toSeq == Seq(-1L),
      s"stale bloom sidecar must fall back to the full scan: ${got.toSeq}")
  }

  test("append blooms only the new files — existing sidecar rows carry " +
    "over byte-identically, and the refreshed index serves the new key") {
    val dir = Files.createTempDirectory("bloomidx").toString + "/d3"
    scattered.write.parquet(dir)
    BloomIndex.build(spark, dir, "k", expectedPerFile = 4000L)
    val before = spark.read.parquet(BloomIndex.bloomPath(dir))
      .collect().map(r => r.getString(0) ->
        r.getAs[Array[Byte]](1).toSeq).toMap

    // a new file with an out-of-domain key, then O(new-files) append
    Seq((999999L, -1L)).toDF("k", "payload")
      .coalesce(1).write.mode("append").parquet(dir)
    BloomIndex.append(spark, dir, "k", expectedPerFile = 4000L)

    val after = spark.read.parquet(BloomIndex.bloomPath(dir))
      .collect().map(r => r.getString(0) ->
        r.getAs[Array[Byte]](1).toSeq).toMap
    // every pre-append bloom survives byte-identical (append never
    // re-derived it) and exactly one new-file row was added
    before.foreach { case (f, bits) =>
      assert(after.get(f).contains(bits), s"bloom of $f changed on append")
    }
    assert(after.size == before.size + 1, s"${after.size} vs ${before.size}")

    // the new key prunes to the one new file and reads correctly
    assert(BloomIndex.candidateFiles(spark, dir, lit(999999L)).size == 1)
    val got = BloomIndex.prunedEqRead(spark, dir, "k", lit(999999L))
      .select("payload").as[Long].collect()
    assert(got.toSeq == Seq(-1L))
  }
}
