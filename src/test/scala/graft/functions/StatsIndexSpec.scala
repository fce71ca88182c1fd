package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsIndexSpec extends SparkSpec {
  import spark.implicits._

  private def grid = (0 until 10000)
    .map(i => (i.toLong, (i % 100).toLong, (i / 100).toLong))
    .toDF("id", "x", "y")

  test("pruned read equals the full filter and opens fewer files on a " +
    "clustered layout") {
    val dir = Files.createTempDirectory("statsidx").toString + "/zo"
    Layout.zorderWrite(grid, "x", "y", dir, nFiles = 16)
    StatsIndex.build(spark, dir, Seq("x", "y"))
    assert(StatsIndex.fresh(spark, dir))

    val bounds = Seq[(String, Any, Any)](("x", 10L, 19L), ("y", 10L, 19L))
    val total = spark.read.parquet(dir).select(input_file_name())
      .distinct().count()
    val picked = StatsIndex.prunedFiles(spark, dir, bounds).size
    assert(picked < total,
      s"clustered layout must skip files: $picked of $total")

    val got = StatsIndex.prunedRead(spark, dir, bounds)
      .select("id").as[Long].collect().sorted
    val exact = spark.read.parquet(dir)
      .filter($"x".between(10L, 19L) && $"y".between(10L, 19L))
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(exact))
    assert(got.nonEmpty)
  }

  test("a disjoint interval prunes every file yet stays correct") {
    val dir = Files.createTempDirectory("statsidx").toString + "/zo2"
    Layout.zorderWrite(grid, "x", "y", dir, nFiles = 8)
    StatsIndex.build(spark, dir, Seq("x"))
    val bounds = Seq[(String, Any, Any)](("x", 1000L, 2000L))
    assert(StatsIndex.prunedFiles(spark, dir, bounds).isEmpty)
    assert(StatsIndex.prunedRead(spark, dir, bounds).count() == 0)
  }

  test("append indexes only the new files — existing rows are carried " +
    "over untouched, and the refreshed index prunes bit-identically") {
    val dir = Files.createTempDirectory("statsidx").toString + "/zo4"
    Layout.zorderWrite(grid, "x", "y", dir, nFiles = 8)
    StatsIndex.build(spark, dir, Seq("x", "y"))
    val before = spark.read.parquet(StatsIndex.statsPath(dir))
      .collect().map(_.toString).toSet

    // new data lands, then an O(new-files) append instead of a rebuild
    (10000 until 10100).map(i => (i.toLong, 200L + i % 10, 200L + (i - 10000) / 10))
      .toDF("id", "x", "y").coalesce(1).write.mode("append").parquet(dir)
    StatsIndex.append(spark, dir, Seq("x", "y"))

    assert(StatsIndex.fresh(spark, dir))
    val after = spark.read.parquet(StatsIndex.statsPath(dir))
      .collect().map(_.toString).toSet
    // every pre-append row survives verbatim (append never re-derived
    // them) and exactly one new-file row was added
    assert(before.subsetOf(after), (before -- after).take(3).toString)
    assert((after -- before).size == 1, (after -- before).toString)

    // the appended region is found through the index, pruning to the
    // new file only, and the read equals the exact full filter
    val bounds = Seq[(String, Any, Any)](("x", 200L, 210L), ("y", 200L, 210L))
    assert(StatsIndex.prunedFiles(spark, dir, bounds).size == 1)
    val got = StatsIndex.prunedRead(spark, dir, bounds)
      .select("id").as[Long].collect().sorted
    val exact = spark.read.parquet(dir)
      .filter($"x".between(200L, 210L) && $"y".between(200L, 210L))
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(exact) && got.nonEmpty)
  }

  test("append proves it never rescans indexed files: an out-of-contract " +
    "same-name rewrite keeps its ORIGINAL envelope") {
    val dir = Files.createTempDirectory("statsidx").toString + "/zo5"
    (0 until 100).map(i => (i.toLong, i.toLong)).toDF("id", "x")
      .coalesce(1).write.parquet(dir)
    StatsIndex.build(spark, dir, Seq("x"))
    val beforeRows = spark.read.parquet(StatsIndex.statsPath(dir)).collect()

    // rewrite the lone data file IN PLACE (same name, new content) —
    // outside append's contract, which is exactly what makes it a
    // probe: if append rescanned indexed files the envelope would move
    val dataFile = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val tmp = Files.createTempDirectory("statsidx").toString + "/rw"
    (0 until 100).map(i => (i.toLong, i + 5000L)).toDF("id", "x")
      .coalesce(1).write.parquet(tmp)
    val rewritten = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(rewritten.toPath, dataFile.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    StatsIndex.append(spark, dir, Seq("x"))
    val afterRows = spark.read.parquet(StatsIndex.statsPath(dir)).collect()
    assert(afterRows.map(_.toString).toSet == beforeRows.map(_.toString).toSet,
      "append must carry indexed rows over without rescanning them")
  }

  test("a stale index falls back to the full scan, never a wrong answer") {
    val dir = Files.createTempDirectory("statsidx").toString + "/zo3"
    Layout.zorderWrite(grid, "x", "y", dir, nFiles = 4)
    StatsIndex.build(spark, dir, Seq("x"))
    // new data lands WITHOUT an index rebuild: x=500 outside every
    // indexed envelope
    Seq((999999L, 500L, 0L)).toDF("id", "x", "y")
      .coalesce(1).write.mode("append").parquet(dir)
    assert(!StatsIndex.fresh(spark, dir))
    val got = StatsIndex.prunedRead(spark, dir,
      Seq[(String, Any, Any)](("x", 500L, 500L)))
      .select("id").as[Long].collect()
    assert(got.toSeq == Seq(999999L),
      s"stale index must not hide the new file: ${got.toSeq}")
  }
}
