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
