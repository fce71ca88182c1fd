package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class FileSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv/json/orc round-trip the nation table with enforced schema") {
    val nation = graft.core.Tables.load(spark, sf0001, "nation")
    val schema = nation.schema
    val base = Files.createTempDirectory("graft-src-fmt").toString
    nation.write.option("header", "true").csv(s"$base/csv")
    nation.write.json(s"$base/json")
    nation.write.orc(s"$base/orc")

    val expected = nation.orderBy("n_nationkey").collect().toSeq
    val fromCsv = FileSources.splitCorrupt(
      FileSources.csv(spark, s"$base/csv", schema))._1
    val fromJson = FileSources.splitCorrupt(
      FileSources.json(spark, s"$base/json", schema))._1
    val fromOrc = FileSources.orc(spark, s"$base/orc", schema)
    for (df <- Seq(fromCsv, fromJson, fromOrc)) {
      assert(df.orderBy("n_nationkey").collect().toSeq == expected)
      assert(df.schema == schema)
    }
  }

  test("corrupt rows split to the DLQ path, clean rows survive") {
    val base = Files.createTempDirectory("graft-src-bad").toString
    Seq("""{"n_nationkey": 1, "n_name": "A", "n_regionkey": 0}""",
      """{"broken json""",
      """{"n_nationkey": 2, "n_name": "B", "n_regionkey": 1}""")
      .toDF("value").coalesce(1).write.text(s"$base/json")
    val schema = graft.core.Tables.load(spark, sf0001, "nation").schema
    val (clean, corrupt) = FileSources.splitCorrupt(
      FileSources.json(spark, s"$base/json", schema))
    assert(clean.count() == 2)
    assert(corrupt.as[String].collect().toSeq == Seq("""{"broken json"""))
  }
}
