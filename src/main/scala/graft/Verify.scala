package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Verify <sfDir> <outDir>")
    val (sfDir, outDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/scheduler warmup (same as Bench): without it the
    // FIRST catalog query absorbs ~5-8 s of session spin-up in
    // timings.json — measured: agg_tiered_billing (first in map
    // order) read 7.9 s in catalog context vs 0.4 s warm — skewing
    // the catalog-median time gate and the committed TIMINGS artifact.
    spark.range(1000000).selectExpr("sum(id)").collect()
    new java.io.File(outDir).mkdirs()
    // optional args(2..): restrict to the named queries (dev loop only;
    // the driver always invokes with exactly two args = full catalog)
    val only = args.drop(2).toSet
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(only).toMap
    var failed = List.empty[String]
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    selected.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // per-query wall seconds (build + execute + write): the
        // catalog-wide time gate reads these — a pathological plan in
        // a NON-benched query (an accidental cartesian after an edit)
        // would otherwise pass every correctness gate silently
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed ::= name
        // A query that fails must still surface in the correctness
        // artifact: a silently-missing result dir drops it from the
        // driver's compare entirely (a failure reads as "not run").
        // Emit a 1-row sentinel result instead — it can never match
        // any oracle, so the failure lands as a visible red entry.
        try {
          import spark.implicits._
          Seq(s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(500)}")
            .toDF("_verify_error").coalesce(1)
            .write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e2: Throwable =>
          System.err.println(s"[verify] $name sentinel write failed: ${e2.getMessage}")
        }
        timings(name) = (System.nanoTime() - t0) / 1e9
      }
    }
    if (failed.nonEmpty)
      System.err.println(s"[verify] FAILED ${failed.size}: ${failed.sorted.mkString(", ")}")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracles =
      if (only.isEmpty) SparkEntry.oracleSql
      else SparkEntry.oracleSql.view.filterKeys(only).toMap
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Full catalog manifest: lets check tooling detect a query that
    // produced NO result dir at all (vs merely having no SQL oracle).
    Files.writeString(Paths.get(s"$outDir/catalog.json"),
      selected.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    // Per-query wall seconds for the catalog-wide time gate
    // (tools/check.py asserts no query exceeds 20× the catalog
    // median; the artifact rides CORRECTNESS_* so regressions are
    // visible round over round).
    // formatLocal(Locale.ROOT): default-locale "%.3f" emits a COMMA
    // decimal separator on comma-decimal JVM locales (de_DE etc.),
    // producing invalid JSON that aborts the whole oracle compare.
    Files.writeString(Paths.get(s"$outDir/timings.json"),
      timings.map { case (k, v) =>
        s"${q(k)}: ${"%.3f".formatLocal(java.util.Locale.ROOT, v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
