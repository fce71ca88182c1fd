package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: arbitrates the three as-of implementations (composed
  * union+window `join_asof`, native merge exec `join_asof_native`,
  * broadcast exec `join_asof_broadcast`) with INTERLEAVED repetitions
  * and per-rep prints, so a contended-host spike is visible instead of
  * averaged in — the r9 verdict flagged the merge exec's r8 win as
  * non-reproducing (medians 1.95 vs 1.92 s), which this exists to
  * settle. Usage: `sbt "runMain graft.AsofProfile [reps]"` with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as Bench. */
object AsofProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup

    val names = Seq("join_asof", "join_asof_native", "join_asof_broadcast")
    def loadavg(): String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ")(0)
      catch { case _: Throwable => "?" }
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    // warmup pass (uncounted): codegen + file-footer caches
    names.foreach(n =>
      SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count())
    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
      val s = (System.nanoTime() - t0) / 1e9
      samples(n) = samples(n) :+ s
      println(f"rep=$r $n%-22s ${s}%7.3f s  load=${loadavg()}")
    }
    names.foreach { n =>
      val xs = samples(n).sorted
      println(f"SUMMARY $n%-22s min=${xs.head}%6.3f " +
        f"med=${xs(xs.size / 2)}%6.3f max=${xs.last}%6.3f " +
        f"spread=${xs.last / xs.head}%4.2fx")
    }
    spark.stop()
  }
}
