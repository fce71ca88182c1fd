package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the MERGE stage alone (VERDICT r10 item 3):
  * decomposes the group-merge's 2.5 s into parse-cache read / unwrap /
  * latest-per-key agg / partitioned write / swap commits, so the next
  * optimization targets the dominant slice instead of a guess. Not
  * part of the driver contract. */
object MergeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[mergeprofile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val raw = graft.cdc.Fixture.ordersCdcEvents(spark, sfDir).persist()
    println(s"[mergeprofile] events=${raw.count()}")

    // replicate the pipeline's stages by hand
    val routed = raw
      .withColumn("table_name", graft.cdc.Envelope.route(col("topic")))
      .persist()
    timed("route: fill cache + table list")(
      routed.groupBy(col("table_name")).count().collect())
    val tables = graft.core.Tables.posTables
    val parsed = graft.cdc.Envelope
      .parse(routed.filter(col("table_name").isin(tables: _*)),
        graft.cdc.Fixture.rowSchema)
      .withColumn("_wf", graft.cdc.Envelope.isWellFormed.cast("int"))
      .persist()
    timed("parse: fill cache")(parsed.count())
    timed("parse: re-read cache (count)")(parsed.count())

    val changes = graft.cdc.Envelope
      .unwrap(parsed.filter(col("_wf") === 1), Seq("id"))
      .withColumn("table_name", graft.cdc.Envelope.route(col("topic")))
    timed("unwrap only (toRdd.count)")(
      changes.queryExecution.toRdd.count())

    val groupKey = Seq("table_name", "id")
    val merged = graft.cdc.Materialize.versionedState(changes, groupKey)
    timed("unwrap + latest-per-key agg")(
      merged.queryExecution.toRdd.count())
    (1 to 2).foreach { i =>
      val out = java.nio.file.Files.createTempDirectory("graft-mp").toString
      timed(s"agg + flat write (no partitionBy) #$i")(
        merged.write.mode("overwrite").parquet(s"$out/flat"))
      timed(s"agg + write partitionBy(table) #$i")(
        merged.write.partitionBy("table_name")
          .mode("overwrite").parquet(s"$out/bytable"))
      timed(s"agg + repartition(tables) + partitionBy #$i")(
        merged.repartition(col("table_name"))
          .write.partitionBy("table_name")
          .mode("overwrite").parquet(s"$out/bytable2"))
    }
    // inline replication of mergeGroupIntoMirrors with SUB-timings —
    // where do the ~2 s of the merge stage actually go?
    locally {
      import org.apache.hadoop.fs.Path
      val root = java.nio.file.Files.createTempDirectory("graft-mp3").toString
      val mirrorRoot = s"$root/mirror"
      val fs = new Path(mirrorRoot)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val ts = tables
      val changes0 = graft.cdc.Envelope
        .unwrap(parsed.filter(col("table_name").isin(ts: _*) &&
          col("_wf") === 1), Seq("id"))
        .withColumn("table_name", graft.cdc.Envelope.route(col("topic")))
      val groupKey = Seq("table_name", "id")
      val merged2 = graft.cdc.Materialize.versionedState(changes0, groupKey)
      val tmp = new Path(mirrorRoot, ".group_staging_prof")
      timed("inline: recoverMirror x9")(
        ts.foreach(t => graft.sinks.SwapMirror.recoverMirror(fs, s"$mirrorRoot/$t")))
      timed("inline: agg+write partitionBy (pipelined)")(
        merged2.write.partitionBy("table_name").mode("overwrite")
          .parquet(tmp.toString))
      timed("inline: 9x atomic swaps") {
        ts.foreach { t =>
          val part = new Path(tmp, s"table_name=$t")
          if (fs.exists(part)) graft.sinks.SwapMirror.atomicSwap(
            fs, s"$mirrorRoot/$t") { staging =>
              if (!fs.rename(part, staging)) sys.error("rename failed")
              graft.core.LocalFs.touch(fs, new Path(staging, "_SUCCESS"))
              graft.sinks.SwapMirror.writeBatchMarker(fs, staging, 0L)
            }
        }
      }
      fs.delete(tmp, true)
    }

    // full group-merge path for reference
    (1 to 2).foreach { i =>
      val root = java.nio.file.Files.createTempDirectory("graft-mp2").toString
      val cfg = graft.streaming.CdcPipeline.Config(
        graft.cdc.Fixture.rowSchema, Seq("id"),
        s"$root/mirror", s"$root/dlq", s"$root/ckpt")
      timed(s"full processBatch #$i")(
        graft.streaming.CdcPipeline.processBatch(raw, 0L, cfg))
    }
    spark.stop()
  }
}
