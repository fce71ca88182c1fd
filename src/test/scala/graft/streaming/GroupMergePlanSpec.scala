package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.SparkSpec

/** Plan audit for the unified CDC group merge: tables sharing a row
  * schema and key must merge in ONE job whose plan has exactly TWO
  * shuffles — the `(table_name, pk)`-keyed merge aggregation, then
  * the writer-sizing repartition on `(table_name, _fg)` that bounds
  * output files to ceil(bytes/target) per table (round 12: the r11
  * merge floor was the per-file create tax of a 288-file dynamic-
  * partition commit; the sizing exchange moves O(state) — bounded by
  * the O(state) parquet rewrite the swap layout already pays) —
  * feeding one partitioned write, instead of an agg + write per
  * table (PLANS.md "CDC group merge"). Captured from the REAL
  * pipeline via a QueryExecutionListener, so a refactor that
  * silently reverts to per-table merges, adds a DATA shuffle, or
  * drops the sizing exchange fails here. */
class GroupMergePlanSpec extends SparkSpec {
  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def rec(table: String, id: Long, off: Long) =
    Rec(s"mysql-server.pos_bi_db.$table", s"""{"payload":{"id":$id}}""",
      s"""{"payload":{"after":{"id":$id,"v":"x$id"},"op":"r","ts_ms":1000}}""",
      0, off)

  test("same-schema tables merge as one write job: keyed agg shuffle + writer-sizing repartition") {
    val captured = new ConcurrentLinkedQueue[QueryExecution]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = captured.add(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val root = Files.createTempDirectory("graft-gm").toString
      val cfg = CdcPipeline.Config(rowSchema, Seq("id"), s"$root/mirror",
        s"$root/dlq", s"$root/ckpt")
      val batch = Seq(
        rec("ventas", 1, 0), rec("ventas", 2, 1),
        rec("compras", 7, 2), rec("gastos", 9, 3)).toDS().toDF()
      CdcPipeline.processBatch(batch, 0L, cfg)
      // the listener bus is async
      val deadline = System.nanoTime() + 10000000000L
      def writes = captured.asScala.toSeq.map(_.executedPlan.toString)
        .filter(_.contains("WriteFiles"))
        .filterNot(_.contains("dlq"))
      while (writes.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)

      val mirrorWrites = writes.filter(_.contains("table_name"))
      assert(mirrorWrites.size == 1,
        s"3 same-schema tables must produce ONE group write, got " +
          s"${mirrorWrites.size}:\n${writes.mkString("\n----\n")}")
      // AQE's toString appends an "== Initial Plan ==" section that
      // repeats every node — count shuffles in the final plan only
      val finalPlan = mirrorWrites.head.split("== Initial Plan ==").head
      val exchanges = "Exchange".r.findAllIn(finalPlan).size
      assert(exchanges == 2,
        s"group merge = keyed agg shuffle + writer-sizing repartition, " +
          s"got $exchanges:\n" + finalPlan.take(2000))
      assert(finalPlan.contains("REPARTITION_BY_NUM"),
        s"writer-sizing exchange missing:\n" + finalPlan.take(2000))
    } finally spark.listenerManager.unregister(listener)
  }

  test("writer sizing scales with live mirror bytes: a table past the " +
    "file-size target fans out to ceil(bytes/target) files, small " +
    "tables stay at one") {
    val root = Files.createTempDirectory("graft-ws").toString
    // tiny 8 KB target so a modest mirror exercises the scale path
    val cfg = CdcPipeline.Config(rowSchema, Seq("id"), s"$root/mirror",
      s"$root/dlq", s"$root/ckpt", targetFileBytes = 8L << 10)
    // ventas: 3000 rows (> 8 KB parquet);
    // compras: 5 rows (well under)
    val batch1 = ((1 to 3000).map(i => rec("ventas", i.toLong, i.toLong)) ++
      (1 to 5).map(i => rec("compras", i.toLong, 4000L + i))).toDS().toDF()
    CdcPipeline.processBatch(batch1, 0L, cfg)
    // batch 2 sizes from batch 1's LIVE bytes
    val batch2 = Seq(rec("ventas", 1, 9000), rec("compras", 1, 9001))
      .toDS().toDF()
    CdcPipeline.processBatch(batch2, 1L, cfg)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def files(t: String): Seq[org.apache.hadoop.fs.LocatedFileStatus] = {
      val it = fs.listFiles(
        new org.apache.hadoop.fs.Path(s"$root/mirror/$t/live"), true)
      val buf = scala.collection.mutable.Buffer
        .empty[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.toSeq
    }
    val ventas = files("ventas")
    val ventasBytes = ventas.map(_.getLen).sum
    val expected = math.ceil(ventasBytes.toDouble / (8 << 10)).toInt
    // hash skew across _fg groups means tasks can collide (some file
    // groups empty) — require genuine fan-out and no blow-up, not an
    // exact hash-distribution count
    assert(ventas.size > 1 && ventas.size <= expected,
      s"ventas: ${ventas.size} files for $ventasBytes bytes " +
        s"(target 8K, expected <= $expected)")
    assert(files("compras").size == 1,
      s"compras should stay at one file, got ${files("compras").size}")
  }

  test("the LOG-STRUCTURED group path also lands every table's delta " +
    "from one write job with the same two-exchange shape") {
    val captured = new ConcurrentLinkedQueue[QueryExecution]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = captured.add(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val root = Files.createTempDirectory("graft-gml").toString
      val cfg = CdcPipeline.Config(rowSchema, Seq("id"), s"$root/mirror",
        s"$root/dlq", s"$root/ckpt",
        sinkOverride = Some(graft.sinks.LogMirrorSink()))
      val batch = Seq(
        rec("ventas", 1, 0), rec("ventas", 2, 1),
        rec("compras", 7, 2), rec("gastos", 9, 3)).toDS().toDF()
      CdcPipeline.processBatch(batch, 0L, cfg)
      val deadline = System.nanoTime() + 10000000000L
      def writes = captured.asScala.toSeq.map(_.executedPlan.toString)
        .filter(_.contains("WriteFiles"))
        .filterNot(_.contains("dlq"))
      while (writes.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)

      val mirrorWrites = writes.filter(_.contains("table_name"))
      assert(mirrorWrites.size == 1,
        s"3 same-schema tables must produce ONE grouped delta write, " +
          s"got ${mirrorWrites.size}:\n${writes.mkString("\n----\n")}")
      val finalPlan = mirrorWrites.head.split("== Initial Plan ==").head
      val exchanges = "Exchange".r.findAllIn(finalPlan).size
      assert(exchanges == 2,
        s"grouped log merge = keyed agg shuffle + writer-sizing " +
          s"repartition, got $exchanges:\n" + finalPlan.take(2000))
      assert(finalPlan.contains("REPARTITION_BY_NUM"),
        s"writer-sizing exchange missing:\n" + finalPlan.take(2000))
      // and the segments actually landed per table
      for (t <- Seq("ventas", "compras", "gastos"))
        assert(graft.sinks.LogMirror.read(spark, s"$root/mirror/$t")
          .count() > 0, s"$t segment missing")
    } finally spark.listenerManager.unregister(listener)
  }
}
