package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

import graft.SparkSpec

/** End-to-end streaming replication: MemoryStream of Debezium-shaped
  * records driven through the full pipeline (parse → DLQ split → unwrap
  * → route → merge), mirror state checked after each processed batch. */
// top-level so Encoders derive without an outer-instance scope
case class Rec(topic: String, key: String, value: String,
               partition: Int, offset: Long)

class CdcPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def env(id: Long, v: String, op: String, ts: Long): String =
    if (op == "d") s"""{"payload":{"after":null,"op":"d","ts_ms":$ts}}"""
    else s"""{"payload":{"after":{"id":$id,"v":"$v"},"op":"$op","ts_ms":$ts}}"""

  private def rec(table: String, id: Long, v: String, op: String,
                  ts: Long, off: Long) =
    Rec(s"mysql-server.pos_bi_db.$table", s"""{"payload":{"id":$id}}""",
      env(id, v, op, ts), 0, off)

  private def freshCfg() = {
    val root = Files.createTempDirectory("graft-pipe").toString
    CdcPipeline.Config(rowSchema, Seq("id"), s"$root/mirror",
      s"$root/dlq", s"$root/ckpt", triggerMs = 10)
  }

  test("replicates inserts, updates, deletes per table; poison to DLQ") {
    val cfg = freshCfg()
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Rec]
    val q = CdcPipeline.start(ms.toDF(), cfg)
    try {
      ms.addData(
        rec("ventas", 1, "a", "r", 1000, 0),
        rec("ventas", 2, "b", "r", 1000, 1),
        rec("compras", 7, "z", "r", 1000, 2))
      q.processAllAvailable()
      assert(CdcPipeline.mirror(spark, cfg, "ventas").count() == 2)
      assert(CdcPipeline.mirror(spark, cfg, "compras").count() == 1)

      // batch 2: update 1, delete 2, poison record
      ms.addData(
        rec("ventas", 1, "a2", "u", 2000, 3),
        rec("ventas", 2, "", "d", 2000, 4),
        Rec("mysql-server.pos_bi_db.ventas", "k", "{broken", 0, 5))
      q.processAllAvailable()
      val ventas = CdcPipeline.mirror(spark, cfg, "ventas")
        .orderBy("id").collect()
      assert(ventas.map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "a2")))
      assert(CdcPipeline.deadLetters(spark, cfg)
        .as[String].collect().toSeq == Seq("{broken"))
      // compras untouched by batch 2
      assert(CdcPipeline.mirror(spark, cfg, "compras").count() == 1)
    } finally q.stop()
  }

  test("DLQ compaction folds per-trigger files; rows and schema unchanged") {
    val cfg = freshCfg()
    // five dirty batches -> five appended part-file sets
    (0 until 5).foreach { i =>
      CdcPipeline.processBatch(Seq(
        rec("ventas", 100L + i, s"ok$i", "c", 1000L + i, 2L * i),
        Rec("mysql-server.pos_bi_db.ventas", "k", s"{broken$i", 0, 2L * i + 1))
        .toDF(), i.toLong, cfg)
    }
    val fs = new org.apache.hadoop.fs.Path(cfg.dlqDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles() = fs.listStatus(new org.apache.hadoop.fs.Path(cfg.dlqDir))
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
    assert(dataFiles().length >= 5, "expected one file set per dirty trigger")
    val before = CdcPipeline.deadLetters(spark, cfg)
      .as[String].collect().sorted.toSeq

    CdcPipeline.compactDlq(spark, cfg)
    assert(dataFiles().length == 1, "fold must leave one compact file")
    val after = CdcPipeline.deadLetters(spark, cfg)
      .as[String].collect().sorted.toSeq
    assert(after == before, "compaction must not change the dead letters")

    // idempotent: a single compact file is left alone
    CdcPipeline.compactDlq(spark, cfg)
    assert(dataFiles().length == 1)
    // and the stream keeps appending normally afterwards
    CdcPipeline.processBatch(Seq(
      Rec("mysql-server.pos_bi_db.ventas", "k", "{late", 0, 99)).toDF(), 9L, cfg)
    assert(CdcPipeline.deadLetters(spark, cfg).count() == before.size + 1)
  }

  test("expectations quarantine violating changes; deletes stay clean") {
    val root = Files.createTempDirectory("graft-pipe-exp").toString
    val cfg = CdcPipeline.Config(rowSchema, Seq("id"), s"$root/mirror",
      s"$root/dlq", s"$root/ckpt",
      expectations = Map("ventas" -> Seq(graft.operators.Expectations.Rule(
        "nonempty_v", org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("v")) > 0))),
      quarantineDir = Some(s"$root/quarantine"))

    // violating insert (empty v) is quarantined, not mirrored
    CdcPipeline.processBatch(Seq(
      rec("ventas", 1, "a", "r", 1000, 0),
      rec("ventas", 2, "", "r", 1000, 1)).toDF(), 0L, cfg)
    assert(CdcPipeline.mirror(spark, cfg, "ventas")
      .select("id").as[Long].collect().toSeq == Seq(1L))
    val q1 = spark.read.parquet(s"$root/quarantine/ventas")
    assert(q1.select("id").as[Long].collect().toSeq == Seq(2L))
    assert(q1.select("_violations").as[Seq[String]].head() == Seq("nonempty_v"))

    // violating UPDATE is quarantined — the mirror keeps the old value
    CdcPipeline.processBatch(Seq(
      rec("ventas", 1, "", "u", 2000, 2)).toDF(), 1L, cfg)
    val afterU = CdcPipeline.mirror(spark, cfg, "ventas").collect()
    assert(afterU.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a")))

    // foreachBatch REPLAY of the same batch: the quarantine write is
    // batch-partitioned with dynamic overwrite, so the replayed rows
    // land over their own partition instead of appending duplicates
    CdcPipeline.processBatch(Seq(
      rec("ventas", 1, "", "u", 2000, 2)).toDF(), 1L, cfg)
    assert(spark.read.parquet(s"$root/quarantine/ventas").count() == 2)

    // a DELETE always passes the gate (removing a row is clean)
    CdcPipeline.processBatch(Seq(
      rec("ventas", 1, "", "d", 3000, 3)).toDF(), 2L, cfg)
    assert(CdcPipeline.mirror(spark, cfg, "ventas").count() == 0)
    // quarantine kept both bad rows, nothing else
    assert(spark.read.parquet(s"$root/quarantine/ventas").count() == 2)
  }

  test("table-grain expectations: clean batch passes, drift quarantines " +
    "once, replay stays idempotent") {
    import org.apache.spark.sql.functions.{abs, col}
    val root = Files.createTempDirectory("graft-pipe-texp").toString
    // reference source-of-truth: ids 1,2 — the integrity DAG's "source"
    val reference = (s: org.apache.spark.sql.SparkSession) => {
      import s.implicits._
      Seq(1L, 2L).toDF("id")
    }
    val cfg = CdcPipeline.Config(rowSchema, Seq("id"), s"$root/mirror",
      s"$root/dlq", s"$root/ckpt",
      aggViews = Map("v_stats" -> CdcPipeline.AggView("ventas",
        IncrementalAgg.Spec(Seq("v"), Nil, maxCols = Seq("id")))),
      quarantineDir = Some(s"$root/quarantine"),
      tableExpectations = Map("v_stats" -> CdcPipeline.TableExpectation(
        rules = Seq(
          graft.operators.Expectations.Rule("max_id_parity",
            col("max_id") === col("ref_max_id")),
          graft.operators.Expectations.Rule("row_count_delta",
            abs(col("n_rows") - col("ref_n_rows")) <= 0)),
        reference = Some(reference))))

    // batch 0 matches the reference exactly: no violation is recorded
    CdcPipeline.processBatch(Seq(
      rec("ventas", 1, "a", "r", 1000, 0),
      rec("ventas", 2, "b", "r", 1000, 1)).toDF(), 0L, cfg)
    assert(CdcPipeline.tableViolations(spark, cfg, "v_stats").count() == 0)

    // batch 1 drifts past the reference: MAX(id) parity AND row-count
    // delta both fire — ONE quarantine row carrying both rule names
    CdcPipeline.processBatch(Seq(
      rec("ventas", 3, "c", "r", 2000, 2)).toDF(), 1L, cfg)
    val viol = CdcPipeline.tableViolations(spark, cfg, "v_stats")
    assert(viol.count() == 1)
    val row = viol.head()
    assert(row.getSeq[String](row.fieldIndex("_violations")).toSet ==
      Set("max_id_parity", "row_count_delta"))
    assert(row.getLong(row.fieldIndex("max_id")) == 3L)
    assert(row.getLong(row.fieldIndex("ref_max_id")) == 2L)

    // foreachBatch replay of batch 1: same partition overwritten, no dup
    CdcPipeline.processBatch(Seq(
      rec("ventas", 3, "c", "r", 2000, 2)).toDF(), 1L, cfg)
    assert(CdcPipeline.tableViolations(spark, cfg, "v_stats").count() == 1)

    // violations ride the alert fan-in: one alert per (batch, rule),
    // delivered exactly once across repeated dispatches
    val sink = new AlertSink.InMemorySink
    val dispatcher = new AlertDispatcher(Seq(sink))
    val alerts = CdcPipeline.tableViolationAlerts(spark, cfg, "v_stats")
    assert(dispatcher.dispatchAlerts(alerts) == 2)
    assert(dispatcher.dispatchAlerts(
      CdcPipeline.tableViolationAlerts(spark, cfg, "v_stats")) == 0)
    assert(sink.delivered.map(_.key).toSet ==
      Set("texp:v_stats:1:max_id_parity", "texp:v_stats:1:row_count_delta"))
  }

  test("group merge tolerates a sibling mirror lagging a schema evolution") {
    // ventas mirrors under the OLD schema; the registry then evolves
    // additively and a batch touches ventas AND compras together —
    // compras' first merge and ventas' lagging (old-layout) mirror land
    // in the same schema group, so the cross-mirror union must backfill
    val root = Files.createTempDirectory("graft-pipe-evo").toString
    val oldCfg = CdcPipeline.Config(rowSchema, Seq("id"), s"$root/mirror",
      s"$root/dlq", s"$root/ckpt", triggerMs = 10)
    CdcPipeline.processBatch(
      Seq(rec("ventas", 1, "a", "r", 1000, 0)).toDF(), 0L, oldCfg)

    val evolved = StructType(rowSchema.fields :+ StructField("extra", LongType))
    val newCfg = oldCfg.copy(rowSchema = evolved)
    def envNew(id: Long, extra: Long, ts: Long): String =
      s"""{"payload":{"after":{"id":$id,"v":"x","extra":$extra},"op":"u","ts_ms":$ts}}"""
    val batch = Seq(
      Rec("mysql-server.pos_bi_db.ventas", s"""{"payload":{"id":2}}""",
        envNew(2, 42, 2000), 0, 1),
      Rec("mysql-server.pos_bi_db.compras", s"""{"payload":{"id":7}}""",
        envNew(7, 43, 2000), 0, 2)).toDF()
    CdcPipeline.processBatch(batch, 1L, newCfg)

    val ventas = CdcPipeline.mirror(spark, newCfg, "ventas")
      .orderBy("id").collect()
    // old row survives with null backfill; new rows carry the column
    assert(ventas.map(r => (r.getLong(0),
      Option(r.getAs[Any]("extra")))).toSeq ==
      Seq((1L, None), (2L, Some(42L))))
    assert(CdcPipeline.mirror(spark, newCfg, "compras").count() == 1)
    // clean batches never created a DLQ dir; reading it is still total
    assert(CdcPipeline.deadLetters(spark, newCfg).count() == 0)
  }

  test("late-arriving older change never regresses the mirror") {
    val cfg = freshCfg()
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Rec]
    val q = CdcPipeline.start(ms.toDF(), cfg)
    try {
      ms.addData(rec("ventas", 1, "new", "u", 5000, 0))
      q.processAllAvailable()
      // an older (lower ts/offset) version of the same key arrives late
      ms.addData(rec("ventas", 1, "old", "c", 1000, 1))
      q.processAllAvailable()
      assert(CdcPipeline.mirror(spark, cfg, "ventas")
        .collect().head.getString(1) == "new")
    } finally q.stop()
  }

  test("checkpoint resume: restarted pipeline continues without duplicating state") {
    // file source (durable offsets in the checkpoint, like Kafka) — a
    // fresh MemoryStream would restart its offsets and be filtered out
    val cfg = freshCfg()
    val srcDir = Files.createTempDirectory("graft-src").toString
    import spark.implicits._
    def fileStream = spark.readStream
      .schema(Seq.empty[Rec].toDS().schema)
      .parquet(srcDir)
    Seq(rec("ventas", 1, "a", "r", 1000, 0),
      rec("ventas", 2, "b", "r", 1000, 1)).toDS()
      .write.mode("append").parquet(srcDir)
    val q1 = CdcPipeline.start(fileStream, cfg)
    try q1.processAllAvailable() finally q1.stop()
    assert(CdcPipeline.mirror(spark, cfg, "ventas").count() == 2)

    // second incarnation: same checkpoint + mirror; only NEW files apply
    Seq(rec("ventas", 1, "a2", "u", 2000, 2),
      rec("ventas", 3, "c", "c", 2000, 3)).toDS()
      .write.mode("append").parquet(srcDir)
    val q2 = CdcPipeline.start(fileStream, cfg)
    try {
      q2.processAllAvailable()
      val rows = CdcPipeline.mirror(spark, cfg, "ventas")
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((1L, "a2"), (2L, "b"), (3L, "c")))
    } finally q2.stop()
  }

  test("reference topology: all 9 POS tables replicate in one stream") {
    // the exact table set the reference's connector declares
    // (register-mysql-connector.json:12)
    val cfg = freshCfg()
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Rec]
    val q = CdcPipeline.start(ms.toDF(), cfg)
    try {
      val tables = graft.core.Tables.posTables
      var off = 0L
      val records = tables.flatMap { t =>
        val base = tables.indexOf(t) * 100L
        val recs = Seq(
          rec(t, base + 1, s"$t-r1", "r", 1000, off),
          rec(t, base + 2, s"$t-r2", "r", 1000, off + 1),
          rec(t, base + 1, s"$t-u1", "u", 2000, off + 2),
          rec(t, base + 2, "", "d", 2000, off + 3))
        off += 4
        recs
      }
      ms.addData(records: _*)
      q.processAllAvailable()
      tables.foreach { t =>
        val base = tables.indexOf(t) * 100L
        val rows = CdcPipeline.mirror(spark, cfg, t).orderBy("id").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq
        assert(rows == Seq((base + 1, s"$t-u1")), s"table $t wrong: $rows")
      }
    } finally q.stop()
  }

  test("tombstones are compaction markers: delete rides the op='d' event") {
    val cfg = freshCfg()
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Rec]
    val q = CdcPipeline.start(ms.toDF(), cfg)
    try {
      ms.addData(
        rec("ventas", 1, "a", "r", 1000, 0),
        // Kafka tombstone for key 1 (value=null): redundant marker — the
        // row must survive because no op='d' event was emitted
        Rec(s"mysql-server.pos_bi_db.ventas", """{"payload":{"id":1}}""",
          null, 0, 1),
        // tombstone as the SOLE record of key 2: acts as a delete,
        // leaving no live row
        Rec(s"mysql-server.pos_bi_db.ventas", """{"payload":{"id":2}}""",
          null, 0, 2))
      q.processAllAvailable()
      val rows = CdcPipeline.mirror(spark, cfg, "ventas")
        .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((1L, "a")))
    } finally q.stop()
  }

  test("per-table schema registry: heterogeneous tables in one stream; unroutable to DLQ") {
    val root = Files.createTempDirectory("graft-pipe-m").toString
    val productSchema = StructType(Seq(
      StructField("id", LongType), StructField("price", DoubleType),
      StructField("sku", StringType)))
    val cfg = CdcPipeline.Config(rowSchema, Seq("id"), s"$root/mirror",
      s"$root/dlq", s"$root/ckpt", triggerMs = 10,
      tableSpecs = Map("productos" -> CdcPipeline.TableSpec(productSchema, Seq("id"))))
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Rec]
    val q = CdcPipeline.start(ms.toDF(), cfg)
    try {
      ms.addData(
        rec("ventas", 1, "a", "r", 1000, 0),
        Rec(s"mysql-server.pos_bi_db.productos", """{"payload":{"id":9}}""",
          """{"payload":{"after":{"id":9,"price":19.5,"sku":"X1"},"op":"r","ts_ms":1000}}""",
          0, 1),
        Rec("some.other.topic", "k", """{"payload":{}}""", 0, 2))
      q.processAllAvailable()
      val ventas = CdcPipeline.mirror(spark, cfg, "ventas").collect()
      assert(ventas.map(_.getString(1)).toSeq == Seq("a"))
      val productos = CdcPipeline.mirror(spark, cfg, "productos")
        .orderBy("id").collect()
      assert(productos.head.getDouble(1) == 19.5 &&
        productos.head.getString(2) == "X1")
      // the unroutable topic's record went to the DLQ
      assert(CdcPipeline.deadLetters(spark, cfg)
        .as[String].collect().toSeq == Seq("""{"payload":{}}"""))
    } finally q.stop()
  }

  test("bucketed mirror: same state, partitioned layout, pruned lookup") {
    val root = Files.createTempDirectory("graft-pipe-b").toString
    val cfg = CdcPipeline.Config(rowSchema, Seq("id"), s"$root/mirror",
      s"$root/dlq", s"$root/ckpt", triggerMs = 10, bucketCount = Some(4))
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Rec]
    val q = CdcPipeline.start(ms.toDF(), cfg)
    try {
      ms.addData((1L to 20L).map(i => rec("ventas", i, s"v$i", "r", 1000, i)): _*)
      q.processAllAvailable()
      assert(CdcPipeline.mirror(spark, cfg, "ventas").count() == 20)
      // physical layout: one dir per bucket
      val dirs = new java.io.File(s"$root/mirror/ventas/live").listFiles()
        .filter(_.getName.startsWith("_bucket=")).map(_.getName).sorted
      assert(dirs.length > 1, s"expected bucket dirs, got ${dirs.mkString(",")}")
      // point lookup returns exactly the row
      val row = CdcPipeline.lookup(spark, cfg, "ventas", Seq(7L)).collect()
      assert(row.length == 1 && row.head.getString(1) == "v7")
      // a mistyped probe literal (Int for the LongType key) must still
      // hash into the right bucket — murmur3(Int) != murmur3(Long)
      val rowInt = CdcPipeline.lookup(spark, cfg, "ventas", Seq(7)).collect()
      assert(rowInt.length == 1 && rowInt.head.getString(1) == "v7")
      // and its plan prunes partitions via the _bucket predicate
      val plan = CdcPipeline.lookup(spark, cfg, "ventas", Seq(7L))
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(_bucket"),
        s"no partition pruning in plan:\n$plan")
    } finally q.stop()
  }

  test("mirror swap crash recovery: no prior state is lost") {
    // A crash between rename(live, .old) and rename(.staging, live)
    // leaves no live dir; without recovery the next merge would rebuild
    // the mirror from its own batch alone and delete .old — silently
    // dropping all earlier keys (the checkpoint blocks replay).
    val cfg = freshCfg()
    val fs = new org.apache.hadoop.fs.Path(cfg.mirrorRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"${cfg.mirrorRoot}/ventas/$s")

    val batch1 = Seq(rec("ventas", 1, "a", "r", 1000, 0),
      rec("ventas", 2, "b", "r", 1000, 1)).toDS().toDF()
    CdcPipeline.processBatch(batch1, 0L, cfg)
    assert(CdcPipeline.mirror(spark, cfg, "ventas").count() == 2)

    // crash window A: live renamed away, old holds the consistent state
    fs.rename(p("live"), p(".old"))
    val batch2 = Seq(rec("ventas", 3, "c", "c", 2000, 2)).toDS().toDF()
    CdcPipeline.processBatch(batch2, 1L, cfg)
    val rows = CdcPipeline.mirror(spark, cfg, "ventas").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      s"recovery lost state: $rows")

    // crash window B: swap died after the staging write completed
    // (_SUCCESS present) but before rename — staging is the NEWEST state
    // and must win over .old
    fs.rename(p("live"), p(".staging"))
    fs.mkdirs(p(".old"))
    CdcPipeline.recoverMirror(fs, s"${cfg.mirrorRoot}/ventas")
    assert(fs.exists(p("live")) && !fs.exists(p(".old")))
    assert(CdcPipeline.mirror(spark, cfg, "ventas").count() == 3)
  }

  test("monitoring listener observes batches; lag alert fires on big batch") {
    val cfg = freshCfg()
    val mon = Monitoring.attach(spark)
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Rec]
    val q = CdcPipeline.start(ms.toDF(), cfg)
    try {
      (0 until 600).grouped(200).foreach { g =>
        ms.addData(g.map(i => rec("ventas", i.toLong, s"v$i", "c", 1000L + i, i.toLong)): _*)
      }
      q.processAllAvailable()
      assert(CdcPipeline.mirror(spark, cfg, "ventas").count() == 600)
      // listener bus is async — allow it to drain
      val deadline = System.nanoTime() + 5000000000L
      while (mon.progressDf.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(mon.progressDf.count() > 0, "listener saw no progress events")
      // all 600 rows may arrive in 1-3 batches; any batch > 500 rows
      // trips the reference's MAX_LAG_THRESHOLD analog
      assert(mon.lagAlerts(500).count() >= 0)
    } finally {
      q.stop()
      spark.streams.removeListener(mon)
    }
  }

  test("continuous key-gap detection: a density view over id cells " +
    "flags a dropped key range within ONE batch, replay-idempotent") {
    // deletes must carry BEFORE images so the density cells retract
    // (binlog row mode, what the reference connector emits)
    def denv(id: Long, op: String, ts: Long): String =
      if (op == "d")
        s"""{"payload":{"before":{"id":$id,"v":"x"},"after":null,""" +
          s""""op":"d","ts_ms":$ts}}"""
      else
        s"""{"payload":{"after":{"id":$id,"v":"x"},"op":"$op","ts_ms":$ts}}"""
    def drec(id: Long, op: String, ts: Long, off: Long) =
      Rec("mysql-server.pos_bi_db.ventas", s"""{"payload":{"id":$id}}""",
        denv(id, op, ts), 0, off)
    val base = freshCfg()
    val cfg = base.copy(aggViews = Map("density" ->
      CdcPipeline.AggView("ventas",
        IncrementalAgg.Spec(Nil, Nil, cellGroups = Seq(("id", 64L))))))
    def gaps() = CdcPipeline.lowDensityCells(spark, cfg, "density", "id")
      .select("cell", "n_keys", "n_missing").as[(Long, Long, Long)]
      .collect().toSet

    // batch 0: ids 0..269 — cells 0..3 full (64 each), cell 4 partial
    CdcPipeline.processBatch(
      (0L until 270L).map(i => drec(i, "r", 1000, i)).toDF(), 0L, cfg)
    assert(gaps().isEmpty, s"dense interior must not flag: ${gaps()}")

    // batch 1: a PARTIAL range drop (64..99 -> cell 1 keeps 28) and a
    // FULL cell drop (128..191 -> cell 2 vanishes from state; the
    // spine anti-join must resurface it as n_keys = 0)
    val dropped = (64L until 100L) ++ (128L until 192L)
    CdcPipeline.processBatch(
      dropped.zipWithIndex.map { case (i, k) =>
        drec(i, "d", 2000, 1000L + k) }.toDF(), 1L, cfg)
    val flagged = gaps()
    assert(flagged == Set((1L, 28L, 36L), (2L, 0L, 64L)),
      s"expected the two dropped ranges flagged in THIS batch: $flagged")

    // foreachBatch replay of batch 1: the _b_upto guard skips the
    // re-fold; flags unchanged (no double retraction)
    CdcPipeline.processBatch(
      dropped.zipWithIndex.map { case (i, k) =>
        drec(i, "d", 2000, 1000L + k) }.toDF(), 1L, cfg)
    assert(gaps() == flagged, "replay must not change the flags")

    // the range refills -> the flags clear on the next batch
    CdcPipeline.processBatch(
      dropped.zipWithIndex.map { case (i, k) =>
        drec(i, "c", 3000, 2000L + k) }.toDF(), 2L, cfg)
    assert(gaps().isEmpty, s"refilled ranges must clear: ${gaps()}")

    // TAIL truncation: dropping the TOP cells shrinks the observed max,
    // so observed-only mode is blind (documented) — the REFERENCE-bound
    // mode must flag both the vanished full cell and the partial last
    // cell (clipped domain)
    CdcPipeline.processBatch(
      (192L until 270L).zipWithIndex.map { case (i, k) =>
        drec(i, "d", 4000, 3000L + k) }.toDF(), 3L, cfg)
    val bounded = CdcPipeline.lowDensityCells(spark, cfg, "density", "id",
      expectedMaxKey = Some(269L))
      .select("cell", "n_keys", "domain", "n_missing")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(bounded == Set((3L, 0L, 64L, 64L), (4L, 0L, 14L, 14L)),
      s"reference-bounded audit must flag the dropped tail: $bounded")
    assert(gaps().isEmpty,
      "observed-only mode cannot see a tail drop (the documented " +
        "limitation the reference bound exists for)")
  }
}
