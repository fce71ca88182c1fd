package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Connect declaration loader: a reference user's register-*.json maps
  * onto the engine's subscription, cadence, DLQ and routing — with
  * unsupported declared semantics refused at load time, and the
  * declared RegexRouter rewrite agreeing with the engine's router. */
class ConnectorConfigSpec extends SparkSpec {

  // the reference sink declaration's SHAPE (public Connect/JDBC-sink
  // config keys; register-postgres-sink.json), topology included
  private def sinkJson(overrides: Map[String, String] = Map.empty): String = {
    val base = Map(
      "connector.class" -> "io.confluent.connect.jdbc.JdbcSinkConnector",
      "batch.size" -> "3000",
      "linger.ms" -> "500",
      "max.buffered.records" -> "20000",
      "topics" -> Seq("categorias", "entidades", "productos", "ventas",
        "detalle_ventas", "compras", "detalle_compras", "cierres_caja",
        "pagos_clientes").map(t => s"mysql-server.pos_bi_db.$t")
        .mkString(","),
      "auto.evolve" -> "true",
      "insert.mode" -> "upsert",
      "delete.enabled" -> "true",
      "pk.mode" -> "record_key",
      "errors.tolerance" -> "all",
      "errors.deadletterqueue.topic.name" -> "DLQ_postgres_sink",
      "transforms" -> "unwrap,route",
      "transforms.unwrap.type" -> "io.debezium.transforms.ExtractNewRecordState",
      "transforms.route.type" -> "org.apache.kafka.connect.transforms.RegexRouter",
      "transforms.route.regex" -> "mysql-server\\.pos_bi_db\\.(.*)",
      "transforms.route.replacement" -> "$1") ++ overrides
    val fields = base.map { case (k, v) =>
      "\"" + k + "\": \"" + v.replace("\\", "\\\\") + "\""
    }.mkString(",\n    ")
    s"""{"name": "postgres-sink-connector", "config": {\n    $fields\n  }}"""
  }

  private val sourceJson =
    """{"name": "mysql-connector", "config": {
      |  "connector.class": "io.debezium.connector.mysql.MySqlConnector",
      |  "topic.prefix": "mysql-server",
      |  "database.include.list": "pos_bi_db",
      |  "table.include.list": "pos_bi_db.categorias,pos_bi_db.entidades,pos_bi_db.productos,pos_bi_db.ventas,pos_bi_db.detalle_ventas,pos_bi_db.compras,pos_bi_db.detalle_compras,pos_bi_db.cierres_caja,pos_bi_db.pagos_clientes"
      |}}""".stripMargin

  test("sink declaration maps onto subscription, cadence, DLQ, routing") {
    val s = ConnectorConfig.parseSink(sinkJson())
    assert(s.name == "postgres-sink-connector")
    assert(s.topics.size == 9 &&
      s.topics.head == "mysql-server.pos_bi_db.categorias")
    assert(s.triggerMs == 500L && s.maxBufferedRecords == 20000L)
    assert(s.dlqTopic.contains("DLQ_postgres_sink") && s.tolerateAllErrors)
    assert(s.autoEvolve)

    val opts = s.kafkaOptions("broker:9092")
    assert(opts("subscribe") == s.topics.mkString(","))
    assert(opts("maxOffsetsPerTrigger") == "20000")

    val cfg = s.pipelineConfig(
      StructType(Seq(StructField("id", LongType))), Seq("id"), "/tmp/x")
    assert(cfg.triggerMs == 500L)
    assert(cfg.dlqDir == "/tmp/x/DLQ_postgres_sink")
  }

  test("the declared RegexRouter rewrite agrees with the engine's router") {
    val s = ConnectorConfig.parseSink(sinkJson())
    val declared = s.tableNames
    assert(declared == Seq("categorias", "entidades", "productos",
      "ventas", "detalle_ventas", "compras", "detalle_compras",
      "cierres_caja", "pagos_clientes"))
    // the engine's Envelope.route must send every declared topic to the
    // same destination table the declaration names
    import spark.implicits._
    val routed = s.topics.toDF("topic")
      .select(graft.cdc.Envelope.route(col("topic")))
      .as[String].collect().toSeq
    assert(routed == declared)
  }

  test("source and sink declarations cover the same topology") {
    val produced = ConnectorConfig.sourceTopics(sourceJson)
    val consumed = ConnectorConfig.parseSink(sinkJson()).topics
    assert(produced == consumed,
      "every topic the source emits must be in the sink's subscription")
  }

  test("declarations asking for unimplemented semantics fail at load " +
    "time, not silently at runtime") {
    val insertMode = intercept[IllegalArgumentException] {
      ConnectorConfig.parseSink(sinkJson(Map("insert.mode" -> "insert")))
    }
    assert(insertMode.getMessage.contains("insert.mode"))
    val pkMode = intercept[IllegalArgumentException] {
      ConnectorConfig.parseSink(sinkJson(Map("pk.mode" -> "kafka")))
    }
    assert(pkMode.getMessage.contains("pk.mode"))
    val deletes = intercept[IllegalArgumentException] {
      ConnectorConfig.parseSink(sinkJson(Map("delete.enabled" -> "false")))
    }
    assert(deletes.getMessage.contains("delete"))
    val smt = intercept[IllegalArgumentException] {
      ConnectorConfig.parseSink(sinkJson(Map(
        "transforms" -> "unwrap,route,flatten",
        "transforms.flatten.type" -> "org.apache.kafka.connect.transforms.Flatten")))
    }
    assert(smt.getMessage.contains("flatten"))
  }

  test("a loaded declaration drives the real pipeline end-to-end") {
    val root = java.nio.file.Files.createTempDirectory("graft-conn").toString
    val s = ConnectorConfig.parseSink(sinkJson())
    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val cfg = s.pipelineConfig(rowSchema, Seq("id"), root)
    import spark.implicits._
    val batch = Seq(
      Rec("mysql-server.pos_bi_db.ventas", """{"payload":{"id":1}}""",
        """{"payload":{"after":{"id":1,"v":"a"},"op":"r","ts_ms":1000}}""",
        0, 0L)).toDS().toDF()
    CdcPipeline.processBatch(batch, 0L, cfg)
    assert(CdcPipeline.mirror(spark, cfg, "ventas").count() == 1)
  }
}
