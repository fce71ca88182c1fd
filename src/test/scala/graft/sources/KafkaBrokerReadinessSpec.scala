package graft.sources

import scala.util.Try

import graft.SparkSpec

/** Broker-integration readiness spec for the S1 Kafka source (VERDICT
  * r12 item 8 — shrinking the standing environment waiver the day the
  * environment allows it).
  *
  * `format("kafka")` binds at RUNTIME via DataSource registry lookup —
  * there is no compile-time dependency on the connector — so this spec
  * always COMPILES offline and needs no build profile. At run time it
  * probes the registry:
  *
  *   - connector absent (this sandbox: no spark-sql-kafka jar, no
  *     egress): the tests CANCEL with a visible waiver line — the
  *     documented S1 environment waiver, surfaced per run instead of
  *     buried in COVERAGE.md;
  *   - connector present (drop spark-sql-kafka-0-10 + its kafka-clients
  *     into the jars dir): the tests run for real — the REAL
  *     connector's relation schema flows through `KafkaCdc.stream`'s
  *     projection, validating the wire contract that today only the
  *     hand-maintained `KafkaWireFrameSpec` frame pins. `load()` is
  *     lazy (no broker contact until `start()`), so schema-level
  *     validation needs no running broker either.
  */
class KafkaBrokerReadinessSpec extends SparkSpec {

  /** Registry probe through the public API: `load()` is lazy (no
    * broker contact), but it DOES resolve the source provider — a
    * missing connector jar fails right here with Spark's "Failed to
    * find data source: kafka" error. */
  private def kafkaConnectorPresent: Boolean =
    Try(spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", "localhost:9092")
      .option("subscribe", "probe")
      .load()).isSuccess

  private def requireConnector(): Unit =
    if (!kafkaConnectorPresent)
      cancel("WAIVER S1: spark-sql-kafka connector jar absent in this " +
        "environment (no egress to fetch it) — broker-integration " +
        "checks auto-skip; add the connector jar to activate them. " +
        "The option/projection contract stays covered by KafkaCdcSpec " +
        "+ KafkaWireFrameSpec + the MemoryStream e2e.")

  test("S1 readiness: real connector resolves and KafkaCdc.stream's " +
    "projection emits the pipeline envelope frame") {
    requireConnector()
    val df = KafkaCdc.stream(spark, bootstrapServers = "localhost:9092",
      topics = Seq("pg_server.public.orders_t0"))
    assert(df.isStreaming)
    assert(df.schema.fields.map(f => f.name -> f.dataType.simpleString)
      .toSeq == Seq("topic" -> "string", "key" -> "string",
        "value" -> "string", "partition" -> "int", "offset" -> "bigint"))
  }

  test("S1 readiness: pattern subscription form loads through the " +
    "real connector") {
    requireConnector()
    val df = KafkaCdc.streamPattern(spark,
      bootstrapServers = "localhost:9092",
      topicPattern = "pg_server\\.public\\..*")
    assert(df.isStreaming && df.schema.fieldNames.length == 5)
  }
}
