package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Contract test for the Kafka source wiring. The container has no
  * broker and no spark-sql-kafka connector jar, so `load()` itself
  * cannot execute here — this spec pins the option map the reader would
  * be built with (subscribe list / pattern, startingOffsets,
  * maxOffsetsPerTrigger backpressure, failOnDataLoss) and runs the
  * post-load projection on a frame with Kafka's exact wire schema.
  * Everything downstream of the projection is e2e-tested via
  * MemoryStream in CdcPipelineSpec. */
class KafkaCdcSpec extends SparkSpec {

  test("subscribe options match the reference consumer's contract") {
    val opts = KafkaCdc.subscribeOptions("broker:9092",
      Seq("mysql-server.pos_bi_db.ventas", "mysql-server.pos_bi_db.gastos"))
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("subscribe") ==
      "mysql-server.pos_bi_db.ventas,mysql-server.pos_bi_db.gastos")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("maxOffsetsPerTrigger") == "20000")
    assert(opts("failOnDataLoss") == "false")
    assert(!opts.contains("subscribePattern"))
  }

  test("pattern options use subscribePattern (include-list form)") {
    val opts = KafkaCdc.patternOptions("broker:9092",
      "mysql-server\\.pos_bi_db\\..*", maxOffsetsPerTrigger = 5000L)
    assert(opts("subscribePattern") == "mysql-server\\.pos_bi_db\\..*")
    assert(opts("maxOffsetsPerTrigger") == "5000")
    assert(!opts.contains("subscribe"))
  }

  test("envelope projection decodes Kafka's binary wire frame to the " +
    "pipeline's (topic, key, value, partition, offset) shape") {
    // Kafka source's exact output schema (binary key/value + metadata)
    val wire = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
    val rows = Seq(Row(
      """{"id":7}""".getBytes("UTF-8"),
      """{"payload":{"op":"c"}}""".getBytes("UTF-8"),
      "mysql-server.pos_bi_db.ventas", 2,
      42L, new java.sql.Timestamp(0L), 0))
    val df = KafkaCdc.envelopeProjection(
      spark.createDataFrame(spark.sparkContext.parallelize(rows), wire))

    assert(df.schema.map(f => (f.name, f.dataType)) == Seq(
      "topic" -> StringType, "key" -> StringType, "value" -> StringType,
      "partition" -> IntegerType, "offset" -> LongType))
    val r = df.head()
    assert(r.getString(0) == "mysql-server.pos_bi_db.ventas")
    assert(r.getString(1) == """{"id":7}""")
    assert(r.getString(2) == """{"payload":{"op":"c"}}""")
    assert(r.getInt(3) == 2 && r.getLong(4) == 42L)
  }
}
