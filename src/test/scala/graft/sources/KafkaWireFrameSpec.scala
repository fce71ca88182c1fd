package graft.sources

import java.nio.file.Files
import java.util.Base64

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Wire-level contract against CAPTURED Debezium-on-Kafka frames
  * (src/test/resources/debezium_ventas_frames.jsonl): the byte-exact
  * key/value payloads a Debezium 2.5 MySQL connector publishes with
  * the schemas-enabled JsonConverter the reference deploys
  * (register-mysql-connector.json:22-25, docker-compose.yml:107-110) —
  * full inline `schema` blocks, `io.debezium.connector.mysql.Source`
  * metadata, snapshot read / insert / update / delete ops, a
  * compaction tombstone (null value), a truncated poison payload and
  * an off-pattern topic. The container has no broker, so the capture
  * is replayed from a recorded fixture rather than a socket; the bytes
  * entering `KafkaCdc.envelopeProjection` are exactly what
  * `format("kafka").load()` would deliver (binary key/value + topic /
  * partition / offset / timestamp / timestampType).
  *
  * This closes the last gap of the S1 waiver testably: option map
  * (KafkaCdcSpec) + wire bytes (here) + MemoryStream e2e
  * (CdcPipelineSpec) together pin everything but the socket itself. */
class KafkaWireFrameSpec extends SparkSpec {

  /** Kafka source's exact output schema. */
  private val wire = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("topic", StringType), StructField("partition", IntegerType),
    StructField("offset", LongType), StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** The ventas row schema as registered engine-side — Debezium's
    * int32/double/string fields; the inline schema block is
    * deliberately NOT parsed on the hot path (Envelope contract). */
  private val ventasSchema = StructType(Seq(
    StructField("id", LongType), StructField("cliente_id", LongType),
    StructField("total", DoubleType), StructField("estado", StringType)))

  private def capturedFrames(): Seq[Row] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/debezium_ventas_frames.jsonl"), "UTF-8")
    try src.getLines().map { line =>
      // parse the capture metadata with the engine itself would be
      // circular — a 6-field line format is decoded directly
      def str(k: String): Option[String] =
        (s""""$k":"([^"]*)"""").r.findFirstMatchIn(line).map(_.group(1))
      def num(k: String): Long =
        (s""""$k":(-?\\d+)""").r.findFirstMatchIn(line).get.group(1).toLong
      Row(
        str("key").map(Base64.getDecoder.decode).orNull,
        str("value").map(Base64.getDecoder.decode).orNull,
        str("topic").get, num("partition").toInt, num("offset"),
        new java.sql.Timestamp(num("timestamp")), num("timestampType").toInt)
    }.toList
    finally src.close()
  }

  test("captured frames decode through the projection byte-for-byte: " +
    "binary -> UTF-8, tombstone stays null, metadata rides along") {
    val df = KafkaCdc.envelopeProjection(spark.createDataFrame(
      spark.sparkContext.parallelize(capturedFrames()), wire))
    val rows = df.orderBy("offset").collect()
    assert(rows.length == 7)
    // every non-tombstone value is the exact producer payload: starts
    // with the schemas-enabled converter's envelope header
    val vals = rows.map(_.getAs[String]("value"))
    assert(vals.count(_ == null) == 1 && rows(4).getAs[String]("value") == null)
    assert(vals.filter(_ != null).count(_.startsWith("""{"schema":{"type":"struct"""")) == 6)
    // the Debezium source block is present verbatim in a change event
    assert(vals(1).contains(""""connector":"mysql""""))
    assert(vals(1).contains(""""name":"io.debezium.connector.mysql.Source""""))
    assert(rows(0).getAs[String]("key") ==
      """{"schema":{"type":"struct","fields":[{"type":"int32","optional":false,"field":"id"}],"optional":false,"name":"mysql-server.pos_bi_db.ventas.Key"},"payload":{"id":101}}""")
  }

  test("captured frames replicate end-to-end: snapshot/insert/update/" +
    "delete land in the mirror, pk comes from the record key on " +
    "deletes, poison + off-pattern topics land in the DLQ") {
    val root = Files.createTempDirectory("graft-wireframe").toString
    val cfg = graft.streaming.CdcPipeline.Config(ventasSchema, Seq("id"),
      s"$root/mirror", s"$root/dlq", s"$root/ckpt")
    val frame = KafkaCdc.envelopeProjection(spark.createDataFrame(
      spark.sparkContext.parallelize(capturedFrames()), wire))
    graft.streaming.CdcPipeline.processBatch(frame, 0L, cfg)

    // 101 snapshot-read then updated to 162.0; 102 inserted then
    // deleted (delete's after=null — its key routed the removal);
    // the tombstone after the delete changes nothing
    val mirror = graft.streaming.CdcPipeline.mirror(spark, cfg, "ventas")
      .select("id", "cliente_id", "total", "estado").collect()
    assert(mirror.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getString(3))).toSeq == Seq((101L, 7L, 162.0, "PAGADA")))

    // DLQ: the truncated payload + the off-pattern topic, verbatim
    val dlq = graft.streaming.CdcPipeline.deadLetters(spark, cfg)
      .collect().map(_.getString(0)).sorted
    assert(dlq.length == 2)
    assert(dlq.exists(_.endsWith(""""after":{"id":103""")))
    // the off-pattern record is quarantined INTACT (full envelope)
    assert(dlq.exists(v => v.startsWith("""{"schema":{"type":"struct"""") &&
      v.contains(""""op":"c"""")))
  }
}
