package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic guarantee behind the `cdc_incremental_snapshot` catalog
  * query (DBLog / Debezium incremental snapshots): chunk rows read at
  * their high watermark and DEDUPED against the in-window change
  * stream can be merged into the stream at position (hw, +inf)
  * without ever losing data or overwriting a fresher value — the
  * merged mirror equals the stream-only mirror equals the truth.
  */
class IncrementalSnapshotSpec extends SparkSpec {

  test("DBLog merge invariant: emitted chunk rows at (hw, +inf) fold " +
    "into the stream without loss or regression — union state == " +
    "stream-only state") {
    val d = sf0001
    val changes = Envelope.unwrap(Envelope.wellFormed(
      Envelope.parse(Fixture.ordersCdcEvents(spark, d), Fixture.rowSchema)),
      keyCols = Seq("id"))

    // the catalog query's chunking/watermark rule
    val ev = changes
      .withColumn("chunk", expr("id div 512"))
      .withColumn("hw", lit(1999L) + (col("chunk") % 8) * 500L)

    val perKey = ev.filter(col("ts_ms") <= col("hw"))
      .groupBy(col("id"), col("hw"))
      .agg(
        max_by(struct(col("o_orderstatus"), col("o_totalprice"), col("op")),
          struct(col("ts_ms"), col("offset"))).as("last"),
        max(when(col("ts_ms") >= col("hw") - 499L, 1).otherwise(0))
          .as("inw"))

    // DBLog emission: alive at hw AND not seen inside the watermark
    // window (the stream's copy wins for those)
    val emitted = perKey
      .filter(col("last.op") =!= "d" && col("inw") === 0)
      .select(
        lit("snapshot-chunk").as("topic"),
        lit(0).as("partition"),
        lit(Long.MaxValue).as("offset"),
        lit("r").as("op"),
        col("hw").as("ts_ms"),
        col("id"),
        col("last.o_orderstatus").as("o_orderstatus"),
        col("last.o_totalprice").as("o_totalprice"))

    val unionState = Materialize.currentState(
      changes.select(emitted.columns.map(col): _*).unionByName(emitted),
      Seq("id"))
      .collect().map(r => (r.getLong(r.fieldIndex("id")),
        r.getString(r.fieldIndex("o_orderstatus")),
        r.getDouble(r.fieldIndex("o_totalprice")))).toSet
    val streamState = Materialize.currentState(changes, Seq("id"))
      .select(col("id"), col("o_orderstatus"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet

    assert(unionState.nonEmpty)
    assert(unionState == streamState,
      s"diverged: onlyUnion=${(unionState -- streamState).take(3)} " +
        s"onlyStream=${(streamState -- unionState).take(3)}")

    // and the dedup is not vacuous: some chunks DID suppress rows
    val suppressed = perKey
      .filter(col("last.op") =!= "d" && col("inw") === 1).count()
    assert(suppressed > 0, "fixture produced no watermark suppressions")
  }
}
