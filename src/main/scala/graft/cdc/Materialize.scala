package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Upsert-materialization of a CDC change stream into current-state
  * mirrors — the Spark-native equivalent of the reference's JDBC upsert
  * sink (reference: register-postgres-sink.json:15-17 insert.mode=upsert,
  * pk.mode=record_key, delete.enabled=true).
  *
  * Scale design: latest-per-key is a single hash aggregation with
  * map-side partial aggregation (`max_by` over a (ts_ms, offset) ordering
  * struct) — ONE shuffle keyed by PK, no window-sort. At 100 TB this is
  * the difference between a shuffle+sort per batch and a combine-heavy
  * agg whose shuffle volume is bounded by (#distinct keys), not (#events).
  */
object Materialize {

  /** Ordering struct: Kafka guarantees per-partition order; within a key
    * the reference applies records in order, so last-write-wins resolves
    * on event time then log position (SURVEY A5/O1). */
  def ordering: Column = struct(col("ts_ms"), col("offset"))

  /** Reduce an unwrapped change batch to the newest record per key.
    * Keeps op so callers can drop keys whose final op is a delete. */
  def latestPerKey(unwrapped: DataFrame, keyCols: Seq[String]): DataFrame = {
    val payload = unwrapped.columns.filterNot(keyCols.contains)
    unwrapped
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), ordering).as("_latest"))
      .select(keyCols.map(col) ++ payload.map(c => col(s"_latest.$c").as(c)): _*)
  }

  /** Final mirror state of a batch: newest record per key, deletes
    * removed (tombstone semantics, register-postgres-sink.json:16,24). */
  def currentState(unwrapped: DataFrame, keyCols: Seq[String]): DataFrame =
    latestPerKey(unwrapped, keyCols)
      .filter(col("op") =!= "d")
      .drop("op", "ts_ms", "topic", "partition", "offset")

  /** Merge one change batch into an existing mirror (the foreachBatch
    * body). Existing rows lose to any newer change for the same key;
    * a final delete removes the key. Implemented as latest-per-key over
    * (mirror-as-synthetic-oldest-change ∪ batch) — a single agg, which
    * AQE can plan as a broadcast when the batch is small.
    */
  def merge(mirror: DataFrame, batchUnwrapped: DataFrame,
            keyCols: Seq[String]): DataFrame = {
    val payloadCols = mirror.columns.filterNot(keyCols.contains)
    val mirrorAsChanges = mirror
      .withColumn("op", lit("r"))
      .withColumn("ts_ms", lit(Long.MinValue))
      .withColumn("topic", lit(null).cast("string"))
      .withColumn("partition", lit(null).cast("int"))
      .withColumn("offset", lit(Long.MinValue))
      .select(batchUnwrapped.columns.map(col): _*)
    currentState(mirrorAsChanges.unionByName(batchUnwrapped), keyCols)
  }
}
