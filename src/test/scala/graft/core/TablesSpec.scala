package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.SparkSpec

/** Pins the events-table load contract: parquet stores ts as
  * timestamp[ns], which different Spark builds surface either as
  * BIGINT nanos (legacy nanos-as-long conf) or natively as
  * TIMESTAMP_NTZ — `Tables.load` must normalize BOTH to TimestampType
  * micros under the UTC session, because every catalog query and
  * DuckDB oracle is written against that type. A silent type drift
  * here fails 28 events queries at once (round 7 found exactly that
  * after a Spark upgrade removed the legacy read path). */
class TablesSpec extends SparkSpec {

  test("events.ts loads as TimestampType micros regardless of read path") {
    val df = Tables.load(spark, sf0001, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
    assert(df.count() > 0)
  }

  test("normalized ts equals the raw nanosecond value truncated to micros") {
    val raw = spark.read.parquet(s"$sf0001/events.parquet")
    val expected = raw.schema("ts").dataType match {
      // native read: NTZ micros — same wall clock under the UTC session
      case TimestampNTZType => raw
        .select(col("event_id"), col("ts").cast(TimestampType).as("ts"))
      // legacy read: BIGINT nanos — integral division, never doubles
      case _ => raw.select(col("event_id"),
        timestamp_micros(expr("ts div 1000")).as("ts"))
    }
    val got = Tables.load(spark, sf0001, "events").select("event_id", "ts")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "Tables.load ts differs from the raw-read normalization")
  }
}
