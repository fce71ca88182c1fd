package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.cdc.{Envelope, Fixture, Materialize}
import graft.operators.QueryCatalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The CDC replication spine (EP1): Debezium-envelope stream → parse →
    * unwrap → latest-per-key upsert → tombstone-aware mirror state. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Materialize.currentState(
      Envelope.unwrap(Envelope.wellFormed(
        Envelope.parse(Fixture.ordersCdcEvents(spark, dir), Fixture.rowSchema)),
        keyCols = Seq("id")),
      Seq("id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = QueryCatalog.oracleSql
}
