package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Parquet table loader over the driver testdata layout (TESTDATA.md):
  * one parquet file per table under an sf-dir.
  *
  * At 100 TB these would be partitioned/bucketed parquet datasets; the
  * loader only assumes "directory of parquet per table", which scales —
  * Spark parallelizes over row-groups/files automatically.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet timestamp[ns]. Depending on the Spark
      // build this reads either as BIGINT nanos (via the legacy
      // nanos-as-long conf) or natively as TIMESTAMP_NTZ truncated to
      // micros — branch on the actual read schema and normalize both
      // to TimestampType micros (UTC session), the type every catalog
      // query and oracle was written against. Integral `div` for the
      // long path: doubles lose precision above 2^53 ns.
      try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () } // conf removed → native read
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      val ts = raw.schema("ts").dataType match {
        case LongType => timestamp_micros(expr("ts div 1000"))
        case _        => col("ts").cast(TimestampType)
      }
      raw.withColumn("ts", ts)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** The 9 POS tables replicated by the reference CDC pipeline
    * (reference: register-mysql-connector.json:12 table.include.list). */
  val posTables: Seq[String] = Seq(
    "categorias", "entidades", "productos", "ventas", "detalle_ventas",
    "compras", "detalle_compras", "cierres_caja", "pagos_clientes")

  /** Topic naming scheme (reference: register-mysql-connector.json:10
    * topic.prefix=mysql-server + database pos_bi_db). */
  val topicPrefix = "mysql-server.pos_bi_db"
  def topicFor(table: String): String = s"$topicPrefix.$table"
}
