package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

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
      // events.ts is parquet timestamp[ns], which Spark only reads via the
      // legacy nanos-as-long path; convert to micros with integral
      // division (doubles would lose precision above 2^53 ns).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
