package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-enforced file sources beyond parquet — CSV / JSON / ORC
  * (S-family breadth). Production discipline mirrors the engine's
  * `auto.create=false` stance (§1.3): schemas come from the registry,
  * never inference, so a malformed file cannot silently change column
  * types; corrupt rows are captured instead of failing the scan
  * (PERMISSIVE + `_corrupt_record`, the batch analog of the DLQ).
  */
object FileSources {

  val corruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(corruptCol)) schema
    else schema.add(corruptCol, "string", nullable = true)

  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", header)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Split a PERMISSIVE-read frame into (clean, corrupt) — corrupt rows
    * go to the DLQ path like streaming poison records (ST6). The input
    * is cached first: Spark disallows querying the corrupt column alone
    * on a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN). */
  def splitCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val cached = df.cache()
    (cached.filter(col(corruptCol).isNull).drop(corruptCol),
      cached.filter(col(corruptCol).isNotNull)
        .select(col(corruptCol).as("payload_json")))
  }
}
