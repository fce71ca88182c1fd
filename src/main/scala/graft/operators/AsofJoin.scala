package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the newest right row whose
  * time is <= the left row's time, per key — the temporal-lookup
  * operator (trades/quotes, events/dimension-history).
  *
  * Spark has no built-in as-of join; rather than a custom SparkPlan we
  * compose it from primitives Spark already optimizes (SURVEY §2.10
  * preference order (a)): tag both sides, union, then one
  * `last_value(..., ignoreNulls)` pass over a (key, time, side) sort.
  *
  * Scale: exactly ONE shuffle (by key) + per-partition sort — the same
  * cost as a sort-merge join, with no range-explosion risk that a
  * naive `left.time >= right.time` theta-join would have. Skewed keys
  * AQE-split like any other sort.
  */
object AsofJoin {

  /** @param left      probe side
    * @param right     build side (its payload is attached)
    * @param leftKey   join key column in `left`
    * @param rightKey  join key column in `right`
    * @param leftTime  event-time column in `left`
    * @param rightTime version-time column in `right`
    * @param rightPayload right columns to carry (must not collide with left)
    */
  def apply(left: DataFrame, right: DataFrame,
            leftKey: String, rightKey: String,
            leftTime: String, rightTime: String,
            rightPayload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns.toSeq
    // The whole payload travels as ONE struct so `last(_, ignoreNulls)`
    // attaches the matched right row wholesale: a NULL inside one payload
    // field must NOT be backfilled from an older right row (that would
    // emit a combined row that never existed).
    val payloadType = StructType(rightPayload.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_p", lit(null).cast(payloadType))
    val r = right
      .withColumn("_k", col(rightKey))
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_p", struct(rightPayload.map(col): _*))
      .select(Seq(col("_k"), col("_t"), col("_side"), col("_p")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val unioned = l
      .select(Seq(col("_k"), col("_t"), col("_side"), col("_p")) ++
        leftCols.map(col): _*)
      .unionByName(r)
    // right rows sort before left rows at equal time (_side 0 < 1), so
    // "at-or-before" semantics hold on ties
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"_p.$c").as(c)): _*)
  }
}
