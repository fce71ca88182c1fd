package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the right row nearest in
  * time, per key — the temporal-lookup operator (trades/quotes,
  * events/dimension-history). Three directions, pandas-`merge_asof`
  * parity:
  *   - `backward` (default): newest right with time <= left time;
  *   - `forward`: earliest right with time >= left time;
  *   - `nearest`: whichever of the two is closer (ties -> backward);
  * plus an optional tolerance (seconds) beyond which a candidate is
  * discarded (the row survives with a null payload, as a left join).
  *
  * Spark has no built-in as-of join; rather than a custom SparkPlan we
  * compose it from primitives Spark already optimizes (SURVEY §2.10
  * preference order (a)): tag both sides, union, then
  * `last_value(..., ignoreNulls)` passes over a (key, time, side) sort.
  *
  * Scale: exactly ONE shuffle (by key) — `backward`/`forward` add one
  * per-partition sort, `nearest` two (ascending + descending window
  * over the same hash partitioning; no second exchange) — the same
  * cost class as a sort-merge join, with no range-explosion risk that
  * a naive `left.time >= right.time` theta-join would have. Skewed
  * keys AQE-split like any other sort.
  */
object AsofJoin {

  /** @param left      probe side
    * @param right     build side (its payload is attached)
    * @param leftKey   join key column in `left`
    * @param rightKey  join key column in `right`
    * @param leftTime  event-time column in `left`
    * @param rightTime version-time column in `right`
    * @param rightPayload right columns to carry (must not collide with left)
    * @param direction "backward" | "forward" | "nearest"
    * @param toleranceSec max |right time − left time| in seconds; a
    *                     match farther away is dropped (null payload)
    */
  def apply(left: DataFrame, right: DataFrame,
            leftKey: String, rightKey: String,
            leftTime: String, rightTime: String,
            rightPayload: Seq[String],
            direction: String = "backward",
            toleranceSec: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown as-of direction '$direction'")
    val leftCols = left.columns.toSeq
    // The whole payload travels as ONE struct so `last(_, ignoreNulls)`
    // attaches the matched right row wholesale: a NULL inside one payload
    // field must NOT be backfilled from an older right row (that would
    // emit a combined row that never existed). The struct additionally
    // carries the matched right TIME (epoch micros) so tolerance and
    // nearest-selection can compare distances after the window pass.
    val payloadType = StructType(
      StructField("_mt", org.apache.spark.sql.types.LongType,
        nullable = true) +:
      rightPayload.map(c =>
        StructField(c, right.schema(c).dataType, nullable = true)))
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", us(col(leftTime)))
      .withColumn("_side", lit(1))
      .withColumn("_p", lit(null).cast(payloadType))
    val r = right
      .withColumn("_k", col(rightKey))
      .withColumn("_t", us(col(rightTime)))
      .withColumn("_side", lit(0))
      .withColumn("_p", struct(
        us(col(rightTime)).as("_mt") +: rightPayload.map(col): _*))
      // a right row with a null key or time can match nothing — and
      // left in, its null `_t` would sort NULLS FIRST and its non-null
      // payload struct would backfill every unmatched left row
      .filter(col("_k").isNotNull && col("_t").isNotNull)
      .select(Seq(col("_k"), col("_t"), col("_side"), col("_p")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val unioned = l
      .select(Seq(col("_k"), col("_t"), col("_side"), col("_p")) ++
        leftCols.map(col): _*)
      .unionByName(r)
    // right rows sort before left rows at equal time (_side 0 < 1) in
    // BOTH traversals, so "at-or-before"/"at-or-after" hold on ties
    val wBack = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(col("_k"))
      .orderBy(col("_t").desc, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCands = direction match {
      case "backward" =>
        unioned.withColumn("_pb", last(col("_p"), ignoreNulls = true)
          .over(wBack))
      case "forward" =>
        unioned.withColumn("_pf", last(col("_p"), ignoreNulls = true)
          .over(wFwd))
      case "nearest" =>
        unioned
          .withColumn("_pb", last(col("_p"), ignoreNulls = true).over(wBack))
          .withColumn("_pf", last(col("_p"), ignoreNulls = true).over(wFwd))
    }
    val tol = toleranceSec.map(t => lit(t * 1000000L))
    def inTol(p: Column): Column = tol match {
      case Some(t) => when(abs(p.getField("_mt") - col("_t")) <= t, p)
      case None    => p
    }
    val chosen = direction match {
      case "backward" => inTol(col("_pb"))
      case "forward"  => inTol(col("_pf"))
      case "nearest"  =>
        val b = inTol(col("_pb"))
        val f = inTol(col("_pf"))
        val db = col("_t") - b.getField("_mt")
        val df = f.getField("_mt") - col("_t")
        // ties prefer backward (pandas merge_asof nearest contract)
        when(b.isNotNull && (f.isNull || db <= df), b).otherwise(f)
    }
    withCands
      .filter(col("_side") === 1)
      // a null left time matches nothing in any direction (in the
      // descending forward traversal it would otherwise sort NULLS
      // LAST and absorb the whole partition's payload)
      .withColumn("_sel", when(col("_t").isNotNull, chosen))
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"_sel.$c").as(c)): _*)
  }
}
