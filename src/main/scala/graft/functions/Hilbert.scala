package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve cluster key — the locality-stronger sibling of the
  * Morton key in [[ZOrder]] (and the curve modern table services use
  * for clustering: unlike Morton, the Hilbert curve has NO long
  * diagonal jumps, so consecutive key ranges are always edge-connected
  * rectangles and per-file min/max envelopes are tighter on both
  * dimensions).
  *
  * Kernel: the classic xy2d walk (public-domain algorithm, e.g. the
  * Wikipedia "Hilbert curve" formulation): per bit level s = n/2 .. 1,
  * quadrant digit (3·rx) XOR ry weights s², then the frame reflects/
  * transposes. Branchy but allocation-free and O(bits) — codegen emits
  * one static call, the same pattern as [[ZOrderKey]].
  *
  * The defining property (HilbertSpec): the key set over an n×n grid
  * is a permutation of 0..n²−1 AND consecutive keys are Manhattan
  * distance EXACTLY 1 apart — a complete correctness proof of the
  * curve (Morton fails adjacency at every power-of-two boundary).
  * The catalog oracle replays the identical recurrence as a DuckDB
  * recursive CTE, so every key is value-checked cross-engine.
  */
object Hilbert {

  /** Hilbert distance of (x, y) on the 2^bits × 2^bits grid. Inputs
    * are masked to `bits` low bits. */
  def xy2d(bits: Int, xIn: Long, yIn: Long): Long = {
    val n = 1L << bits
    val mask = n - 1
    var x = xIn & mask
    var y = yIn & mask
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // reflect (around the full frame) then transpose
        if (rx == 1) { x = mask - x; y = mask - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Hilbert key of two integral columns on the 2^bits square grid. */
  def hkey(bits: Int, a: Column, b: Column): Column =
    GraftColumnBridge.column(HilbertKey(
      GraftColumnBridge.expression(a.cast("long")),
      GraftColumnBridge.expression(b.cast("long")), bits))

  /** DuckDB recursive-CTE prelude computing `hkey` for every distinct
    * (a, b) produced by `ptsSql` (which must select columns a, b):
    * emits CTEs `pts` and `hfin(a, b, hkey)` replaying the identical
    * xy2d recurrence — the oracle counterpart of [[hkey]]. */
  def hkeyOracleSql(bits: Int, ptsSql: String): String = {
    val mask = (1 << bits) - 1
    s"""pts AS ($ptsSql),
       |hit AS (
       |  SELECT a, b, a AS x, b AS y,
       |    CAST(${1 << (bits - 1)} AS BIGINT) AS s, CAST(0 AS BIGINT) AS d
       |  FROM pts
       |  UNION ALL
       |  SELECT a, b,
       |    CASE WHEN (y & s) = 0 THEN
       |      (CASE WHEN (x & s) > 0 THEN $mask - y ELSE y END)
       |    ELSE x END,
       |    CASE WHEN (y & s) = 0 THEN
       |      (CASE WHEN (x & s) > 0 THEN $mask - x ELSE x END)
       |    ELSE y END,
       |    s // 2,
       |    d + s * s * xor(3 * (CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END),
       |                    CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END)
       |  FROM hit WHERE s > 0),
       |hfin AS (SELECT a, b, d AS hkey FROM hit WHERE s = 0)""".stripMargin
  }
}

/** `Hilbert.xy2d` as a codegen'd binary expression over two BIGINT
  * columns: one static branch-light call, inside whole-stage codegen —
  * same pattern as [[ZOrderKey]]. */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def foldable: Boolean = left.foldable && right.foldable

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType &&
        bits >= 1 && bits <= 31)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"HilbertKey needs (bigint, bigint) with 1 <= bits <= 31, got " +
        s"${left.dataType} / ${right.dataType}, bits=$bits")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Hilbert.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Hilbert.xy2d($bits, $a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}
