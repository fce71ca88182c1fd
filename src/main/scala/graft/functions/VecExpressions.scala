package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two numeric-array columns (float or
  * double elements) — the similarity hot path (SURVEY §2.10: prefer a
  * custom Catalyst `Expression` with codegen over higher-order-function
  * folds for hot loops).
  *
  * The `aggregate(zip_with(...))` formulation allocates an intermediate
  * array and evaluates lambda closures per element; this compiles to a
  * tight primitive loop over the two ArrayData buffers. Accumulation is
  * sequential in array order (double), bitwise-identical to the fold
  * version — oracle determinism is preserved.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  // literal inputs fold at plan time (e.g. a query vector's self-norm)
  override def foldable: Boolean = left.foldable && right.foldable

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"VecDot needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lt, rt) = (elemType(left).get, elemType(right).get)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0d
    var i = 0
    while (i < n) {
      acc += get(x, i, lt) * get(y, i, rt)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      def getter(v: String, i: String, t: DataType) = t match {
        case FloatType => s"((double) $v.getFloat($i))"
        case _ => s"$v.getDouble($i)"
      }
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${getter(x, i, elemType(left).get)} * ${getter(y, i, elemType(right).get)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine similarity: one loop accumulates x·y, x·x and y·y, then
  * emits `xy / (sqrt(xx) * sqrt(yy))` — the EXACT operation sequence of
  * the unfused `dot/(norm*norm)` formulation (and of the DuckDB oracle),
  * so results stay bitwise identical while the array is traversed once
  * instead of three times. */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  // literal inputs fold at plan time (e.g. a query vector's self-norm)
  override def foldable: Boolean = left.foldable && right.foldable

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"VecCosine needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lt, rt) = (elemType(left).get, elemType(right).get)
    val n = math.min(x.numElements(), y.numElements())
    var xy = 0d; var xx = 0d; var yy = 0d
    var i = 0
    while (i < n) {
      val xv = get(x, i, lt); val yv = get(y, i, rt)
      xy += xv * yv; xx += xv * xv; yy += yv * yv
      i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      def getter(v: String, i: String, t: DataType) = t match {
        case FloatType => s"((double) $v.getFloat($i))"
        case _ => s"$v.getDouble($i)"
      }
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val xy = ctx.freshName("xy")
      val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $xy = 0.0; double $xx = 0.0; double $yy = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${getter(x, i, elemType(left).get)};
         |  double $yv = ${getter(y, i, elemType(right).get)};
         |  $xy += $xv * $yv; $xx += $xv * $xv; $yy += $yv * $yv;
         |}
         |${ev.value} = $xy / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

object VecExpressions {
  /** Column wrapper: dot(a, b) over array<float|double> columns, in
    * double, sequential accumulation. */
  def vec_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column wrapper: single-pass cosine similarity. */
  def vec_cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecCosine(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
