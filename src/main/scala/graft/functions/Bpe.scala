package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One greedy left-to-right BPE merge pass over a symbol array as a
  * codegen'd Catalyst expression.
  *
  * The declarative formulation (`aggregate(w, array(), fold)`) is
  * correct but Spark's higher-order functions evaluate their lambda
  * interpreted, per element, with a per-step array copy — O(n²)
  * allocations per row and a whole-stage-codegen break. Tokenizer
  * training runs this fold over EVERY document EVERY merge round, so
  * it is the hot path of the trainer at corpus scale. This expression
  * is the `NormalizeNFC`/`ZOrderKey`-family answer: a single
  * allocation-light loop in [[BpeMerge.mergePass]], called from
  * generated code, staying inside whole-stage codegen.
  *
  * Semantics (identical to the fold, differential-tested in
  * `BpeSpec`): scan left to right; whenever the last emitted symbol
  * is `a` and the current is `b`, replace the last with "a b" —
  * greedy, non-overlapping ("x x x" with pair (x,x) → ["x x", "x"]).
  *
  * SQL surface: `bpe_merge(arr, 'a', 'b')` via [[graft.GraftExtensions]].
  */
case class BpeMergePass(child: Expression, a: String, b: String)
    extends UnaryExpression {

  override def dataType: DataType = child.dataType match {
    case ArrayType(StringType, n) => ArrayType(StringType, n)
    case _ => ArrayType(StringType, containsNull = false)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge needs array<string>, got $other")
  }

  @transient private lazy val aU = UTF8String.fromString(a)
  @transient private lazy val bU = UTF8String.fromString(b)
  @transient private lazy val mergedU = UTF8String.fromString(s"$a $b")

  override protected def nullSafeEval(input: Any): Any =
    BpeMerge.mergePass(input.asInstanceOf[ArrayData], aU, bU, mergedU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeA", aU, classOf[UTF8String].getName)
    val bRef = ctx.addReferenceObj("bpeB", bU, classOf[UTF8String].getName)
    val mRef = ctx.addReferenceObj("bpeMerged", mergedU, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeMerge.mergePass($c, $aRef, $bRef, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergePass =
    copy(child = newChild)
}

object BpeMerge {

  /** The merge kernel, shared by interpreted eval and generated code:
    * one pass, one output buffer, one final right-sized copy. Null
    * elements (possible under `containsNull` schemas) never match and
    * pass through unchanged. */
  def mergePass(in: ArrayData, a: UTF8String, b: UTF8String,
                merged: UTF8String): ArrayData = {
    val n = in.numElements()
    val out = new Array[AnyRef](n)
    var m = 0
    var i = 0
    while (i < n) {
      val cur: UTF8String = if (in.isNullAt(i)) null else in.getUTF8String(i)
      if (m > 0 && cur != null && out(m - 1) != null &&
          a.equals(out(m - 1)) && b.equals(cur)) {
        out(m - 1) = merged
      } else {
        out(m) = cur
        m += 1
      }
      i += 1
    }
    new GenericArrayData(
      if (m == n) out else java.util.Arrays.copyOf(out, m))
  }

  /** Column API: one greedy merge pass of (a, b) → "a b". */
  def merge(w: Column, a: String, b: String): Column =
    GraftColumnBridge.column(BpeMergePass(GraftColumnBridge.expression(w), a, b))
}
