package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression — the
  * canonicalization step every multilingual corpus pipeline runs
  * before hashing or dedup: the same visible text can arrive composed
  * (é = U+00E9) or decomposed (e + U+0301) depending on the source
  * system, and every hash-based operator downstream (exact dedup,
  * MinHash shingles, fingerprints) treats those as different bytes
  * unless the corpus is normalized first.
  *
  * Spark ships no normalization function; `java.text.Normalizer` is
  * the JDK's ICU-conformant implementation, called per row inside
  * whole-stage codegen (no UDF serialization wall). ASCII-only input
  * is returned unchanged by the JDK's fast path.
  *
  * SQL surface: `nfc_normalize(s)` via [[graft.GraftExtensions]].
  */
case class NormalizeNFC(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNFC =
    copy(child = newChild)
}

object Normalize {
  /** Column API: NFC-normalize a string column. */
  def nfc(c: Column): Column =
    GraftColumnBridge.column(NormalizeNFC(GraftColumnBridge.expression(c)))
}
