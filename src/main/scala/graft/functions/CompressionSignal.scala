package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a string as a codegen'd Catalyst
  * expression — the compression-ratio quality signal large-scale
  * corpus curation pipelines use (Gopher/RefinedWeb class filters):
  * machine-generated boilerplate and template spam compress far below
  * natural text, so `deflate_size(text) / octet_length(text)` is a
  * cheap, language-agnostic repetitiveness gauge that catches
  * LONG-RANGE duplication the token-level repetition metrics
  * (`text_repetition`'s sorted-run scan) structurally miss — a
  * paragraph pasted 20 times has unremarkable bigram stats per copy
  * but a dramatic DEFLATE ratio.
  *
  * Determinism: `java.util.zip.Deflater` at a FIXED level (6) with the
  * default strategy is deterministic for a given input on a given JVM,
  * which is all the engine promises — the signal is consumed through
  * THRESHOLDS with wide margins (the catalog query separates planted
  * repetitive docs at ratio ≤ 0.11 from natural fixture text at
  * ≥ 0.39, a 3.5× gap), never through exact cross-engine byte counts.
  * The DuckDB oracle therefore checks the FLAGGED SET (planted ground
  * truth), not the sizes.
  *
  * Same static-kernel + defineCodeGen shape as [[EditDistance]]:
  * whole-stage codegen emits one static call, no UDF wall. O(n) time,
  * one 8 KiB scratch buffer per call.
  *
  * SQL surface: `deflate_size(s)` via [[graft.GraftExtensions]].
  */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_size needs a string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    CompressionSignal.deflateSize(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CompressionSignal.deflateSize($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object CompressionSignal {

  // one Deflater + scratch buffer per executor thread: deflateInit/
  // deflateEnd are JNI calls and the kernel runs once per ROW — a
  // fresh native context per call would dominate the compression
  // itself. reset() restores the identical level-6 state, so the
  // output (and therefore the counted size) is unchanged.
  //
  // Each context registers with a Cleaner keyed on the per-thread
  // holder object: when the owning thread dies (dynamic pools,
  // repeated local sessions) the ThreadLocal entry becomes
  // unreachable and the cleaner calls Deflater.end(), releasing the
  // native zlib state deterministically instead of waiting on
  // finalization (which JDK deprecated and may never run).
  private val cleaner = java.lang.ref.Cleaner.create()

  // the cleanup action must NOT capture the holder itself (that would
  // pin it reachable forever); holding the Deflater alone is safe —
  // the phantom fires on the HOLDER, the Deflater stays alive exactly
  // until end() runs.
  private final class EndDeflater(d: java.util.zip.Deflater)
      extends Runnable {
    override def run(): Unit = d.end()
  }

  private final class Ctx {
    val deflater = new java.util.zip.Deflater(6)
    val buf = new Array[Byte](8192)
    cleaner.register(this, new EndDeflater(deflater))
  }

  private val local = new ThreadLocal[Ctx] {
    override def initialValue(): Ctx = new Ctx
  }

  /** DEFLATE (zlib wrapper, level 6, default strategy) byte size of
    * the input. Static so interpreted eval and generated code share
    * one kernel. */
  def deflateSize(bytes: Array[Byte]): Int = {
    val ctx = local.get()
    val d = ctx.deflater
    val buf = ctx.buf
    d.reset()
    d.setInput(bytes)
    d.finish()
    var n = 0
    while (!d.finished()) n += d.deflate(buf)
    n
  }

  /** Column API: compressed byte size of `text`. */
  def deflateSize(text: Column): Column =
    GraftColumnBridge.column(DeflateSize(GraftColumnBridge.expression(text)))
}
