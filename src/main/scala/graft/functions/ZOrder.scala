package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * At 100 TB the dominant cost of a selective two-column predicate is
  * how many files/row-groups the scan has to open. Range-partitioning
  * by a single column clusters one dimension and scatters the other;
  * interleaving the bits of both keys gives files that are small
  * rectangles in (a, b) space, so parquet min/max stats prune scans on
  * EITHER column. This is the layout technique Delta/Iceberg expose as
  * `OPTIMIZE ... ZORDER BY`, implemented here as a codegen'd Catalyst
  * expression plus a `Layout.clusteredWrite` helper (SURVEY §2.10 —
  * custom Expression over UDF for hot paths; the key is computed once
  * per row at write time).
  */
object ZOrder {

  /** Interleave the low 16 bits of `a` (even positions) and `b` (odd
    * positions) into a 32-bit Morton key, via parallel bit-spread
    * (Hacker's Delight §7-2 style magic masks — public-domain
    * technique; no per-bit loop). */
  def interleave16(a: Long, b: Long): Long =
    spread16(a) | (spread16(b) << 1)

  /** Spread the low 16 bits of x to the even bit positions of a 32-bit
    * word: bit i moves to bit 2i. */
  def spread16(x: Long): Long = {
    var v = x & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** True n-dimensional Morton interleave: bit i of column j lands at
    * position i·n + j. Reference implementation for [[ZOrderKeyN]]. */
  def interleaveN(xs: Array[Long], bits: Int): Long = {
    val n = xs.length
    var out = 0L
    var j = 0
    while (j < n) {
      var i = 0
      while (i < bits) {
        out |= ((xs(j) >> i) & 1L) << (i * n + j)
        i += 1
      }
      j += 1
    }
    out
  }

  /** Morton key of `cols.length` integral columns, `bits` low bits
    * each (`bits × n ≤ 63`). Pairwise composition of 2-D interleaves
    * is NOT a true n-D Morton order — this is. */
  def zkeyN(bits: Int, cols: Column*): Column = {
    require(cols.size >= 2, "zkeyN needs at least 2 columns")
    require(bits * cols.size <= 63, s"bits=$bits × ${cols.size} dims > 63")
    GraftColumnBridge.column(ZOrderKeyN(
      cols.map(c => GraftColumnBridge.expression(c.cast("long"))), bits))
  }

  /** DuckDB-evaluable SQL for [[zkeyN]] (oracle counterpart). */
  def zkeyNOracleSql(bits: Int, cols: String*): String = {
    val n = cols.size
    (for { (c, j) <- cols.zipWithIndex; i <- 0 until bits }
      yield s"((($c >> $i) & 1) << ${i * n + j})")
      .mkString("(", " + ", ")")
  }

  /** Morton key of two integral columns (low 16 bits each). */
  def zkey(a: Column, b: Column): Column =
    GraftColumnBridge.column(ZOrderKey(
      GraftColumnBridge.expression(a.cast("long")),
      GraftColumnBridge.expression(b.cast("long"))))

  /** DuckDB-evaluable SQL computing the same Morton key — the oracle
    * counterpart of `zkey` (bit-by-bit sum; DuckDB has no bit-spread
    * intrinsics and the 16-term sum is exact integer math). */
  def zkeyOracleSql(a: String, b: String): String =
    (0 until 16).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
}

/** `interleave16` as a codegen'd binary expression over two BIGINT
  * columns: five shift/mask ops per side, no branches, stays inside
  * whole-stage codegen. */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  // literal inputs fold to a constant at plan time
  override def foldable: Boolean = left.foldable && right.foldable

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ZOrderKey needs (bigint, bigint), got ${left.dataType} / ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder.interleave16($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

/** n-ary Morton interleave over BIGINT columns, `bits` low bits each.
  * Codegen unrolls to `n × bits` shift/mask/or terms — branch-free,
  * allocation-free, inside whole-stage codegen. Null if any input is
  * null. */
case class ZOrderKeyN(children: Seq[Expression], bits: Int)
    extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType) &&
        children.size >= 2 && bits * children.size <= 63)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ZOrderKeyN needs >=2 bigint inputs with bits×dims <= 63, got " +
        s"${children.map(_.dataType).mkString(",")} bits=$bits")

  override def eval(input: InternalRow): Any = {
    val xs = new Array[Long](children.size)
    var j = 0
    while (j < xs.length) {
      val v = children(j).eval(input)
      if (v == null) return null
      xs(j) = v.asInstanceOf[Long]
      j += 1
    }
    ZOrder.interleaveN(xs, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val n = children.size
    val terms = (for {
      (e, j) <- evals.zipWithIndex
      i <- 0 until bits
    } yield s"(((${e.value} >> $i) & 1L) << ${i * n + j})").mkString(" | ")
    val childCode = evals.map(_.code.toString).mkString("\n")
    if (nullable) {
      val anyNull = evals.map(_.isNull.toString).mkString(" || ")
      ev.copy(code = code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = 0L;
        if (!${ev.isNull}) { ${ev.value} = $terms; }""")
    } else {
      ev.copy(code = code"""
        $childCode
        long ${ev.value} = $terms;""",
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderKeyN =
    copy(children = newChildren)
}

/** Write-side clustering helpers: turn a computed cluster key into a
  * physical file layout whose per-file min/max stats are tight. */
object Layout {

  /** Cluster `df` into `nFiles` files by the Morton key of (a, b):
    * range-partition on the key (contiguous, balanced key ranges per
    * file — one skew-resistant shuffle), then sort within each
    * partition so row-group stats are tight too. The key column is
    * dropped before the write; it exists only to drive placement. */
  def zorderWrite(df: DataFrame, a: String, b: String,
                  path: String, nFiles: Int): Unit = {
    val keyed = df.withColumn("_graft_zkey",
      ZOrder.zkey(col(a), col(b)))
    keyed
      .repartitionByRange(nFiles, col("_graft_zkey"))
      .sortWithinPartitions("_graft_zkey")
      .drop("_graft_zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Baseline for comparison: same file count, hash-scattered layout. */
  def hashWrite(df: DataFrame, path: String, nFiles: Int): Unit =
    df.repartition(nFiles).write.mode("overwrite").parquet(path)

  /** [[zorderWrite]]'s sibling on the Hilbert curve (16-bit coords):
    * same range-partition + in-partition sort recipe, tighter file
    * envelopes because contiguous Hilbert ranges have no diagonal
    * jumps (see [[Hilbert]]). */
  def hilbertWrite(df: DataFrame, a: String, b: String,
                   path: String, nFiles: Int): Unit = {
    val keyed = df.withColumn("_graft_hkey",
      Hilbert.hkey(16, col(a), col(b)))
    keyed
      .repartitionByRange(nFiles, col("_graft_hkey"))
      .sortWithinPartitions("_graft_hkey")
      .drop("_graft_hkey")
      .write.mode("overwrite").parquet(path)
  }
}
