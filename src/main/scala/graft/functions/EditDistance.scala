package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau–Levenshtein distance as a codegen'd Catalyst
  * expression — the edit distance whose fourth operation is adjacent
  * TRANSPOSITION, the single most common human typo class ("teh",
  * "adn"): plain Levenshtein charges a swap 2 edits, Damerau charges
  * 1, so a transposition-tolerant matcher at threshold 1 catches
  * swapped-letter dupes Levenshtein-1 structurally misses.
  *
  * Spark ships only `levenshtein`; this is the UNRESTRICTED variant
  * (Lowrance–Wagner, distance("CA","ABC") = 2) — the same variant
  * DuckDB's `damerau_levenshtein` implements, which is what lets the
  * catalog query hash-check every distance cross-engine. The
  * restricted OSA variant (optimal string alignment, "CA"→"ABC" = 3)
  * is NOT this function.
  *
  * The kernel is a static method shared by interpreted eval and
  * generated code (the [[BpeMerge]] pattern): whole-stage codegen
  * emits one static call, no UDF serialization wall, no boxing.
  * O(|s|·|t|) time, O(|s|·|t|) ints — fine for name/title-length
  * strings; gate longer inputs behind a length-band block first.
  *
  * SQL surface: `damerau_levenshtein(a, b)` via
  * [[graft.GraftExtensions]].
  */
/** Jaro–Winkler similarity as a codegen'd Catalyst expression — the
  * prefix-weighted edit similarity record-linkage systems score
  * person/product names with (Winkler's census matcher): transposition
  * tolerance from the Jaro match window plus a bonus for agreeing
  * prefixes, where human-entered name typos are rarest.
  *
  * Semantics match DuckDB's `jaro_winkler_similarity` (verified
  * empirically over the edge cases: match window max(|s|,|t|)/2 − 1,
  * half-transposition count, prefix bonus l·0.1·(1−j) with l ≤ 4
  * applied UNCONDITIONALLY — no 0.7 boost threshold), so catalog
  * queries hash-check scores cross-engine at 6 dp (the float kernel
  * rounding rule cosine kernels already use).
  *
  * Same static-kernel + defineCodeGen shape as [[DamerauLevenshtein]]:
  * whole-stage codegen emits one static call. O(|s|·window) time,
  * O(|s|+|t|) booleans.
  *
  * SQL surface: `jaro_winkler(a, b)` via [[graft.GraftExtensions]].
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "jaro_winkler needs two string inputs, got " +
        s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    EditDistance.jaroWinkler(
      l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.EditDistance.jaroWinkler($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "damerau_levenshtein needs two string inputs, got " +
        s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    EditDistance.damerau(
      l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.EditDistance.damerau($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object EditDistance {

  /** Lowrance–Wagner unrestricted Damerau–Levenshtein. The `da` map
    * tracks, per character, the last row where it occurred in `s`;
    * `db` the last column matched in this row — together they locate
    * the candidate transposition block, allowing edits between the
    * transposed pair (what "unrestricted" means). */
  def damerau(s: String, t: String): Int = {
    val n = s.length
    val m = t.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // DP matrix with the extra sentinel row/column the transposition
    // lookup needs; d(i+1)(j+1) = distance over prefixes s[0,i), t[0,j)
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= m) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val i1: Int = {
          val v = da.get(t.charAt(j - 1)); if (v == null) 0 else v.intValue()
        }
        val j1 = db
        var cost = 1
        if (s.charAt(i - 1) == t.charAt(j - 1)) { cost = 0; db = j }
        val subst = d(i)(j) + cost
        val insert = d(i + 1)(j) + 1
        val delete = d(i)(j + 1) + 1
        val transp = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        d(i + 1)(j + 1) =
          math.min(math.min(subst, insert), math.min(delete, transp))
        j += 1
      }
      da.put(s.charAt(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1)
  }

  /** Jaro–Winkler similarity, DuckDB-compatible (no boost threshold,
    * prefix ≤ 4, scaling 0.1). Equal strings short-circuit to 1.0;
    * an empty side scores 0.0. */
  def jaroWinkler(s: String, t: String): Double = {
    if (s == t) return 1.0
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    // match window; md < 0 (both length-1, unequal) admits no matches
    val md = math.max(n, m) / 2 - 1
    val ms = new Array[Boolean](n)
    val mt = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val hi = math.min(i + md + 1, m)
      var j = math.max(0, i - md)
      var open = true
      while (j < hi && open) {
        if (!mt(j) && s.charAt(i) == t.charAt(j)) {
          ms(i) = true; mt(j) = true; matches += 1; open = false
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // half-transpositions: matched chars out of order, counted pairwise
    var trans = 0
    var k = 0
    i = 0
    while (i < n) {
      if (ms(i)) {
        while (!mt(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val j3 = (mm / n + mm / m + (mm - trans / 2) / mm) / 3.0
    var l = 0
    val pmax = math.min(4, math.min(n, m))
    while (l < pmax && s.charAt(l) == t.charAt(l)) l += 1
    j3 + l * 0.1 * (1.0 - j3)
  }

  /** Column API: unrestricted Damerau–Levenshtein distance. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    GraftColumnBridge.column(DamerauLevenshtein(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column API: Jaro–Winkler similarity. */
  def jaroWinklerSim(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroWinkler(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
