package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Invertible Bloom Lookup Table set reconciliation (Eppstein, Goodrich,
  * Uyeda, Varghese, "What's the Difference?", SIGCOMM 2011): two
  * replicas each fold their element set into an O(cells) cell table;
  * the cell-wise SUBTRACTION of the two tables depends only on the
  * symmetric difference, and if cells ≳ 1.3–1.5× the true diff size the
  * difference decodes EXACTLY by iterative peeling of pure cells.
  *
  * Why this beats shipping keys at 100 TB: bucket digests (Reconcile)
  * tell you WHICH buckets diverge; an IBLT tells you WHICH ROWS — while
  * still moving only O(expected-diff) state per replica, never the key
  * domain. Sizing is part of the contract: cells are provisioned for an
  * expected diff bound d̂, and decode failure (diff > capacity) is a
  * detected condition that falls back to bucket-digest + row re-sync,
  * not a wrong answer.
  *
  * Determinism: elements hash with the repo's md5 fingerprint family,
  * so both engines (and the driver-side peeler) see identical cell
  * contents; peeling order cannot change the recovered SET.
  *
  * Cell state per element: 3 positions via md5(i|v); each cell keeps
  * (count, XOR of values, XOR of value checksums). All three are
  * group-bounded algebraic aggregates — map-side combined, mergeable,
  * O(cells) on the wire.
  */
object Iblt {

  val Hashes = 3

  private def md5Long(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    // first 8 hex chars == first 4 bytes, as unsigned
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Driver-side twins of the Spark-side hash columns. */
  def checkOf(v: Long): Long = md5Long(s"c|$v")
  def posOf(i: Int, v: Long, cells: Int): Int =
    (md5Long(s"$i|$v") % cells).toInt

  /** Spark-side: element column -> exploded (pos, v, check) rows, one
    * per hash function. `v` must be a non-negative long. */
  def cellRows(df: DataFrame, v: Column, cells: Int): DataFrame = {
    def fp(prefix: Column): Column =
      conv(substring(md5(concat(prefix, v.cast("string"))), 1, 8), 16, 10)
        .cast("long")
    df.select(v.as("v"), fp(lit("c|")).as("check"),
        array((0 until Hashes).map(i => fp(lit(s"$i|")) % cells): _*)
          .as("pos"))
      .select(explode(col("pos")).as("pos"), col("v"), col("check"))
  }

  /** Spark-side: fold one replica's cell rows into its cell table. */
  def cellTable(rows: DataFrame): DataFrame =
    rows.groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        bit_xor(col("v")).as("xv"),
        bit_xor(col("check")).as("xc"))

  /** Cell-wise subtraction A − B (full outer on pos; absent = empty). */
  def subtract(a: DataFrame, b: DataFrame): DataFrame = {
    val aa = a.select(col("pos"), col("n").as("na"), col("xv").as("xva"),
      col("xc").as("xca"))
    val bb = b.select(col("pos"), col("n").as("nb"), col("xv").as("xvb"),
      col("xc").as("xcb"))
    aa.join(bb, Seq("pos"), "full_outer")
      .select(col("pos"),
        (coalesce(col("na"), lit(0L)) - coalesce(col("nb"), lit(0L)))
          .as("n"),
        (coalesce(col("xva"), lit(0L)).bitwiseXOR(
          coalesce(col("xvb"), lit(0L)))).as("xv"),
        (coalesce(col("xca"), lit(0L)).bitwiseXOR(
          coalesce(col("xcb"), lit(0L)))).as("xc"))
  }

  final case class Cell(var n: Long, var xv: Long, var xc: Long)

  /** Driver-side peel of the SUBTRACTED table (O(cells) rows): returns
    * (recovered (v, side) pairs, decoded) where side = +1 (only in A)
    * or −1 (only in B). decoded=false means the diff exceeded the
    * table's capacity — the caller falls back to coarser reconciliation
    * (never a wrong answer: recovered elements are checksum-verified).
    */
  def peel(cellsIn: Seq[(Int, Long, Long, Long)],
           nCells: Int): (Seq[(Long, Int)], Boolean) = {
    val t = Array.fill(nCells)(Cell(0L, 0L, 0L))
    cellsIn.foreach { case (p, n, xv, xc) => t(p) = Cell(n, xv, xc) }
    val out = scala.collection.mutable.ListBuffer.empty[(Long, Int)]
    var progress = true
    while (progress) {
      progress = false
      var p = 0
      while (p < nCells) {
        val c = t(p)
        if ((c.n == 1 || c.n == -1) && checkOf(c.xv) == c.xc) {
          val v = c.xv
          val side = c.n.toInt
          out += ((v, side))
          var i = 0
          while (i < Hashes) {
            val q = posOf(i, v, nCells)
            t(q).n -= side
            t(q).xv ^= v
            t(q).xc ^= checkOf(v)
            i += 1
          }
          progress = true
        }
        p += 1
      }
    }
    val clean = t.forall(c => c.n == 0L && c.xv == 0L && c.xc == 0L)
    (out.toSeq, clean)
  }
}
