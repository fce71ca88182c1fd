package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IBLT contract: exact decode within capacity, DETECTED failure
  * beyond it (never silent wrong answers), and cell tables that are
  * pure functions of the set (partitioning-invariant, mergeable). */
class IbltSpec extends SparkSpec {
  import spark.implicits._

  private val cells = 64

  private def table(keys: Seq[Long], parts: Int) =
    Iblt.cellTable(Iblt.cellRows(
      spark.createDataset(keys).toDF("v").repartition(parts), col("v"),
      cells))

  private def diffOf(a: Seq[Long], b: Seq[Long], parts: Int = 4) = {
    val raw = Iblt.subtract(table(a, parts), table(b, parts + 1))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    Iblt.peel(raw, cells)
  }

  test("decodes the exact symmetric difference, sided") {
    val a = (1L to 500L)
    val b = (1L to 500L).filter(_ % 50 != 0) ++ Seq(9999L, 8888L)
    val (rec, ok) = diffOf(a.toSeq, b)
    assert(ok)
    val aOnly = rec.filter(_._2 == 1).map(_._1).sorted
    val bOnly = rec.filter(_._2 == -1).map(_._1).sorted
    assert(aOnly == (50L to 500L by 50L).toSeq)
    assert(bOnly == Seq(8888L, 9999L))
  }

  test("identical replicas subtract to an empty decode") {
    val (rec, ok) = diffOf((1L to 300L).toSeq, (1L to 300L).toSeq)
    assert(ok && rec.isEmpty)
  }

  test("a diff beyond capacity is a DETECTED failure, and everything " +
    "recovered before the stall is still correct") {
    // 200-element diff vs 64 cells: peeling must stall, not lie
    val a = (1L to 400L)
    val b = (201L to 600L)
    val (rec, ok) = diffOf(a.toSeq, b.toSeq)
    assert(!ok, s"expected decode failure, recovered ${rec.size}")
    val trueDiff = ((1L to 200L).map(v => (v, 1)) ++
      (401L to 600L).map(v => (v, -1))).toSet
    assert(rec.toSet.subsetOf(trueDiff), "recovered a non-diff element")
  }

  test("cell tables are partitioning-invariant") {
    val keys = (1L to 300L).toSeq
    val t1 = table(keys, 1).orderBy("pos").collect().toSeq
    val t32 = table(keys, 32).orderBy("pos").collect().toSeq
    assert(t1 == t32)
  }
}
