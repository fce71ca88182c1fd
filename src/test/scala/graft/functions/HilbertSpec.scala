package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The defining Hilbert-curve properties, which together fully
  * characterize the curve (and which Morton order fails). */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private val bits = 5
  private val n = 1 << bits // 32x32 grid

  private def gridKeys: Map[Long, (Long, Long)] =
    (for { x <- 0L until n; y <- 0L until n }
      yield Hilbert.xy2d(bits, x, y) -> (x, y)).toMap

  test("keys over the full grid are a permutation of 0 .. n^2-1") {
    val ks = gridKeys.keySet
    assert(ks.size == n * n)
    assert(ks.min == 0L && ks.max == n * n - 1)
  }

  test("consecutive keys are Manhattan distance EXACTLY 1 apart — no " +
    "diagonal jumps (Morton fails this at every power-of-two boundary)") {
    val byKey = gridKeys
    (0L until (n * n - 1)).foreach { d =>
      val (x1, y1) = byKey(d)
      val (x2, y2) = byKey(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
    // Morton, for contrast, jumps at the first quadrant boundary
    val m = (0L until n * n).map(d =>
      (0L until n).flatMap(x => (0L until n).map(y => (x, y)))
        .find(p => ZOrder.interleave16(p._1, p._2) == d).get)
    val jumps = m.sliding(2).count { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(jumps > 0, "expected Morton to have diagonal jumps")
  }

  test("the codegen'd expression matches the Scala kernel and is " +
    "null-propagating") {
    val df = spark.range(200).select(
      (col("id") % 17).as("a"), (col("id") % 13).as("b"))
      .withColumn("hk", Hilbert.hkey(bits, col("a"), col("b")))
    df.collect().foreach { r =>
      assert(r.getLong(2) == Hilbert.xy2d(bits, r.getLong(0), r.getLong(1)))
    }
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
      .select(Hilbert.hkey(bits, col("a"), col("b")).as("hk"))
    assert(withNull.collect().head.isNullAt(0))
  }

  test("clustering payoff: Hilbert buckets have average spans no worse " +
    "than Morton buckets on the same grid") {
    def spans(key: (Long, Long) => Long): Double = {
      val cells = for { x <- 0L until n; y <- 0L until n }
        yield (key(x, y) / 64, x, y)
      cells.groupBy(_._1).values.map { g =>
        (g.map(_._2).max - g.map(_._2).min) +
          (g.map(_._3).max - g.map(_._3).min)
      }.sum.toDouble / cells.groupBy(_._1).size
    }
    val h = spans((x, y) => Hilbert.xy2d(bits, x, y))
    val z = spans((x, y) => ZOrder.interleave16(x, y))
    assert(h <= z, s"hilbert avg span $h vs morton $z")
  }
}
