package graft.cdc

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Bitemporal as-of winners vs a sequential model on RANDOM version
  * tables: arbitrary (possibly overlapping) valid intervals, retroactive
  * corrections, closed transaction ranges and tx ties — the catalog
  * query (`cdc_bitemporal_asof`) hash-checks one fixed derivation; this
  * spec pins [[Materialize.bitemporalAsOf]]'s semantics over the whole
  * input space, including the documented (tx_from, c)-lexicographic tie
  * rule of the packed argmax. */
case class BtV(id: Long, tx_from: Long, tx_to: Option[Long],
               valid_from: Long, valid_to: Option[Long], c: Long)

class BitemporalPropertySpec extends SparkSpec {

  import spark.implicits._

  private type V = BtV
  private val V = BtV

  private val verGen: Gen[V] = for {
    id <- Gen.choose(0L, 4L)
    txFrom <- Gen.choose(1L, 4L)
    txTo <- Gen.option(Gen.choose(2L, 5L))
    vFrom <- Gen.choose(0L, 3L)
    vTo <- Gen.option(Gen.choose(1L, 5L))
    c <- Gen.choose(0L, 999L)
  } yield V(id, txFrom, txTo.filter(_ > txFrom), vFrom,
    vTo.filter(_ > vFrom), c)

  private val genInput: Gen[(List[V], List[(Long, Long)])] = for {
    n <- Gen.choose(1, 25)
    vs <- Gen.listOfN(n, verGen)
    np <- Gen.choose(1, 4)
    ps <- Gen.listOfN(np,
      Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 5L)))
  } yield (vs, ps.distinct)

  private def model(vs: Seq[V], ps: Seq[(Long, Long)]) =
    (for {
      (t, v) <- ps
      byId = vs.filter(x => x.tx_from <= t && x.tx_to.forall(t < _) &&
        x.valid_from <= v && x.valid_to.forall(v < _))
        .groupBy(_.id)
      (id, cand) <- byId
    } yield (t, v, id, cand.map(x => (x.tx_from, x.c)).max._2)).toSet

  test("packed-argmax winners == sequential model on random version " +
    "tables (open/closed intervals, corrections, tx ties)") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8),
      Prop.forAll(genInput) { case (vs, ps) =>
        val versions = vs.toDF()
        val probes = ps.toDF("t", "v")
        val got = Materialize.bitemporalAsOf(versions, probes)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
        got == model(vs, ps)
      })
    assert(res.passed, res.status.toString)
  }
}
