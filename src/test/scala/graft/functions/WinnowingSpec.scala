package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Winnowing guarantee (Schleimer-Wilkerson-Aiken): for window w over
  * k-shingle hashes, ANY common token run of length ≥ w+k−1 between
  * two documents yields at least one shared selected fingerprint —
  * the property that makes ~2/(w+1) index density safe for overlap
  * detection. Checked on randomized vocabularies and overlap
  * placements (each trial is a Spark job, so trials are few); plus
  * the density and short-document edge cases.
  */
class WinnowingSpec extends SparkSpec {

  import spark.implicits._

  private val k = 5
  private val w = 4

  private def check(prop: Prop, trials: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), prop)
    assert(res.passed, res.status.toString)
  }

  // random word from a vocabulary sized to make accidental shingle
  // collisions unlikely but possible
  private val wordGen = Gen.choose(0, 9999).map(i => s"w$i")

  test("guarantee: a shared run of w+k-1 tokens always yields a " +
    "shared fingerprint, wherever the run lands in either document") {
    val gen = for {
      run <- Gen.listOfN(w + k - 1, wordGen) // the planted overlap
      aPre <- Gen.choose(0, 30).flatMap(Gen.listOfN(_, wordGen))
      aPost <- Gen.choose(0, 30).flatMap(Gen.listOfN(_, wordGen))
      bPre <- Gen.choose(0, 30).flatMap(Gen.listOfN(_, wordGen))
      bPost <- Gen.choose(0, 30).flatMap(Gen.listOfN(_, wordGen))
    } yield (
      (aPre ++ run ++ aPost).mkString(" "),
      (bPre ++ run ++ bPost).mkString(" "))
    check(Prop.forAll(gen) { case (a, b) =>
      val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      val fp = DedupFunctions
        .winnowedFingerprints(docs, "doc_id", "text", k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val fa = fp.collect { case (1L, h) => h }.toSet
      val fb = fp.collect { case (2L, h) => h }.toSet
      fa.intersect(fb).nonEmpty
    })
  }

  test("density: selection keeps roughly 2/(w+1) of shingle positions " +
    "and never exceeds the full shingle count") {
    val words = (0 until 400).map(i => s"w${(i * 7919) % 10000}")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val n = DedupFunctions
      .winnowedFingerprints(docs, "doc_id", "text", k, w).count()
    val shingles = words.length - k + 1
    assert(n <= shingles)
    // expected density 2/(w+1) = 0.4; allow a generous band
    assert(n >= shingles / 5, s"n=$n shingles=$shingles")
    assert(n <= shingles * 3 / 5, s"n=$n shingles=$shingles")
  }

  test("documents shorter than w shingles yield no fingerprints; " +
    "w shingles yield exactly one window's pick") {
    val short = Seq((1L, (1 to (k + w - 2)).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text") // w-1 shingles -> no full window
    assert(DedupFunctions
      .winnowedFingerprints(short, "doc_id", "text", k, w).count() == 0L)
    val exact = Seq((1L, (1 to (k + w - 1)).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text") // exactly w shingles -> one window
    assert(DedupFunctions
      .winnowedFingerprints(exact, "doc_id", "text", k, w).count() == 1L)
  }
}
