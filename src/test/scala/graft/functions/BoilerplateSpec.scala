package graft.functions

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Corpus-frequency boilerplate removal: cross-document paragraphs
  * stripped, per-document prose kept in order, distinct-doc promotion
  * semantics, and the broadcast-set size guard. */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val banner = "subscribe to our newsletter"
  private val footer = "all rights reserved"

  // banner in 3 docs, footer in 2, everything else unique; doc 3
  // repeats its OWN paragraph twice (must not promote it)
  private def corpus: DataFrame = Seq(
    (0L, s"alpha prose one\n\n$banner\n\nalpha prose two"),
    (1L, s"$banner\n\nbeta prose"),
    (2L, s"gamma prose\n\n$banner\n\n$footer"),
    (3L, s"delta prose\n\ndelta prose\n\n$footer"),
    (4L, "epsilon prose only")).toDF("doc_id", "text")

  private def stripped(minDocs: Int, maxBoiler: Int = 100000) =
    Boilerplate.strip(corpus, "text", "doc_id", minDocs, maxBoiler = maxBoiler)
      .select("doc_id", "text", "n_removed")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("paragraphs above the doc threshold are stripped everywhere; " +
    "surviving paragraphs keep their order") {
    val out = stripped(minDocs = 3) // banner (3 docs) goes, footer (2) stays
    assert(out(0L) == (("alpha prose one\n\nalpha prose two", 1L)))
    assert(out(1L) == (("beta prose", 1L)))
    assert(out(2L) == ((s"gamma prose\n\n$footer", 1L)))
    assert(out(3L) == ((s"delta prose\n\ndelta prose\n\n$footer", 0L)))
    assert(out(4L) == (("epsilon prose only", 0L)))
  }

  test("a lower threshold also strips the two-doc footer") {
    val out = stripped(minDocs = 2)
    assert(out(2L) == (("gamma prose", 2L)))
    assert(out(3L) == (("delta prose\n\ndelta prose", 1L)))
    // repeating a paragraph within ONE doc never promotes it
    assert(out(3L)._1.contains("delta prose\n\ndelta prose"))
  }

  test("no paragraph crosses the threshold: corpus unchanged") {
    val out = stripped(minDocs = 4)
    assert(out.values.forall(_._2 == 0L))
    assert(out(1L)._1 == s"$banner\n\nbeta prose")
  }

  test("detection reports (hash, n_docs) with distinct-doc counts") {
    val found = Boilerplate
      .boilerplateHashes(corpus, "text", "doc_id", minDocs = 2)
      .select("n_docs").as[Long].collect().sorted
    assert(found.toSeq == Seq(2L, 3L)) // footer in 2 docs, banner in 3
  }

  test("an over-threshold boilerplate set fails loudly instead of " +
    "flooding the driver") {
    val e = intercept[IllegalArgumentException] {
      stripped(minDocs = 2, maxBoiler = 1) // banner AND footer match
    }
    assert(e.getMessage.contains("maxBoiler"))
  }

  test("minDocs = 1 is rejected (it would declare the whole corpus " +
    "boilerplate)") {
    intercept[IllegalArgumentException] {
      Boilerplate.strip(corpus, "text", "doc_id", minDocs = 1)
    }
  }
}
