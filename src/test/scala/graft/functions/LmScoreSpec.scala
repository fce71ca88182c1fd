package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unigram LM scoring: fit counts/total, truncation-with-OOV
  * semantics, surprisal monotonicity, and the map-only scoring fold
  * against a hand-computed expectation. */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  // 10 tokens total: "the"×4 "cat"×3 "sat"×2 "mat"×1
  private def corpus = Seq(
    (0L, "the cat sat"),
    (1L, "the cat sat the mat"),
    (2L, "the cat")).toDF("doc_id", "text")

  test("fit counts types and the full total") {
    val m = LmScore.fit(corpus, "text")
    assert(m.counts == Map("the" -> 4L, "cat" -> 3L, "sat" -> 2L, "mat" -> 1L))
    assert(m.total == 10L)
  }

  test("truncated vocab keeps the top types deterministically; total " +
    "still counts every token; dropped types score as OOV") {
    val m = LmScore.fit(corpus, "text", maxVocab = 2)
    assert(m.counts == Map("the" -> 4L, "cat" -> 3L))
    assert(m.total == 10L, "total must include tokens beyond the top-K")
    // OOV (and dropped) types are maximally surprising
    assert(m.surprisal("mat") > m.surprisal("cat"))
    assert(m.surprisal("mat") == m.surprisal("never-seen"))
  }

  test("surprisal is monotone in rarity and matches -log2 p") {
    val m = LmScore.fit(corpus, "text")
    assert(m.surprisal("the") < m.surprisal("cat"))
    assert(m.surprisal("cat") < m.surprisal("mat"))
    assert(math.abs(m.surprisal("the") - (-math.log(0.4) / math.log(2.0)))
      < 1e-12)
  }

  test("bitsPerToken folds the token array against the model: " +
    "hand-computed expectation, zero exchanges in the scoring plan") {
    val m = LmScore.fit(corpus, "text")
    val scored = corpus.select(col("doc_id"),
      LmScore.bitsPerToken(col("text"), m).as("bits"))
    val got = scored.as[(Long, Double)].collect().toMap
    def lp(c: Double) = math.log(c / 10.0) / math.log(2.0)
    val doc0 = -(lp(4) + lp(3) + lp(2)) / 3.0
    assert(math.abs(got(0L) - doc0) < 1e-9)
    // doc 1 contains the rare "mat" → more surprising than doc 0
    assert(got(1L) > got(0L) - 1e-9 || got(1L) > got(2L))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must be map-only:\n$plan")
  }

  test("an unseen document scores via the OOV floor, higher than any " +
    "in-vocab doc") {
    val m = LmScore.fit(corpus, "text")
    val out = Seq((9L, "zebra quark")).toDF("doc_id", "text")
      .select(LmScore.bitsPerToken(col("text"), m).as("bits"))
      .as[Double].head()
    assert(out == m.surprisal("zebra"), "all-OOV doc = floor surprisal")
    assert(out > m.surprisal("mat"))
  }

  test("fitting an empty corpus fails loudly") {
    intercept[IllegalArgumentException] {
      LmScore.fit(Seq.empty[(Long, String)].toDF("doc_id", "text"), "text")
    }
  }
}
