package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram language-model quality scoring (CCNet-style): score each
  * document by its mean per-token surprisal `-mean(log2 p(w))` (bits
  * per token) under a unigram model fit on a reference corpus — word
  * soup and boilerplate score far from prose, so the metric drives
  * keep/drop and mixture decisions in LLM curation pipelines (SURVEY
  * §2.10 north_star; no reference analog — the reference moves rows,
  * it never models content).
  *
  * Scale shape (100 TB):
  *   - Fitting shuffles (token-hash, count) partial aggregates — one
  *     exchange ∝ VOCABULARY, not corpus; the model keeps only the
  *     top-`maxVocab` types (every rarer type scores as OOV), so the
  *     model size is bounded by construction.
  *   - Scoring is MAP-ONLY: the model re-enters the plan as a broadcast
  *     map literal and each document folds its own token array through
  *     one codegen'd `aggregate` lambda — the corpus is never shuffled
  *     and never joined.
  *   - The OOV floor (half a count at the fitted total) keeps scores
  *     finite and monotone: unseen tokens are maximally surprising.
  */
object LmScore {

  /** A fitted unigram model: top types with counts, and the TOTAL token
    * count of the fitting corpus (including tokens beyond the top-K, so
    * probabilities stay honest when the vocab is truncated). */
  final case class Unigram(counts: Map[String, Long], total: Long) {
    require(total > 0, "cannot fit a unigram model on an empty corpus")

    /** -log2 p(w) per type; OOV scores as half a count. */
    def surprisal(w: String): Double =
      -math.log(counts.getOrElse(w, 0L).toDouble.max(0.5) / total) /
        math.log(2.0)
  }

  /** Fit on a corpus: one count-per-type aggregation (exchange ∝
    * vocabulary), top-`maxVocab` types kept with a deterministic
    * (count desc, token) tie-break. The collected model is O(maxVocab)
    * — the same driver-size contract as IVF centroids. */
  def fit(docs: DataFrame, textCol: String,
          maxVocab: Int = 1 << 17): Unigram = {
    val freq = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .persist()
    try {
      val totalRow = freq.agg(sum("c")).head()
      require(!totalRow.isNullAt(0), "cannot fit a unigram model on an " +
        "empty corpus")
      val total = totalRow.getLong(0)
      val top = freq.orderBy(col("c").desc, col("w"))
        .limit(maxVocab).as[(String, Long)](
          org.apache.spark.sql.Encoders.product[(String, Long)]).collect()
      Unigram(top.toMap, total)
    } finally freq.unpersist()
  }

  /** Bits-per-token column for `text` under `model` — a pure map-side
    * fold over the token array (broadcast map literal + one codegen'd
    * `aggregate` lambda; no join, no shuffle). */
  def bitsPerToken(text: Column, model: Unigram): Column = {
    val probs = typedLit(model.counts.map { case (w, c) =>
      w -> c.toDouble / model.total
    })
    val floor = lit(0.5 / model.total)
    val toks = TextFunctions.tokens(text)
    val logProbSum = aggregate(toks, lit(0.0d),
      (acc, w) => acc + log2(coalesce(element_at(probs, w), floor)))
    -logProbSum / size(toks)
  }
}
