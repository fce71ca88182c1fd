package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM-training-data pipelines, expressed
  * as pure Column algebra (codegen'd, no UDFs) wherever possible.
  * Designed per-row → embarrassingly parallel at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish token count: split on word/non-word boundaries like a
    * byte-pair pre-tokenizer would (contiguous letters / digits /
    * punctuation runs each count as one pre-token). */
  def preTokenCount(text: Column): Column =
    size(filter(split(text, "(?<=[a-zA-Z])(?=[^a-zA-Z ])|(?<=[^a-zA-Z ])(?=[a-zA-Z])| +"),
      t => length(t) > 0))

  private val stopwords = Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "on")

  /** Fraction of tokens that are stopwords — a standard quality signal. */
  def stopwordRatio(text: Column): Column = {
    val ws = tokens(text)
    size(filter(ws, w => w.isin(stopwords.map(lit): _*))) / size(ws)
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))).cast("double") /
      length(text)

  /** Mean token length. */
  def meanTokenLen(text: Column): Column =
    aggregate(transform(tokens(text), w => length(w).cast("long")),
      lit(0L), (acc, x) => acc + x).cast("double") / size(tokens(text))

  /** Composite quality score in [0,1]: length, stopword presence and low
    * punctuation each contribute — cheap heuristic in the spirit of
    * C4/Gopher quality filtering rules. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500d, lit(1d))
    val stopScore = least(stopwordRatio(text) * 5d, lit(1d))
    val punctScore = greatest(lit(0d), lit(1d) - punctRatio(text) * 10d)
    (lenScore + stopScore + punctScore) / 3d
  }

  /** Bag-of-words canonical fingerprint: md5 of the sorted token list.
    * Detects reordered-but-identical-content documents. */
  def bagOfWordsFingerprint(text: Column): Column =
    md5(array_join(sort_array(tokens(text)), " "))

  /** Character n-grams of a string (the shingle primitive for MinHash /
    * Jaccard dedup). Pure Column algebra: transform over a 1..len-n+1
    * sequence (empty when the text is shorter than n — `sequence` would
    * otherwise count DOWN and explode). */
  def charNgrams(text: Column, n: Int): Column = {
    val upper = length(text) - (n - 1)
    when(upper >= 1,
      transform(sequence(lit(1), upper), i => text.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
  }

  /** Word n-grams (shingles) via sliding windows over the token array.
    *
    * PERF: pass a PRE-PROJECTED token-array column (not `tokens(text)`
    * inline) whenever the input is large — an expression argument is
    * re-evaluated inside the per-element `transform` lambda (Spark
    * doesn't hoist loop-invariant subexpressions out of lambdas), which
    * turns shingling into O(n · tokenize) = O(n²) per document. With a
    * column attribute the token array is computed once per row. */
  def wordShinglesFromTokens(ws: Column, n: Int): Column = {
    val upper = size(ws) - (n - 1)
    when(upper >= 1,
      transform(sequence(lit(1), upper), i => array_join(slice(ws, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** [[wordShinglesFromTokens]] over whitespace tokens — fine for small
    * inputs / oracle slices; see the PERF note above for corpus scans. */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesFromTokens(tokens(text), n)

  /** Length of the longest run of equal values in `arr` after sorting —
    * i.e. the highest multiplicity of any element. O(n log n) per row
    * (sort + two linear boundary scans), no shuffle, no O(n²)
    * count-per-distinct blowup on long documents: run starts are
    * positions where a[i] != a[i-1], run ends where a[i] != a[i+1], and
    * run lengths are their pairwise differences. `try_element_at` keeps
    * the neighbor probes total under ANSI mode. */
  def maxSortedRunLength(arr: Column): Column =
    maxRunLengthPreSorted(sort_array(arr))

  /** [[maxSortedRunLength]] for an input that is ALREADY sorted — pass a
    * pre-projected sorted column so the sort isn't re-inlined at every
    * reference site (CollapseProject keeps a multiply-referenced
    * non-trivial alias materialized). */
  def maxRunLengthPreSorted(a: Column): Column = {
    val m = size(a)
    val idx = when(m >= 1, sequence(lit(1), m))
      .otherwise(array().cast("array<int>"))
    val starts = filter(idx, i =>
      (i === 1) || (try_element_at(a, i) =!= try_element_at(a, i - 1)))
    val ends = filter(idx, i =>
      (i === m) || (try_element_at(a, i) =!= try_element_at(a, i + 1)))
    when(m === 0, lit(0)).otherwise(
      array_max(zip_with(ends, starts, (e, st) => e - st + 1)))
  }

  /** Very small n-gram language-ID heuristic: scores text against
    * per-language marker token sets and returns the argmax language.
    * (The testdata generator plants language marker words; in real use
    * the marker lists would be trained character n-gram profiles.) */
  def langId(text: Column): Column = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "with"),
      "es" -> Seq("el", "la", "los", "de", "con"),
      "de" -> Seq("der", "die", "das", "und", "mit"),
      "fr" -> Seq("le", "les", "des", "et", "avec"),
      "zh" -> Seq("de5", "shi4", "zai4"))
    val ws = tokens(text)
    val scored = markers.map { case (lang, ms) =>
      struct(size(filter(ws, w => w.isin(ms.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    // argmax by (score, lang) — deterministic tie-break on language code
    greatest(scored: _*).getField("lang")
  }

  /** One greedy left-to-right BPE merge pass applied INSIDE a symbol
    * array: every non-overlapping adjacent (a, b) occurrence becomes
    * the single symbol "a b". Map-only — no explode/regroup round
    * trip, no shuffle at any corpus size. Greedy non-overlap: once a
    * pair merges, the merged symbol is the new last element and cannot
    * re-match `a`, so "x x x" with pair (x,x) yields ["x x", "x"],
    * the standard BPE scan semantics. Backed by the codegen'd
    * [[BpeMergePass]] kernel; [[bpeMergeFold]] is the declarative
    * reference it is differential-tested against. */
  def bpeMerge(w: Column, a: String, b: String): Column =
    BpeMerge.merge(w, a, b)

  /** Reference formulation of [[bpeMerge]] as a higher-order
    * `aggregate()` fold — same semantics, but Spark evaluates the
    * lambda interpreted with a per-step array copy (O(n²) per row) and
    * drops out of whole-stage codegen, which is why the expression
    * kernel exists. Kept for differential testing. */
  def bpeMergeFold(w: Column, a: String, b: String): Column =
    aggregate(w, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(s"$a $b"))))
        .otherwise(concat(acc, array(x))))
}
