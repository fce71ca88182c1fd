package graft.operators

import org.apache.spark.sql.functions._

import graft.core.Tables.load
import graft.functions.DedupFunctions._
import graft.functions.TextFunctions._

/** Deduplication surface over `documents` (north_star): exact,
  * MinHash+LSH, SimHash, n-gram Jaccard. */
object DedupQueries {

  def queries: Seq[Q] = Seq(
    Q("dedup_exact_groups",
      (s, d) => exactDupGroups(load(s, d, "documents"), "doc_id", "text"),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
             |count(*) AS n_copies
             |FROM documents GROUP BY 1""".stripMargin),
      "exact dedup = hash-groupBy; shuffle keyed by content hash"),

    // Small-n brute-force Jaccard (oracle-checkable); the LSH variant
    // below is the scale path.
    Q("dedup_jaccard_pairs",
      (s, d) => {
        val docs = load(s, d, "documents").filter(col("doc_id") < 40)
          .select(col("doc_id"), array_distinct(wordShingles(col("text"), 3)).as("sh"))
        docs.as("l").join(docs.as("r"), col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
            (size(array_intersect(col("l.sh"), col("r.sh"))).cast("double") /
              size(array_union(col("l.sh"), col("r.sh")))).as("jaccard"))
          .filter(col("jaccard") > 0.05)
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
             |    i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS s
             |  FROM documents WHERE doc_id < 40)
             |SELECT l.doc_id AS a, r.doc_id AS b,
             |  CAST(len(list_filter(l.s, x -> list_contains(r.s, x))) AS DOUBLE)
             |    / len(list_distinct(list_concat(l.s, r.s))) AS jaccard
             |FROM sh l, sh r
             |WHERE l.doc_id < r.doc_id
             |  AND CAST(len(list_filter(l.s, x -> list_contains(r.s, x))) AS DOUBLE)
             |    / len(list_distinct(list_concat(l.s, r.s))) > 0.05""".stripMargin),
      "n-gram Jaccard similarity, brute-force oracle-checkable slice"),

    // MinHash/SimHash signatures use Spark's xxhash64 — not replicable
    // in DuckDB; rows-only checks.
    Q("dedup_minhash_lsh_pairs",
      (s, d) => {
        val docs = load(s, d, "documents")
          .select(col("doc_id"), array_distinct(wordShingles(col("text"), 3)).as("sh"))
          .filter(size(col("sh")) > 0)
        lshCandidatePairs(docs, "doc_id", "sh")
      },
      None,
      "MinHash+LSH near-dup candidates: shingle→minhash→band→bucket-join"),

    Q("dedup_simhash_signatures",
      (s, d) => simhashSignatures(
        load(s, d, "documents")
          .select(col("doc_id"), array_distinct(wordShingles(col("text"), 3)).as("sh")),
        "doc_id", "sh").withColumnRenamed("sig", "signature"),
      None,
      "64-bit SimHash signatures, per-row single-pass fold (no shuffle)"),

    Q("dedup_simhash_near_pairs",
      (s, d) => {
        // Block on the top 16 bits so candidate generation is an
        // equi-join, then verify hamming distance on candidates — the
        // standard scale pattern (never all-pairs).
        val sigs = simhashSignatures(
          load(s, d, "documents")
            .select(col("doc_id"), array_distinct(wordShingles(col("text"), 3)).as("sh")),
          "doc_id", "sh")
          .withColumn("block", shiftrightunsigned(col("sig"), 48))
          .persist() // both self-join sides reuse one signature pass
        sigs.as("l").join(sigs.as("r"),
            col("l.block") === col("r.block") && col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
            hamming64(col("l.sig"), col("r.sig")).as("hamming"))
          .filter(col("hamming") <= 12)
      },
      None,
      "SimHash near-dup pairs via 16-bit blocking + hamming verify"))
}
