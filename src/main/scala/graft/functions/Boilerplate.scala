package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-frequency boilerplate removal: strip paragraphs repeated
  * across many documents (navigation chrome, cookie banners, license
  * headers) while leaving each document's own prose intact — the
  * curation step C4/Gopher-style pipelines run between raw ingest and
  * quality scoring (SURVEY §2.10 north_star; no reference analog — the
  * reference replicates rows, it never edits document content).
  *
  * Scale shape (100 TB):
  *   - Detection shuffles ONLY (paragraph-hash, doc) pairs — each
  *     paragraph projected to its 8-byte xxhash64 before the exchange,
  *     never text; the distinct-doc count aggregates with a map-side
  *     partial.
  *   - The boilerplate set is small BY CONSTRUCTION (only paragraphs
  *     crossing a many-documents frequency threshold survive), so it
  *     collects to the driver — the same O(small) contract as IVF
  *     centroids / PQ codebooks — and re-enters the plan as a broadcast
  *     array literal. `maxBoiler` makes the contract explicit: the take
  *     is bounded, and a threshold so low it would flood the driver
  *     fails loudly instead.
  *   - Cleanup is then MAP-ONLY: each document filters its own
  *     paragraphs against the literal set inside one codegen'd
  *     higher-order `filter`. The corpus text itself is never shuffled
  *     at any point in either pass.
  */
object Boilerplate {

  /** Paragraphs of `text` under the literal separator `sep`. */
  def paragraphs(text: Column, sep: String): Column =
    split(text, Pattern.quote(sep))

  /** Paragraph hashes occurring in at least `minDocs` DISTINCT
    * documents, with their document counts: (para_hash, n_docs).
    * A document repeating its own paragraph does not promote it. */
  def boilerplateHashes(docs: DataFrame, textCol: String, idCol: String,
                        minDocs: Int, sep: String = "\n\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2 (got $minDocs): at 1 " +
      "every paragraph in the corpus is boilerplate")
    docs
      .select(col(idCol).as("_doc"),
        explode(paragraphs(col(textCol), sep)).as("_para"))
      .select(col("_doc"), xxhash64(col("_para")).as("para_hash"))
      .groupBy("para_hash")
      .agg(countDistinct("_doc").as("n_docs"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Remove every paragraph that appears in `minDocs`+ distinct
    * documents from every document. Returns `docs` with `textCol`
    * rewritten (surviving paragraphs re-joined by `sep`, original order
    * kept) plus `n_removed` = paragraphs stripped from that document. */
  def strip(docs: DataFrame, textCol: String, idCol: String, minDocs: Int,
            sep: String = "\n\n", maxBoiler: Int = 100000): DataFrame = {
    val found = boilerplateHashes(docs, textCol, idCol, minDocs, sep)
      .select("para_hash").take(maxBoiler + 1)
    require(found.length <= maxBoiler,
      s"boilerplate threshold minDocs=$minDocs matched more than " +
        s"$maxBoiler paragraphs — not a broadcastable boilerplate set; " +
        "raise minDocs or maxBoiler")
    val boiler = typedLit(found.map(_.getLong(0)).toSeq)
    val paras = paragraphs(col(textCol), sep)
    val kept = filter(paras, p => !array_contains(boiler, xxhash64(p)))
    docs
      .withColumn("_kept", kept)
      .withColumn("n_removed", (size(paras) - size(col("_kept"))).cast("long"))
      .withColumn(textCol, array_join(col("_kept"), sep))
      .drop("_kept")
  }
}
