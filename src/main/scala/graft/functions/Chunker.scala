package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunker — the table-valued (1→N) operator of a training
  * pipeline (SURVEY §2.10): overlapping token windows of `size` with
  * stride `stride`, as pure Column algebra + explode. Linear scan,
  * output ∝ tokens/stride. */
object Chunker {

  /** Array of chunk structs for one document's token array. */
  def chunkArray(tokens: Column, size: Int, stride: Int): Column = {
    val n = sizeOf(tokens)
    // chunk starts: 1, 1+stride, ... while start <= max(n - size + 1, 1)
    val lastStart = greatest(n - (size - 1), lit(1))
    when(n > 0,
      transform(sequence(lit(1), lastStart, lit(stride)), start =>
        struct(
          start.as("start_token"),
          array_join(slice(tokens, start, lit(size)), " ").as("chunk_text"),
          least(lit(size), n - start + 1).as("n_tokens"))))
      .otherwise(array().cast(
        "array<struct<start_token:int,chunk_text:string,n_tokens:int>>"))
  }

  /** Explode a documents frame into (doc_id, chunk_id, start_token,
    * chunk_text, n_tokens). */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            size: Int, stride: Int): DataFrame =
    docs
      .select(col(idCol),
        posexplode(chunkArray(split(col(textCol), " "), size, stride))
          .as(Seq("chunk_id", "c")))
      .select(col(idCol), col("chunk_id").cast("int").as("chunk_id"),
        col("c.start_token").as("start_token"),
        col("c.chunk_text").as("chunk_text"),
        col("c.n_tokens").as("n_tokens"))

  /** Content-defined chunking: a boundary falls after token `i`
    * wherever the hash of the trailing `window`-token run starts with
    * `nibbles` zero hex digits (boundary probability 16^-nibbles →
    * expected chunk length 16^nibbles tokens). Because each boundary
    * test looks at only the trailing window, an edit perturbs chunk
    * boundaries only until the next surviving boundary — all later
    * chunk hashes are IDENTICAL across revisions, which is what makes
    * chunk-grain dedup work on near-identical documents (fixed-stride
    * windows shift every downstream chunk instead).
    *
    * ZERO-exchange: boundaries, spans, and hashes are array algebra
    * inside each row; only the final explode generates output rows
    * (`PlanAuditSpec` pins the no-Exchange shape on the catalog form).
    * md5 is used as the hash so oracles replay in DuckDB; an
    * in-engine-only deployment would use xxhash64.
    *
    * Output: (idCol, chunk_id, start_token, n_tokens, chunk_hash). */
  def contentDefinedChunks(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 4, nibbles: Int = 1): DataFrame = {
    require(window >= 1 && nibbles >= 1 && nibbles <= 8)
    val zeros = "0" * nibbles
    docs
      .select(col(idCol), split(col(textCol), " ").as("w"))
      .select(col(idCol), col("w"), expr(
        s"filter(sequence(1, size(w)), i -> i >= $window AND " +
          s"substring(md5(concat_ws(' ', slice(w, i - ${window - 1}, " +
          s"$window))), 1, $nibbles) = '$zeros')").as("bnd"))
      .select(col(idCol), col("w"), expr(
        "concat(array(0), bnd, IF(size(bnd) > 0 AND " +
          "element_at(bnd, -1) = size(w), array(), array(size(w))))")
        .as("bounds"))
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(bounds) - 1), k -> named_struct(" +
          "'chunk_id', CAST(k - 1 AS BIGINT), " +
          "'start_token', bounds[k-1] + 1, " +
          "'n_tokens', CAST(bounds[k] - bounds[k-1] AS BIGINT), " +
          "'chunk_hash', md5(concat_ws(' ', " +
          "slice(w, bounds[k-1] + 1, bounds[k] - bounds[k-1])))))"))
        .as("c"))
      .select(col(idCol), col("c.chunk_id"), col("c.start_token"),
        col("c.n_tokens"), col("c.chunk_hash"))
  }

  private def sizeOf(tokens: Column): Column = size(tokens)
}
