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

  private def sizeOf(tokens: Column): Column = size(tokens)
}
