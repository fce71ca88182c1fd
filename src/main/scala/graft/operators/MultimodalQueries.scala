package graft.operators

import org.apache.spark.sql.functions._

import graft.functions.Multimodal

/** Multimodal plumbing surface (north_star): binary payload columns with
  * typed metadata; decode is a deterministic stub (FakeCodec) so the
  * metadata math IS oracle-checkable even though a real codec wouldn't be.
  */
object MultimodalQueries {

  def queries: Seq[Q] = Seq(
    Q("mm_decode_meta",
      (s, d) => Multimodal.decodeMeta(Multimodal.mediaTable(s, d)).toDF()
        .select(col("media_id"), col("media_type"), col("n_bytes"),
          col("width"), col("height"), col("n_frames")),
      Some("""SELECT doc_id AS media_id,
             |CASE WHEN doc_id % 3 = 0 THEN 'image'
             |     WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
             |CAST(strlen(text) AS BIGINT) AS n_bytes,
             |CAST(16 + strlen(text) % 640 AS INTEGER) AS width,
             |CAST(16 + (strlen(text) // 7) % 480 AS INTEGER) AS height,
             |CAST(1 + strlen(text) % 24 AS INTEGER) AS n_frames
             |FROM documents""".stripMargin),
      "binary payload + typed metadata; partition-batched stub decode"),

    Q("mm_frame_sample",
      (s, d) => Multimodal.sampleFrames(
        Multimodal.decodeMeta(Multimodal.mediaTable(s, d)), everyK = 4),
      Some("""SELECT doc_id AS media_id,
             |CAST(unnest(range(0, 1 + strlen(text) % 24, 4)) AS INTEGER) AS frame_idx
             |FROM documents WHERE doc_id % 3 = 2""".stripMargin),
      "1→N frame-sampling stage (explode over sampled frame indices)"),

    Q("mm_size_stats",
      (s, d) => Multimodal.mediaTable(s, d)
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).as("total_bytes"),
          max(col("n_bytes")).as("max_bytes")),
      Some("""SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
             |     WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
             |count(*) AS n,
             |CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
             |CAST(max(strlen(text)) AS BIGINT) AS max_bytes
             |FROM documents GROUP BY 1""".stripMargin),
      "media-type size profile (blob column pruned from the scan)"))
}
