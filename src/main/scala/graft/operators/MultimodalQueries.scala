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
      "media-type size profile (blob column pruned from the scan)"),

    // Content-hash dedup over the BINARY payload column — the
    // image/video dedup pattern of a training-data pipeline (identical
    // media shipped under different ids/types collapse on their byte
    // hash; one shuffle keyed by the hash, blob never reshuffled).
    // Planted copies (ids offset past max, derived from the corpus so
    // they can't collide at any SF) provide the deterministic dup
    // ground truth, since testdata documents are all unique.
    Q("mm_payload_dedup",
      (s, d) => {
        val base = Multimodal.mediaTable(s, d)
        val off = (base.agg(coalesce(max(col("media_id")), lit(0L)))
          .head().getLong(0) / 1000 + 2) * 1000
        val planted = base.filter(col("media_id").isin(1L, 2L))
          .select((col("media_id") + lit(off)).as("media_id"),
            col("payload"), col("media_type"), col("n_bytes"))
        base.unionByName(planted)
          .groupBy(md5(col("payload")).as("payload_md5"))
          .agg(count(lit(1)).as("n_copies"),
            min(col("media_id")).as("first_id"),
            max(col("media_id")).as("last_id"),
            array_join(sort_array(collect_set(col("media_type"))), ",")
              .as("types"))
          .filter(col("n_copies") > 1)
      },
      Some("""WITH m AS (
             |  SELECT doc_id AS media_id, text,
             |    CASE WHEN doc_id % 3 = 0 THEN 'image'
             |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
             |      AS media_type
             |  FROM documents
             |  UNION ALL
             |  SELECT doc_id +
             |      ((SELECT max(doc_id) FROM documents) // 1000 + 2) * 1000,
             |    text,
             |    CASE WHEN doc_id % 3 = 0 THEN 'image'
             |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
             |  FROM documents WHERE doc_id IN (1, 2))
             |SELECT md5(text) AS payload_md5,
             |  CAST(count(*) AS BIGINT) AS n_copies,
             |  min(media_id) AS first_id, max(media_id) AS last_id,
             |  array_to_string(list_sort(list_distinct(list(media_type))), ',')
             |    AS types
             |FROM m GROUP BY 1 HAVING count(*) > 1""".stripMargin),
      "binary-payload content-hash dedup (planted-duplicate ground " +
        "truth); blob bytes hash map-side, never reshuffle"))
}
