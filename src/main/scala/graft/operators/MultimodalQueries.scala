package graft.operators

import org.apache.spark.sql.functions._

import graft.functions.Multimodal

/** Multimodal surface (north_star): binary payload columns with typed
  * metadata; the codec is REAL ([[graft.functions.MediaCodecs]] —
  * 24-bit BMP, RIFF/WAV PCM, YUV4MPEG2), and the oracle is closed-form:
  * payload samples are `(id + i) mod 256`, so every item's exact sample
  * sum is recomputable arithmetically in DuckDB — the hash compare then
  * verifies the whole encode→parse round trip (header offsets, BMP row
  * stride/padding, RIFF chunk walk, Y4M frame markers) byte-for-byte.
  */
object MultimodalQueries {

  def queries: Seq[Q] = Seq(
    Q("mm_decode_meta",
      (s, d) => Multimodal.decodeMeta(Multimodal.encodedMediaTable(s, d)).toDF(),
      Some("""WITH g AS (
             |  SELECT doc_id AS media_id, doc_id % 256 AS a, doc_id % 3 AS m,
             |    8 + doc_id % 32 AS iw, 8 + (doc_id // 7) % 24 AS ih,
             |    8000 + (doc_id % 8) * 1000 AS rate, 64 + doc_id % 1000 AS ns,
             |    8 + doc_id % 16 AS vw, 8 + (doc_id // 5) % 12 AS vh,
             |    1 + doc_id % 6 AS vf
             |  FROM documents),
             |p AS (
             |  SELECT media_id, a,
             |    CASE m WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |           ELSE 'video' END AS media_type,
             |    CASE m WHEN 0 THEN 54 + ((3 * iw + 3) // 4 * 4) * ih
             |           WHEN 1 THEN 44 + ns
             |           ELSE 34 + strlen(CAST(vw AS VARCHAR))
             |                + strlen(CAST(vh AS VARCHAR))
             |                + vf * (6 + vw * vh) END AS n_bytes,
             |    CASE m WHEN 0 THEN iw WHEN 1 THEN rate ELSE vw END AS width,
             |    CASE m WHEN 0 THEN ih WHEN 1 THEN 1 ELSE vh END AS height,
             |    CASE m WHEN 0 THEN 1 WHEN 1 THEN 1 ELSE vf END AS n_frames,
             |    CASE m WHEN 0 THEN iw * ih * 3 WHEN 1 THEN ns
             |           ELSE vw * vh * vf END AS n
             |  FROM g)
             |SELECT media_id, media_type, CAST(n_bytes AS BIGINT) AS n_bytes,
             |  CAST(width AS INTEGER) AS width,
             |  CAST(height AS INTEGER) AS height,
             |  CAST(n_frames AS INTEGER) AS n_frames,
             |  CAST(n AS BIGINT) AS n_samples,
             |  CAST(32640 * ((a + n) // 256)
             |       + ((a + n) % 256) * ((a + n) % 256 - 1) // 2
             |       - 32640 * (a // 256)
             |       - (a % 256) * (a % 256 - 1) // 2 AS BIGINT) AS sample_sum
             |FROM p""".stripMargin),
      "REAL codec round trip: BMP/WAV/Y4M encode -> magic-sniffed " +
        "header parse; closed-form oracle checks every stride/offset"),

    Q("mm_frame_sample",
      (s, d) => Multimodal.sampleFrames(
        Multimodal.decodeMeta(Multimodal.encodedMediaTable(s, d)), everyK = 4),
      Some("""SELECT doc_id AS media_id,
             |CAST(unnest(range(0, 1 + doc_id % 6, 4)) AS INTEGER) AS frame_idx
             |FROM documents WHERE doc_id % 3 = 2""".stripMargin),
      "1→N frame-sampling stage over the PARSED Y4M frame count"),

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
