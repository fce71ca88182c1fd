package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, with decode / feature-extract /
  * frame-sample implemented as batched partition-local transforms.
  *
  * The codec step is REAL: [[MediaCodecs]] encodes and parses three
  * public pure-JVM formats (24-bit BMP with row padding, RIFF/WAV
  * 8-bit PCM, YUV4MPEG2 Cmono), so [[decodeMeta]] walks genuine
  * headers, strides and frame markers. The Spark-side shape is the
  * production one: schema, encoders, partition-batched processing
  * (`mapPartitions` over a typed Dataset is the Scala analog of
  * `mapInPandas`: one iterator per partition, amortized setup, no
  * per-row codec init), and metadata pushdown-friendly layout
  * (metadata in top-level columns so scans prune the heavy blob).
  */
object Multimodal {

  case class MediaRecord(media_id: Long, payload: Array[Byte],
                         media_type: String, n_bytes: Long)
  /** Real decoded geometry + exact integer sample statistics.
    * `width` is the sample rate for audio (the format's own geometry
    * field); `n_samples`/`sample_sum` count the raw sample stream
    * (pixel channel bytes / PCM samples / luma bytes) — exact, so an
    * encode→decode round trip is hash-checkable end to end. */
  case class DecodedMeta(media_id: Long, media_type: String, n_bytes: Long,
                         width: Int, height: Int, n_frames: Int,
                         n_samples: Long, sample_sum: Long)

  /** Build a media table from `documents` (text bytes as stand-in
    * payloads) — exercises the binary-column layout end to end for
    * content-hash dedup / size profiling, where payloads are opaque. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        (when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video")).as("media_type"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"))

  /** Deterministic per-id generation parameters (sample i of a media
    * item is byte `(a + i) & 0xFF`, a = id mod 256) — closed-form
    * verifiable: the DuckDB oracle recomputes each item's exact sample
    * sum arithmetically, so any header/stride/offset bug in EITHER the
    * encoder or the parser shifts the sum and fails the hash. */
  private def samples(id: Long, n: Int): Array[Byte] = {
    val a = (id % 256).toInt
    Array.tabulate(n)(i => ((a + i) & 0xff).toByte)
  }

  /** Media table with REAL encoded payloads: one BMP / WAV / Y4M blob
    * per document id, geometry derived from the id. The generation runs
    * partition-local (no shuffle); payload bytes are built once. */
  def encodedMediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (mt, payload) = (id % 3) match {
          case 0 =>
            val w = (8 + id % 32).toInt
            val h = (8 + (id / 7) % 24).toInt
            "image" -> MediaCodecs.encodeBmp(w, h, samples(id, w * h * 3))
          case 1 =>
            val rate = (8000 + (id % 8) * 1000).toInt
            val ns = (64 + id % 1000).toInt
            "audio" -> MediaCodecs.encodeWav(rate, samples(id, ns))
          case _ =>
            val w = (8 + id % 16).toInt
            val h = (8 + (id / 5) % 12).toInt
            val f = (1 + id % 6).toInt
            "video" -> MediaCodecs.encodeY4m(w, h, f, samples(id, w * h * f))
        }
        MediaRecord(id, payload, mt, payload.length.toLong)
      })
  }

  /** Batched REAL decode: magic-sniffing dispatch into the format
    * parsers (the label column is not trusted), metadata out, blob
    * dropped — downstream never reshuffles the payload bytes. */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[DecodedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition codec setup would happen here (amortized)
      it.map { r =>
        val d = sniffDecode(r.payload)
        DecodedMeta(r.media_id, r.media_type, r.n_bytes,
          d.width, d.height, d.nFrames, d.nSamples, d.sampleSum)
      }
    }
  }

  /** Dispatch on the container magic, as a real ingest pipeline must
    * (file extensions and type tags lie). */
  def sniffDecode(b: Array[Byte]): MediaCodecs.Decoded =
    if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') MediaCodecs.decodeBmp(b)
    else if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F') MediaCodecs.decodeWav(b)
    else if (b.length >= 9 &&
      new String(b, 0, 9, "US-ASCII") == "YUV4MPEG2") MediaCodecs.decodeY4m(b)
    else throw new IllegalArgumentException("unknown media container")

  /** Frame sampling plan for videos: every k-th frame index of the
    * REAL parsed frame count — the explode-shaped (1→N) stage of a
    * video pipeline. */
  def sampleFrames(meta: Dataset[DecodedMeta], everyK: Int): DataFrame =
    meta.toDF()
      .filter(col("media_type") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))).as("frame_idx"))
}
