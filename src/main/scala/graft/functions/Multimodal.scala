package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, with decode / feature-extract / resize /
  * frame-sample implemented as batched partition-local transforms.
  *
  * The actual codec step is STUBBED (no image/audio libs in this
  * container) behind [[FakeCodec]] — a deterministic stand-in — but the
  * Spark-side plumbing is real: schema, encoders, partition-batched
  * processing (`mapPartitions` over a typed Dataset is the Scala analog
  * of `mapInPandas`: one iterator per partition, amortized setup, no
  * per-row codec init), and metadata pushdown-friendly layout (metadata
  * in top-level columns so scans prune the heavy blob column).
  */
object Multimodal {

  case class MediaRecord(media_id: Long, payload: Array[Byte],
                         media_type: String, n_bytes: Long)
  case class DecodedMeta(media_id: Long, media_type: String, n_bytes: Long,
                         width: Int, height: Int, n_frames: Int,
                         mean_byte: Double)

  /** STUB codec: deterministic pseudo-decode derived from payload bytes.
    * Replace `decode` with a real codec (e.g. javax.imageio / ffmpeg
    * bindings) in production — signature and batching stay identical. */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      // ??? real codec goes here; deterministic fake dimensions:
      val width = 16 + (n % 640)
      val height = 16 + ((n / 7) % 480)
      val frames = 1 + (n % 24)
      (width, height, frames)
    }
  }

  /** Build a media table from `documents` (text bytes as stand-in
    * payloads) — exercises the binary-column layout end to end. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        (when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video")).as("media_type"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"))

  /** Batched decode: one codec context per partition, metadata out,
    * blob dropped (column pruning at its best — downstream never
    * reshuffles the payload bytes). */
  def decodeMeta(media: DataFrame): Dataset[DecodedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition codec setup would happen here (amortized)
      it.map { r =>
        val (w, h, f) = FakeCodec.decode(r.payload)
        val mean =
          if (r.payload.isEmpty) 0d
          else r.payload.map(b => (b & 0xff).toLong).sum.toDouble / r.payload.length
        DecodedMeta(r.media_id, r.media_type, r.n_bytes, w, h, f, mean)
      }
    }
  }

  /** Frame sampling plan for videos: every k-th frame index — shows the
    * explode-shaped (1→N) stage of a video pipeline without a codec. */
  def sampleFrames(meta: Dataset[DecodedMeta], everyK: Int): DataFrame =
    meta.toDF()
      .filter(col("media_type") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))).as("frame_idx"))
}
