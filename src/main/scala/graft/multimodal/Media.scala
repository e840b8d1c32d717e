package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline (driver north star):
  * image/audio/video as opaque BINARY columns + typed metadata, with
  * decode / feature-extract / resize / frame-sample as partition-mapped
  * transforms.
  *
  * Real codecs where a stock JRE has one: images via [[ImageCodec]]
  * (javax.imageio), audio via [[AudioCodec]] (javax.sound WAV/PCM),
  * multi-frame video via [[VideoCodec]] (ImageIO's GIF reader). The
  * generic `features`/`resize` leaves of [[MediaCodec]] remain a
  * clearly-marked deterministic STUB (pseudo-features from payload
  * bytes) for media kinds with no JRE decoder; real siblings prove the
  * seams. Everything around the codecs is load-bearing at 100 TB:
  *  - schema: media rows are (id, kind, payload, meta struct) — metadata
  *    travels as columns so filters on width/duration prune BEFORE any
  *    payload byte moves;
  *  - partition shape: mapPartitions with iterator-to-iterator transforms
  *    — per-partition (not per-row) codec init, constant memory, no
  *    collect;
  *  - batch contract: features come back as fixed-width Array[Float]
  *    columns ready for the similarity operators (graft.queries.Llm).
  */
object Media {

  case class MediaMeta(width: Int, height: Int, sampleRate: Int, durationMs: Long)
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, dim: Int,
                           features: Array[Float])
  case class FrameSample(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB codec — stands in for the image/audio libraries absent from
    * this container. Deterministic in the payload bytes so tests and
    * retries are stable. Swap the body for a real codec (e.g. javax
    * ImageIO / JavaCV) without touching any pipeline shape. */
  object MediaCodec {
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      // deterministic pseudo-features: rolling polynomial hash per lane
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        val lane = i % dim
        out(lane) = out(lane) * 31.0f + (payload(i) & 0xff)
        i += 1
      }
      var j = 0
      while (j < dim) { out(j) = (out(j) % 1000.0f) / 1000.0f; j += 1 }
      out
    }

    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      // stub: real impl decodes + rescales; here, size-preserving sample
      val target = math.max(1, math.min(payload.length, w * h))
      val out = new Array[Byte](target)
      var i = 0
      while (i < target) { out(i) = payload(i * payload.length / target); i += 1 }
      out
    }
  }

  /** Feature extraction: one codec "session" per partition, streamed
    * iterator-to-iterator (never materializes a partition in memory). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens HERE (real codecs are expensive to open)
      rows.map(r => MediaFeatures(r.media_id, r.kind, dim,
        MediaCodec.features(r.payload, dim)))
    }
  }

  /** Image resize, same partition-mapped shape. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image")
      .mapPartitions(rows => rows.map(r =>
        (r.media_id, MediaCodec.resize(r.payload, w, h))))
      .toDF("media_id", "resized")
  }

  /** Video frame sampling: one input row → up to n output rows (flatMap
    * — the explode analog for binary media), REAL decode via
    * [[VideoCodec]] (ImageIO multi-frame reader): actual frame count,
    * evenly-strided original frame indices, PNG-encoded frame bytes;
    * undecodable payloads yield zero rows. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[FrameSample] =
    VideoCodec.sampleFrames(media, n)

  /** Metadata-pruned scan: predicate on the meta struct only — Catalyst
    * pushes it to the parquet footer, payload bytes for filtered-out rows
    * are never read (column pruning + predicate pushdown). */
  def selectLargeImages(media: DataFrame, minPixels: Long): DataFrame =
    media.filter(col("kind") === "image" &&
      col("meta.width").cast("long") * col("meta.height") >= minPixels)
}
