package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Dataset}

/** REAL multi-frame (video) codec over the JDK's built-in `javax.imageio`
  * GIF reader — animated GIF is the one multi-frame container a stock
  * JRE decodes, so it stands in for video the way WAV/PCM stands in for
  * audio in [[AudioCodec]]: the container is modest, but every pipeline
  * seam it exercises (frame enumeration, stride sampling, one-row→
  * many-rows flatMap, per-frame features through the [[ImageCodec]]
  * path, corrupt→null leniency) is exactly what a JavaCV/FFmpeg-backed
  * production codec needs.
  *
  * Frames are composited against the previous frame before feature
  * extraction: GIF encoders commonly store deltas (changed regions
  * only), so the raw sub-image of frame k is NOT the displayed picture.
  * Compositing onto the running canvas yields the actual frame content,
  * which is what per-frame features must describe.
  */
object VideoCodec {

  /** All displayed frames of a multi-frame payload (composited), or None
    * if the bytes aren't a decodable multi-frame image stream. */
  def decodeFrames(payload: Array[Byte]): Option[IndexedSeq[BufferedImage]] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (in == null || !readers.hasNext) None
      else {
        val reader = readers.next()
        reader.setInput(in)
        try {
          val n = reader.getNumImages(true) // force a full scan
          if (n <= 0) None
          else {
            var canvas: BufferedImage = null
            val frames = (0 until n).map { i =>
              val raw = reader.read(i)
              if (canvas == null)
                canvas = new BufferedImage(raw.getWidth, raw.getHeight,
                  BufferedImage.TYPE_INT_RGB)
              val g = canvas.createGraphics()
              try g.drawImage(raw, 0, 0, null) finally g.dispose()
              val snap = new BufferedImage(canvas.getWidth, canvas.getHeight,
                BufferedImage.TYPE_INT_RGB)
              val g2 = snap.createGraphics()
              try g2.drawImage(canvas, 0, 0, null) finally g2.dispose()
              snap
            }
            Some(frames)
          }
        } finally reader.dispose()
      }
    } catch { case _: Exception => None }
    finally if (in != null) in.close()
  }

  /** Evenly-strided sample of n indices from [0, total): index
    * k·total/n — deterministic, first frame always included, never
    * repeats an index when n ≤ total. */
  def strideIndices(total: Int, n: Int): Seq[Int] =
    if (total <= 0 || n <= 0) Seq.empty
    else if (total <= n) 0 until total
    else (0 until n).map(k => k * total / n)

  /** Real [[Media.sampleFrames]]: decode the multi-frame payload,
    * stride-sample n frames, re-encode each as PNG bytes. One input row
    * → up to n output rows (flatMap — the explode analog for binary
    * media); undecodable payloads yield zero rows, the lenient-path
    * analogue of a filter. `frame_idx` is the ORIGINAL frame index, so
    * downstream can recover the time position within the clip. */
  def sampleFrames(media: Dataset[Media.MediaRow], n: Int)
      : Dataset[Media.FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .flatMap { r =>
        decodeFrames(r.payload) match {
          case Some(frames) => strideIndices(frames.size, n).map { i =>
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(frames(i), "png", bos)
            Media.FrameSample(r.media_id, i, bos.toByteArray)
          }
          case None => Seq.empty
        }
      }
  }

  /** Per-frame features through the [[ImageCodec]] grid path — same
    * mapPartitions/flatMap shape as [[ImageCodec.extractImageFeatures]],
    * one row per sampled frame. Undecodable payloads surface as ONE row
    * with decoded=false and a null vector (corrupt media is data, not a
    * task abort). */
  def extractFrameFeatures(media: Dataset[Media.MediaRow], n: Int,
                           gx: Int = 4, gy: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .mapPartitions { rows =>
        // per-partition init point (ImageIO registry scan / real codec open)
        rows.flatMap { r =>
          decodeFrames(r.payload) match {
            case Some(frames) => strideIndices(frames.size, n).map { i =>
              (r.media_id, i, true, frames.size,
                ImageCodec.gridFeatures(frames(i), gx, gy))
            }
            case None =>
              Seq((r.media_id, -1, false, 0, null: Array[Float]))
          }
        }
      }
      .toDF("media_id", "frame_idx", "decoded", "n_frames", "features")
  }
}
