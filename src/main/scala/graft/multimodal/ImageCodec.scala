package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Dataset}

/** REAL image codec over the JDK's built-in `javax.imageio` (PNG/BMP/JPEG
  * readers ship with Java 17 — no external libraries). This is the proof
  * that [[Media]]'s pipeline seams hold with an actual decoder, not just
  * the deterministic stub: same row schema, same mapPartitions shape,
  * same fixed-width feature contract.
  *
  * Decode failures (truncated/corrupt payloads — a fact of life in
  * web-crawled media) surface as NULL feature rows rather than task
  * aborts, mirroring the lenient path of the proto decoder
  * (graft.ingest.ProtoWire).
  */
object ImageCodec {

  /** payload → BufferedImage, None on undecodable bytes. */
  def decode(payload: Array[Byte]): Option[BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** Grid-pooled mean-RGB features: gx×gy cells × 3 channels, each in
    * [0, 1]. Deterministic in the pixels; resolution-independent (cells
    * are fractional regions of the image). */
  def gridFeatures(img: BufferedImage, gx: Int, gy: Int): Array[Float] = {
    val out = new Array[Float](gx * gy * 3)
    val counts = new Array[Int](gx * gy)
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < h) {
      val cy = math.min(gy - 1, y * gy / h)
      var x = 0
      while (x < w) {
        val cx = math.min(gx - 1, x * gx / w)
        val cell = cy * gx + cx
        val rgb = img.getRGB(x, y)
        out(cell * 3) += ((rgb >> 16) & 0xff)
        out(cell * 3 + 1) += ((rgb >> 8) & 0xff)
        out(cell * 3 + 2) += (rgb & 0xff)
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    var c = 0
    while (c < gx * gy) {
      if (counts(c) > 0) {
        out(c * 3) /= counts(c) * 255.0f
        out(c * 3 + 1) /= counts(c) * 255.0f
        out(c * 3 + 2) /= counts(c) * 255.0f
      }
      c += 1
    }
    out
  }

  /** Real resize (area-averaging scale, then PNG re-encode). */
  def resizePng(img: BufferedImage, w: Int, h: Int): Array[Byte] = {
    val scaled = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = scaled.createGraphics()
    try {
      g.drawImage(
        img.getScaledInstance(w, h, java.awt.Image.SCALE_AREA_AVERAGING),
        0, 0, null)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(scaled, "png", bos)
    bos.toByteArray
  }

  /** Feature extraction over media rows with the REAL decoder — identical
    * pipeline shape to [[Media.extractFeatures]] (iterator-to-iterator
    * mapPartitions, per-partition codec init, fixed-width output), with
    * (decoded, width, height) metadata recovered from the actual bytes.
    * Undecodable payloads yield decoded=false and a null feature vector.
    */
  def extractImageFeatures(media: Dataset[Media.MediaRow],
                           gx: Int = 4, gy: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image")
      .mapPartitions { rows =>
        // per-partition init point: ImageIO scans its reader registry
        // once here, not per row (a real GPU/native codec opens here)
        rows.map { r =>
          decode(r.payload) match {
            case Some(img) =>
              (r.media_id, true, img.getWidth, img.getHeight,
                gridFeatures(img, gx, gy))
            case None =>
              (r.media_id, false, 0, 0, null: Array[Float])
          }
        }
      }
      .toDF("media_id", "decoded", "width", "height", "features")
  }
}
