package graft.multimodal

import java.awt.image.BufferedImage

/** Deterministic synthetic image corpus — the stand-in for real crawled
  * media in this container (no image fixtures ship with the testdata;
  * the seams that MATTER — decode, hash, banded join — run the real JDK
  * codecs over these bytes). Gradient-rich low-frequency content, the
  * photographic regime perceptual hashing is built for: flat fills
  * would plant exact neighbor-cell ties whose comparison signs flip
  * under compression noise (measured 18-bit dHash drift in
  * PerceptualHashSpec's first cut vs ≤3 with gradients). */
object SyntheticImages {

  /** Seeded structured image: gradient background + `nRects`
    * gradient-filled rectangles. Pure function of the arguments. */
  def structured(seed: Long, w: Int = 96, h: Int = 80,
      nRects: Int = 6): BufferedImage = {
    val rnd = new scala.util.Random(seed)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    def grad(x0: Int, y0: Int, x1: Int, y1: Int) =
      new java.awt.GradientPaint(
        x0.toFloat, y0.toFloat, new java.awt.Color(rnd.nextInt(1 << 24)),
        x1.toFloat, y1.toFloat, new java.awt.Color(rnd.nextInt(1 << 24)))
    try {
      g.setPaint(grad(0, 0, w, h))
      g.fillRect(0, 0, w, h)
      (1 to nRects).foreach { _ =>
        val rw = w / 4 + rnd.nextInt(w / 2)
        val rh = h / 4 + rnd.nextInt(h / 2)
        val rx = rnd.nextInt(w - w / 4)
        val ry = rnd.nextInt(h - h / 4)
        g.setPaint(grad(rx, ry, rx + rw, ry + rh))
        g.fillRect(rx, ry, rw, rh)
      }
    } finally g.dispose()
    img
  }

  def png(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def jpeg(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** A genuine animated GIF from the given frames — the one multi-frame
    * container a stock JRE both writes and reads ([[VideoCodec]]'s
    * decode side). GIF's 256-color palette quantizes the gradients,
    * which is itself a useful perturbation: per-frame dHash must (and
    * does) survive it. */
  def animatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { img =>
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Seeded synthetic clip: `nFrames` structured frames whose rectangle
    * layout EVOLVES with the frame index (seed·1000+frame), so frames
    * differ the way real video frames do. */
  def video(seed: Long, nFrames: Int = 8, w: Int = 96,
      h: Int = 80): Seq[BufferedImage] =
    (0 until nFrames).map(f => structured(seed * 1000 + f, w, h))
}
