package graft.multimodal

import graft.SparkSuite
import Media._

/** Multimodal plumbing spec: schema, partition mapping, flatMap fan-out,
  * metadata pruning. The codec leaf is the documented stub. */
class MediaSpec extends SparkSuite {

  private def sampleMedia = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0L until 40L).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val payload = Array.fill((50 + rnd.nextInt(200)))(rnd.nextInt().toByte)
      MediaRow(i, kind, payload,
        MediaMeta(width = 100 + (i % 10).toInt * 50,
          height = 80 + (i % 7).toInt * 40,
          sampleRate = 16000, durationMs = 1000 * (i % 5)))
    }.toDS().repartition(4)
  }

  test("extractFeatures: fixed-width vectors, deterministic, distributed") {
    val feats = extractFeatures(sampleMedia, dim = 32).collect()
    assert(feats.length == 40)
    assert(feats.forall(_.features.length == 32))
    assert(feats.forall(_.dim == 32))
    // deterministic across runs (stub codec is pure in the payload)
    val again = extractFeatures(sampleMedia, dim = 32).collect()
    assert(feats.sortBy(_.media_id).map(_.features.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.features.toSeq).toSeq)
    // features bounded per the stub contract
    assert(feats.forall(_.features.forall(f => f >= -1.0f && f <= 1.0f)))
  }

  test("resizeImages filters kind and preserves ids") {
    import spark.implicits._
    val out = resizeImages(sampleMedia, 8, 8)
    val ids = out.select("media_id").as[Long].collect().sorted.toSeq
    assert(ids == (0L until 40L).filter(_ % 3 == 0))
    assert(out.select("resized").as[Array[Byte]].collect()
      .forall(b => b.length <= 64 && b.nonEmpty))
  }

  /** A genuine animated GIF (the one multi-frame container a stock JRE
    * writes AND reads): one solid-color frame per entry of `colors`. */
  private def gif(w: Int, h: Int, colors: Seq[Int]): Array[Byte] = {
    import java.awt.image.BufferedImage
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(c)); g.fillRect(0, 0, w, h) }
      finally g.dispose()
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    bos.toByteArray
  }

  test("sampleFrames: REAL multi-frame decode, stride sampling, flatMap " +
      "fan-out; corrupt payloads yield zero rows") {
    import spark.implicits._
    // 6 distinct solid-color frames; 0xff/0x00 channel values survive
    // GIF palette quantization exactly
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffff00, 0x00ffff,
      0xffffff)
    val rows = Seq(
      MediaRow(0L, "video", gif(16, 12, colors), MediaMeta(16, 12, 0, 600)),
      MediaRow(1L, "video", Array[Byte](1, 2, 3), MediaMeta(0, 0, 0, 0)),
      MediaRow(2L, "image", gif(8, 8, colors.take(1)), MediaMeta(8, 8, 0, 0))
    ).toDS().repartition(2)
    val frames = sampleFrames(rows, n = 4).collect()
    // only the decodable VIDEO row fans out; stride over 6 frames at n=4
    // picks original indices k*6/4 = 0,1,3,4
    assert(frames.map(_.media_id).toSet == Set(0L))
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 3, 4))
    // each sampled frame re-encodes as a real PNG of the source size and
    // carries THAT frame's color (proof the right frame was read)
    frames.foreach { f =>
      val img = ImageCodec.decode(f.frame).get
      assert(img.getWidth == 16 && img.getHeight == 12)
      assert((img.getRGB(3, 3) & 0xffffff) == colors(f.frame_idx))
    }
    // n >= frame count samples every frame exactly once
    val all = sampleFrames(rows, n = 10).collect()
    assert(all.map(_.frame_idx).sorted.toSeq == (0 until 6))
  }

  test("extractFrameFeatures: per-frame features through the ImageCodec " +
      "grid path; corrupt -> one decoded=false null row") {
    import spark.implicits._
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff)
    val rows = Seq(
      MediaRow(0L, "video", gif(12, 12, colors), MediaMeta(12, 12, 0, 300)),
      MediaRow(1L, "video", Array[Byte](7, 7, 7), MediaMeta(0, 0, 0, 0))
    ).toDS().repartition(2)
    val out = VideoCodec.extractFrameFeatures(rows, n = 3, gx = 2, gy = 2)
      .as[(Long, Int, Boolean, Int, Option[Seq[Float]])].collect()
      .sortBy(r => (r._1, r._2))
    val good = out.filter(_._1 == 0L)
    assert(good.map(_._2).toSeq == Seq(0, 1, 2))
    assert(good.forall(r => r._3 && r._4 == 3 && r._5.get.size == 12))
    // a solid red frame has mean-RGB (1, 0, 0) in every grid cell
    val red = good.head._5.get
    assert(red.grouped(3).forall(c =>
      c(0) > 0.95f && c(1) < 0.05f && c(2) < 0.05f))
    val green = good(1)._5.get
    assert(green.grouped(3).forall(c => c(1) > 0.95f && c(0) < 0.05f))
    // corrupt payload -> lenient marker row, not a task abort
    assert(out.filter(_._1 == 1L).toSeq match {
      case Seq((1L, -1, false, 0, None)) => true
      case _ => false
    })
  }

  test("extracted features flow into the similarity search path") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // decode → features → brute-force cosine top-k, the same operator
    // pipeline the text/embedding path uses (graft.functions.Vectors)
    val feats = extractFeatures(sampleMedia, dim = 16)
      .select(col("media_id"), col("features"))
    val q = feats.filter(col("media_id") === 0)
      .select(col("features").as("qvec"))
    val topk = feats.crossJoin(broadcast(q))
      .filter(col("media_id") =!= 0)
      .select(col("media_id"),
        graft.functions.Vectors.dot(col("features"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("media_id").asc)
      .limit(5)
      .as[(Long, Double)].collect()
    assert(topk.length == 5)
    assert(topk.map(_._2).toSeq == topk.map(_._2).sorted.reverse.toSeq)
  }

  test("REAL codec seam: JDK ImageIO decodes actual PNGs through the " +
      "same pipeline shape") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    // genuine PNG payloads, generated with the same codec family a real
    // corpus would need — this is the swap-the-stub proof
    def png(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (x * 7 + y * 13 + seed * 31) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(0L, "image", png(32, 24, 0), MediaMeta(32, 24, 0, 0)),
      MediaRow(1L, "image", png(64, 64, 1), MediaMeta(64, 64, 0, 0)),
      MediaRow(2L, "image", Array[Byte](1, 2, 3), MediaMeta(0, 0, 0, 0)),
      MediaRow(3L, "audio", Array[Byte](9, 9), MediaMeta(0, 0, 16000, 5))
    ).toDS().repartition(2)
    val out = ImageCodec.extractImageFeatures(rows, gx = 2, gy = 2)
      .as[(Long, Boolean, Int, Int, Option[Seq[Float]])].collect()
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L)) // audio filtered out
    // real decode recovers true dimensions from the BYTES, not metadata
    assert(out(0) match { case (_, true, 32, 24, Some(f)) => f.size == 12
                          case _ => false })
    assert(out(1) match { case (_, true, 64, 64, Some(f)) => f.size == 12
                          case _ => false })
    // corrupt payload -> lenient null row, no task failure
    assert(out(2) match { case (_, false, 0, 0, None) => true
                          case _ => false })
    // features are normalized channel means
    val f0 = out(0)._5.get
    assert(f0.forall(v => v >= 0.0f && v <= 1.0f))
    // real resize round-trips through the decoder at the target size
    val resized = ImageCodec.resizePng(ImageCodec.decode(png(64, 64, 2)).get,
      w = 16, h = 8)
    val back = ImageCodec.decode(resized).get
    assert(back.getWidth == 16 && back.getHeight == 8)
  }

  test("REAL codec seam: JDK javax.sound decodes actual WAVs through " +
      "the same pipeline shape") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // genuine WAV payloads (16-bit PCM sine waves), generated with the
    // same codec family a real corpus would need
    def wav(hz: Double, ms: Int, rate: Int = 8000, channels: Int = 1)
        : Array[Byte] = {
      val n = rate * ms / 1000
      val bytes = new Array[Byte](n * channels * 2)
      for (i <- 0 until n; c <- 0 until channels) {
        val s = (math.sin(2 * math.Pi * hz * i / rate) * 12000).toShort
        val off = (i * channels + c) * 2
        bytes(off) = (s & 0xff).toByte
        bytes(off + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate.toFloat,
        16, channels, channels * 2, rate.toFloat, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(0L, "audio", wav(440.0, 200), MediaMeta(0, 0, 8000, 200)),
      MediaRow(1L, "audio", wav(55.0, 100, channels = 2),
        MediaMeta(0, 0, 8000, 100)),
      MediaRow(2L, "audio", Array[Byte](1, 2, 3), MediaMeta(0, 0, 0, 0)),
      MediaRow(3L, "image", Array[Byte](9, 9), MediaMeta(8, 8, 0, 0))
    ).toDS().repartition(2)
    val out = AudioCodec.extractAudioFeatures(rows, cells = 8)
      .as[(Long, Boolean, Int, Int, Option[Seq[Float]])].collect()
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L)) // image filtered out
    // real decode recovers rate + sample count from the BYTES
    assert(out(0) match { case (_, true, 8000, 1600, Some(f)) => f.size == 16
                          case _ => false })
    // stereo collapses to mono (channel-averaged), same rate
    assert(out(1) match { case (_, true, 8000, 800, Some(f)) => f.size == 16
                          case _ => false })
    // corrupt payload -> lenient null row, no task failure
    assert(out(2) match { case (_, false, 0, 0, None) => true
                          case _ => false })
    val f440 = out(0)._5.get
    // features bounded per contract
    assert(f440.forall(v => v >= 0.0f && v <= 1.0f))
    // a 440 Hz tone has real energy in every cell; its zero-crossing
    // rate is ~2·440/8000 = 0.11 — distinguishable from the 55 Hz clip
    val rms440 = f440.indices.collect { case i if i % 2 == 0 => f440(i) }
    val zcr440 = f440.indices.collect { case i if i % 2 == 1 => f440(i) }
    val zcr55 = out(1)._5.get.indices.collect {
      case i if i % 2 == 1 => out(1)._5.get(i) }
    assert(rms440.forall(_ > 0.1f))
    assert(zcr440.sum / zcr440.size > zcr55.sum / zcr55.size * 2)
    // deterministic across runs
    val again = AudioCodec.extractAudioFeatures(rows, cells = 8)
      .as[(Long, Boolean, Int, Int, Option[Seq[Float]])].collect().sortBy(_._1)
    assert(out.map(_._5.map(_.toSeq)).toSeq ==
      again.map(_._5.map(_.toSeq)).toSeq)
  }

  test("audio features flow into the similarity search path") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def tone(hz: Double, seed: Int): Array[Byte] = {
      val rate = 8000
      val n = rate / 10
      val bytes = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val s = (math.sin(2 * math.Pi * hz * i / rate + seed) * 9000).toShort
        bytes(i * 2) = (s & 0xff).toByte
        bytes(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate.toFloat,
        16, 1, 2, rate.toFloat, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // 6 clips: ids 0-2 near 440 Hz, ids 3-5 near 3000 Hz — nearest
    // neighbours of clip 0 should be its frequency family
    val rows = (0L until 6L).map { i =>
      val hz = if (i < 3) 440.0 + i else 3000.0 + i * 10
      MediaRow(i, "audio", tone(hz, i.toInt), MediaMeta(0, 0, 8000, 100))
    }.toDS().repartition(2)
    val feats = AudioCodec.extractAudioFeatures(rows, cells = 8)
      .filter(col("decoded"))
      .select(col("media_id"), col("features"))
    val q = feats.filter(col("media_id") === 0)
      .select(col("features").as("qvec"))
    val top = feats.crossJoin(broadcast(q))
      .filter(col("media_id") =!= 0)
      .select(col("media_id"),
        (graft.functions.Vectors.dot(col("features"), col("qvec")) /
          sqrt(graft.functions.Vectors.dot(col("features"), col("features")) *
            graft.functions.Vectors.dot(col("qvec"), col("qvec")))).as("sim"))
      .orderBy(col("sim").desc, col("media_id").asc)
      .limit(2)
      .as[(Long, Double)].collect()
    assert(top.map(_._1).toSet == Set(1L, 2L))
  }

  test("metadata predicate prunes without touching payloads") {
    val df = sampleMedia.toDF()
    val big = selectLargeImages(df, minPixels = 100000)
    assert(big.count() > 0)
    // the predicate must reference only meta/kind — check the plan reads
    // as a pushable filter over the scan, not a post-decode filter
    val plan = big.queryExecution.optimizedPlan.toString()
    assert(plan.contains("meta") && !plan.toLowerCase.contains("mappartitions"))
  }
}
