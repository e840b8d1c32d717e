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

  test("sampleFrames: one row per frame (flatMap fan-out)") {
    val frames = sampleFrames(sampleMedia, n = 4).collect()
    val videoIds = (0L until 40L).filter(_ % 3 == 2)
    assert(frames.length == videoIds.size * 4)
    assert(frames.groupBy(_.media_id).forall(_._2.map(_.frame_idx).sorted
      .toSeq == Seq(0, 1, 2, 3)))
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
