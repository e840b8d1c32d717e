package graft.multimodal

import java.awt.image.BufferedImage

import graft.SparkSuite
import Media.{MediaMeta, MediaRow}

/** VideoFingerprint: the slot-aligned banded join must equal the
  * all-pairs aligned-hamming computation EXACTLY (per-slot pigeonhole),
  * planted re-encoded/resized/trimmed copies must match, distinct clips
  * must not, and corrupt payloads must stay lenient. */
class VideoFingerprintSpec extends SparkSuite {

  import spark.implicits._

  private def clipGif(seed: Long, nFrames: Int = 8): Array[Byte] =
    SyntheticImages.animatedGif(SyntheticImages.video(seed, nFrames))

  private def resizedGif(seed: Long, nFrames: Int = 8): Array[Byte] =
    SyntheticImages.animatedGif(SyntheticImages.video(seed, nFrames)
      .map(f => ImageCodec.decode(ImageCodec.resizePng(f, 72, 60)).get))

  private def trimmedGif(seed: Long, nFrames: Int = 8): Array[Byte] =
    SyntheticImages.animatedGif(
      SyntheticImages.video(seed, nFrames).dropRight(1))

  test("banded slot-match equals the all-pairs aligned scan exactly") {
    val nFrames = 6
    val rows = (0L until 10L).map(i =>
      MediaRow(i, "video", clipGif(i, nFrames), MediaMeta(96, 80, 0, 0))) ++
      Seq(MediaRow(100L, "video", resizedGif(3, nFrames),
        MediaMeta(72, 60, 0, 0)))
    val media = rows.toDS().repartition(3)
    val fh = VideoFingerprint.frameHashes(media, nFrames)
    // driver brute force over the SAME hashes
    val hs = fh.as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (id, a) =>
        id -> a.map(t => t._2 -> t._3).toMap }
    val ids = hs.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
      matched = (0 until nFrames).count { s =>
        (hs(i).get(s), hs(j).get(s)) match {
          case (Some(a), Some(b)) => java.lang.Long.bitCount(a ^ b) <= 3
          case _ => false
        }
      } if matched >= 1
    } yield (i, j) -> matched.toLong).toMap
    val got = VideoFingerprint.nearDupPairs(fh, bandBits = 16,
        maxHamming = 3, minMatched = 1)
      .as[(Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got == expected)
  }

  test("planted resized and trimmed copies match; distinct clips do not") {
    val nFrames = 8
    val n = 12L
    val rows = (0L until n).map(i =>
      MediaRow(i, "video", clipGif(i), MediaMeta(96, 80, 0, 0))) ++
      (0L until n).filter(_ % 3 == 0).map(i =>
        MediaRow(i + 1000L, "video", resizedGif(i), MediaMeta(72, 60, 0, 0))) ++
      (0L until n).filter(_ % 4 == 0).map(i =>
        MediaRow(i + 2000L, "video", trimmedGif(i), MediaMeta(96, 80, 0, 0))) ++
      Seq(MediaRow(9000L, "video", Array[Byte](1, 2, 3), MediaMeta(0, 0, 0, 0)),
        MediaRow(9001L, "image", SyntheticImages.png(
          SyntheticImages.structured(1)), MediaMeta(96, 80, 0, 0)))
    val media = rows.toDS().repartition(4)
    val fh = VideoFingerprint.frameHashes(media, nFrames)
    // corrupt payload -> zero rows; images filtered
    val byId = fh.as[(Long, Int, Long)].collect().groupBy(_._1)
    assert(!byId.contains(9000L) && !byId.contains(9001L))
    // trimmed clip yields one sample per remaining frame — slots 0..6
    // still align with the original's first 7 sampled frames
    assert(byId(2000L).length == nFrames - 1)
    val pairs = VideoFingerprint.nearDupPairs(fh, bandBits = 16,
        maxHamming = 3, minMatched = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val plantedResize = (0L until n).filter(_ % 3 == 0)
      .map(i => (i, i + 1000L)).toSet
    val plantedTrim = (0L until n).filter(_ % 4 == 0)
      .map(i => (i, i + 2000L)).toSet
    info(s"resize found ${pairs.intersect(plantedResize).size}/" +
      s"${plantedResize.size}, trim found " +
      s"${pairs.intersect(plantedTrim).size}/${plantedTrim.size}, " +
      s"extra ${(pairs -- plantedResize -- plantedTrim).size}")
    assert(plantedResize.subsetOf(pairs))
    assert(plantedTrim.subsetOf(pairs))
    // the only extras allowed are twin-of-twin pairs (resize vs trim of
    // the same original)
    val twinOfTwin = (0L until n)
      .filter(i => i % 3 == 0 && i % 4 == 0)
      .map(i => (i + 1000L, i + 2000L)).toSet
    assert((pairs -- plantedResize -- plantedTrim -- twinOfTwin).isEmpty)
  }

  test("frame hashes are deterministic under repartitioning") {
    val rows = (0L until 6L).map(i =>
      MediaRow(i, "video", clipGif(i, 5), MediaMeta(96, 80, 0, 0)))
    val a = VideoFingerprint.frameHashes(rows.toDS().repartition(2), 5)
      .as[(Long, Int, Long)].collect().sorted.toSeq
    val b = VideoFingerprint.frameHashes(rows.toDS().repartition(5), 5)
      .as[(Long, Int, Long)].collect().sorted.toSeq
    assert(a == b)
  }
}
