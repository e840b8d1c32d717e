package graft.multimodal

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.SparkSuite
import Media.{MediaMeta, MediaRow}

/** PerceptualHash: planted recompressed/resized duplicates must land
  * within the hamming threshold (recall) while distinct structured
  * images stay far (precision), and the banded join must equal the
  * all-pairs scan EXACTLY (the pigeonhole contract). */
class PerceptualHashSpec extends SparkSuite {

  import spark.implicits._

  private def structured(seed: Long, w: Int = 96, h: Int = 80)
      : BufferedImage = SyntheticImages.structured(seed, w, h)
  private def png(img: BufferedImage): Array[Byte] = SyntheticImages.png(img)
  private def jpeg(img: BufferedImage): Array[Byte] = SyntheticImages.jpeg(img)

  private def decode(b: Array[Byte]): BufferedImage =
    ImageCodec.decode(b).get

  test("dHash/pHash survive re-encode and resize; distinct images stay far") {
    val originals = (0 until 24).map(i => structured(seed = 1000 + i))
    for (algo <- Seq("dhash", "phash")) {
      val hashOf: BufferedImage => Long =
        if (algo == "dhash") PerceptualHash.dHash else PerceptualHash.pHash
      val base = originals.map(hashOf)
      // duplicates: JPEG re-encode and a 75% resize re-encode
      val dupJpeg = originals.map(img => hashOf(decode(jpeg(img))))
      val dupSmall = originals.map(img =>
        hashOf(decode(ImageCodec.resizePng(img, 72, 60))))
      def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
      val reencode = base.zip(dupJpeg).map { case (a, b) => ham(a, b) }
      val resized = base.zip(dupSmall).map { case (a, b) => ham(a, b) }
      val cross = for {
        i <- base.indices; j <- base.indices if i < j
      } yield ham(base(i), base(j))
      info(s"$algo: reencode max ${reencode.max}, resize max " +
        s"${resized.max}, cross min ${cross.min}")
      assert(reencode.max <= 3,
        s"$algo re-encoded duplicate drifted ${reencode.max} bits")
      // pHash's near-median coefficient bits drift a little more under
      // resampling (measured 4); its cross-image floor (20) leaves a
      // 3x margin at a 7-bit threshold (bandBits = 8 → 8 bands)
      val resizeCap = if (algo == "dhash") 3 else 7
      assert(resized.max <= resizeCap,
        s"$algo resized duplicate drifted ${resized.max} bits")
      assert(cross.min > 10,
        s"$algo distinct images collide at ${cross.min} bits")
    }
  }

  test("banded pairs equal the all-pairs hamming scan exactly") {
    // hashes engineered to include close pairs at every distance 0..6
    val rnd = new scala.util.Random(7)
    val hs = (0 until 60).map { i =>
      val base = rnd.nextLong()
      (i.toLong, if (i % 3 == 0) base
      else {
        // flip i%7 random bits of the previous base
        var h = base
        (0 until i % 7).foreach(_ => h ^= 1L << rnd.nextInt(64))
        h
      })
    }
    val df = hs.toDF("media_id", "phash")
    val banded = PerceptualHash.nearDupPairs(df, bandBits = 16,
        maxHamming = 3)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    val allPairs = (for {
      i <- hs.indices; j <- hs.indices if i < j
      d = java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2) if d <= 3
    } yield (hs(i)._1, hs(j)._1, d)).toSet
    assert(banded == allPairs)
  }

  test("end-to-end: planted duplicates found, no false pairs, nulls dropped") {
    // 20 distinct structured images; every 4th gets a resized+re-encoded
    // twin at id+100; id 99 is undecodable garbage
    val rows = (0 until 20).map { i =>
      MediaRow(i.toLong, "image", png(structured(2000 + i)),
        MediaMeta(96, 80, 0, 0))
    } ++ (0 until 20 by 4).map { i =>
      MediaRow(i + 100L, "image",
        ImageCodec.resizePng(structured(2000 + i), 64, 53),
        MediaMeta(64, 53, 0, 0))
    } :+ MediaRow(99L, "image", Array.fill(64)(7.toByte),
      MediaMeta(0, 0, 0, 0))
    val media = rows.toDS().repartition(3)
    val hs = PerceptualHash.hashes(media, "dhash")
    assert(hs.filter(col("phash").isNull).select("media_id")
      .as[Long].collect().toSeq == Seq(99L))
    val pairs = PerceptualHash.nearDupPairs(hs, bandBits = 16,
        maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = (0 until 20 by 4).map(i => (i.toLong, i + 100L)).toSet
    assert(pairs == want,
      s"planted ${want.size} pairs, got ${pairs.size}: $pairs")
  }
}
