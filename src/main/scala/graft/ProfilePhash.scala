package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Media, PerceptualHash, SyntheticImages}

/** Scale sweep for the perceptual-hash near-dup pass: decode + dHash
  * throughput over executor-GENERATED PNGs (deterministic
  * SyntheticImages seeds — no driver-side image bytes, no fixture
  * files), then the banded hamming join at a planted ~4% duplicate
  * rate. The decode dominates (ImageIO PNG inflate); the join side is
  * 8 bytes/image however large the corpus.
  *
  * Usage: runMain graft.ProfilePhash [n ...] (default 20000 100000)
  */
object ProfilePhash {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-phash")
    import spark.implicits._
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(20000L, 100000L)
    sizes.foreach { n =>
      // every 25th image is a resized re-encode of its predecessor —
      // the planted near-dup pairs the banded join must find
      val media = spark.range(0L, n).as[Long].map { i =>
        val seed = if (i % 25 == 1) i - 1 else i
        val img = SyntheticImages.structured(seed, w = 64, h = 52)
        val payload =
          if (i % 25 == 1)
            graft.multimodal.ImageCodec.resizePng(img, 48, 40)
          else SyntheticImages.png(img)
        Media.MediaRow(i, "image", payload, Media.MediaMeta(64, 52, 0, 0))
      }
      val t0 = System.nanoTime()
      val hashes = PerceptualHash.hashes(media, "dhash").localCheckpoint()
      val nHashed = hashes.count()
      val hashSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val pairs = PerceptualHash.nearDupPairs(hashes, bandBits = 16,
        maxHamming = 3)
      val nPairs = pairs.count()
      val planted = pairs.filter(col("id_b") === col("id_a") + 1 &&
        col("id_b") % 25 === 1).count()
      val joinSec = (System.nanoTime() - t1) / 1e9
      val expected = (n + 23) / 25
      println(f"""{"phash":{"n":$n%d,"hash_sec":$hashSec%.1f,""" +
        f""""img_per_sec":${(nHashed / hashSec).toLong}%d,""" +
        f""""join_sec":$joinSec%.1f,"pairs":$nPairs%d,""" +
        f""""planted_found":$planted%d,"planted":$expected%d}}""")
    }
    spark.stop()
  }
}
