package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{AudioFingerprint, Media, PerceptualHash, SyntheticAudio}

/** Scale sweep for the acoustic-fingerprint near-dup pass: WAV render +
  * decode + FFT-filterbank hash throughput over executor-GENERATED
  * clips (deterministic SyntheticAudio seeds), then the shared banded
  * hamming join at a planted ~4% duplicate rate, where each twin is a
  * RESAMPLED (44.1 kHz) + volume-shifted (0.4) re-render of its
  * predecessor — the full transformation stack the fingerprint claims
  * robustness to. Join side is 8 bytes/clip however large the corpus.
  *
  * Usage: runMain graft.ProfileAudioFp [n ...] (default 20000 100000)
  */
object ProfileAudioFp {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-audiofp")
    import spark.implicits._
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(20000L, 100000L)
    sizes.foreach { n =>
      val media = spark.range(0L, n).as[Long].map { i =>
        val twin = i % 25 == 1
        val seed = if (twin) i - 1 else i
        val rate = if (twin) 44100 else 16000
        val vol = if (twin) 0.4 else 0.9
        Media.MediaRow(i, "audio",
          SyntheticAudio.wav(seed, ms = 400, rate = rate, volume = vol),
          Media.MediaMeta(0, 0, rate, 400))
      }
      val t0 = System.nanoTime()
      val hashes = AudioFingerprint.hashes(media).localCheckpoint()
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
      println(f"""{"audiofp":{"n":$n%d,"hash_sec":$hashSec%.1f,""" +
        f""""clip_per_sec":${(nHashed / hashSec).toLong}%d,""" +
        f""""join_sec":$joinSec%.1f,"pairs":$nPairs%d,""" +
        f""""planted_found":$planted%d,"planted":$expected%d}}""")
    }
    spark.stop()
  }
}
