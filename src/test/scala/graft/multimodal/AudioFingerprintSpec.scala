package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSuite
import Media.{MediaMeta, MediaRow}

/** AudioFingerprint: the Philips-family band-difference hash must be
  * EXACTLY gain-invariant (power-of-two scaling is an FP identity),
  * robust to WAV re-render at another volume and to resampling
  * (16 kHz vs 44.1 kHz renders of the same continuous signal), keep
  * distinct mixtures far apart, and feed the SAME banded hamming join
  * the image path uses — one join implementation for every modality. */
class AudioFingerprintSpec extends SparkSuite {

  import spark.implicits._

  private def clip(seed: Long, ms: Int = 400, rate: Int = 16000,
      volume: Double = 0.9): AudioCodec.Clip =
    AudioCodec.decode(SyntheticAudio.wav(seed, ms, rate, volume)).get

  private def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("power-of-two gain changes the hash by ZERO bits (FP identity)") {
    for (seed <- 0L until 6L) {
      val c = clip(seed)
      val scaled = AudioCodec.Clip(c.samples.map(_ * 0.25f), c.sampleRate)
      val quieter = AudioCodec.Clip(c.samples.map(_ * 0.0078125f), c.sampleRate)
      assert(AudioFingerprint.clipHash(c) == AudioFingerprint.clipHash(scaled))
      assert(AudioFingerprint.clipHash(c) == AudioFingerprint.clipHash(quieter))
    }
  }

  test("volume re-render and resample drift stay within the join " +
      "threshold; distinct mixtures stay far") {
    val seeds = (0L until 24L).toIndexedSeq
    val base = seeds.map(s => AudioFingerprint.clipHash(clip(s)))
    // the same continuous signal, re-rendered quieter (16-bit requantize)
    val quiet = seeds.map(s => AudioFingerprint.clipHash(clip(s, volume = 0.35)))
    // ... and resampled to 44.1 kHz (a genuine rate conversion: the WAV
    // is synthesized from the SAME continuous-time mixture)
    val hi = seeds.map(s => AudioFingerprint.clipHash(clip(s, rate = 44100)))
    val volDrift = base.zip(quiet).map { case (a, b) => ham(a, b) }
    val rateDrift = base.zip(hi).map { case (a, b) => ham(a, b) }
    val cross = for {
      i <- base.indices; j <- base.indices if i < j
    } yield ham(base(i), base(j))
    info(s"volume drift max ${volDrift.max}, resample drift max " +
      s"${rateDrift.max}, cross min ${cross.min}")
    assert(volDrift.max <= 3, s"volume re-render drifted ${volDrift.max} bits")
    assert(rateDrift.max <= 3, s"resample drifted ${rateDrift.max} bits")
    assert(cross.min > 10, s"distinct mixtures collide at ${cross.min} bits")
  }

  test("trim robustness: a 2% longer render of the same signal shifts " +
      "every fractional cell boundary yet drifts only a few bits") {
    val drift = (0L until 8L).map { s =>
      ham(AudioFingerprint.clipHash(clip(s, ms = 400)),
        AudioFingerprint.clipHash(clip(s, ms = 408)))
    }
    info(s"trim drift max ${drift.max}")
    assert(drift.max <= 8)
  }

  test("hashes() runs the real decoder lenient-path and nearDupPairs " +
      "finds planted re-encoded twins with full precision") {
    val n = 30
    val rows = (0L until n.toLong).map { i =>
      MediaRow(i, "audio", SyntheticAudio.wav(i, ms = 400),
        MediaMeta(0, 0, 16000, 400))
    } ++ (0L until n.toLong).filter(_ % 3 == 0).map { i =>
      // twin: same mixture, resampled AND volume-shifted
      MediaRow(i + 1000L, "audio",
        SyntheticAudio.wav(i, ms = 400, rate = 44100, volume = 0.4),
        MediaMeta(0, 0, 44100, 400))
    } ++ Seq(
      MediaRow(5000L, "audio", Array[Byte](1, 2, 3), MediaMeta(0, 0, 0, 0)),
      MediaRow(5001L, "image", Array[Byte](9), MediaMeta(8, 8, 0, 0)))
    val media = rows.toDS().repartition(3)
    val hs = AudioFingerprint.hashes(media)
    val collected = hs.as[(Long, Option[Long])].collect().toMap
    assert(collected(5000L).isEmpty) // corrupt -> null, no task abort
    assert(!collected.contains(5001L)) // images filtered out
    assert(collected.count(_._2.isDefined) == n + n / 3)
    // determinism under repartitioning
    val again = AudioFingerprint.hashes(media.repartition(7))
      .as[(Long, Option[Long])].collect().toMap
    assert(collected == again)
    // the SAME banded join the image path uses (pigeonhole exactness is
    // pinned hash-agnostically in PerceptualHashSpec)
    val pairs = PerceptualHash.nearDupPairs(hs, bandBits = 16, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = (0L until n.toLong).filter(_ % 3 == 0)
      .map(i => (i, i + 1000L)).toSet
    val found = pairs.intersect(planted)
    info(s"planted ${planted.size}, found ${found.size}, " +
      s"extra ${(pairs -- planted).size}")
    assert(found.size >= planted.size - 1,
      s"recall ${found.size}/${planted.size}")
    assert((pairs -- planted).isEmpty,
      s"false positives: ${pairs -- planted}")
  }
}
