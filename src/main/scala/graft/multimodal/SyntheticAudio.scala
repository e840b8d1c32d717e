package graft.multimodal

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Deterministic synthetic audio corpus — the WAV sibling of
  * [[SyntheticImages]] (no audio fixtures ship with the testdata; the
  * seams that matter — decode, fingerprint, banded join — run the real
  * JDK codec over these bytes). Each seed defines a CONTINUOUS-TIME
  * signal (a mixture of sinusoids), so the same seed rendered at two
  * sample rates is a genuine resampling of one underlying recording —
  * exactly the transformation a re-encoded web copy undergoes — and the
  * same seed at two volumes is a gain-staged copy. */
object SyntheticAudio {

  /** One tone: carrier (f, a, ph) + a slow amplitude envelope (g, psi)
    * in [0.5, 4) Hz — real audio is NON-stationary, and the fingerprint
    * derives its entropy from spectral change over time, so stationary
    * test tones would be degenerate (all time cells identical). */
  final case class Tone(f: Double, a: Double, ph: Double,
      g: Double, psi: Double)

  /** Seeded tone mixture: frequencies log-uniform in [250, 6000) Hz
    * (inside [[AudioFingerprint]]'s band range), amplitudes, phases and
    * envelopes uniform. Pure function of (seed, nTones). */
  def mixture(seed: Long, nTones: Int = 8): IndexedSeq[Tone] = {
    val rnd = new scala.util.Random(seed)
    IndexedSeq.fill(nTones) {
      val f = 250.0 * math.pow(24.0, rnd.nextDouble()) // 250 .. 6000 Hz
      val a = 0.2 + 0.8 * rnd.nextDouble()
      val ph = 2 * math.Pi * rnd.nextDouble()
      val g = 0.5 + 3.5 * rnd.nextDouble()
      val psi = 2 * math.Pi * rnd.nextDouble()
      Tone(f, a, ph, g, psi)
    }
  }

  /** The mixture evaluated at continuous time t (seconds), normalized
    * to peak ≤ 1 by the amplitude sum. */
  def signalAt(tones: IndexedSeq[Tone], t: Double): Double = {
    var s = 0.0
    var norm = 0.0
    tones.foreach { tone =>
      val env = 0.5 + 0.5 * math.sin(2 * math.Pi * tone.g * t + tone.psi)
      s += tone.a * env * math.sin(2 * math.Pi * tone.f * t + tone.ph)
      norm += tone.a
    }
    s / norm
  }

  /** Render the seeded signal to real 16-bit PCM WAV bytes at the given
    * rate and volume — the same codec family a crawled corpus needs. */
  def wav(seed: Long, ms: Int, rate: Int = 16000,
      volume: Double = 0.9, nTones: Int = 8): Array[Byte] = {
    val tones = mixture(seed, nTones)
    val n = rate * ms / 1000
    val bytes = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = signalAt(tones, i.toDouble / rate) * volume
      val s = math.max(-32768, math.min(32767, math.round(v * 32767))).toShort
      bytes(i * 2) = (s & 0xff).toByte
      bytes(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate.toFloat,
      16, 1, 2, rate.toFloat, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }
}
