package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}

/** Acoustic fingerprinting + near-dup — the audio arm of the multimodal
  * dedup cascade, completing the modality matrix (text by shingle/
  * minhash, embeddings by cosine, images by [[PerceptualHash]], audio
  * here). The fingerprint follows the Philips robust-hash family
  * (Haitsma & Kalker 2002, the design Chromaprint/AcoustID descends
  * from): spectral BAND-ENERGY DIFFERENCE SIGNS, not raw energies,
  * because signs survive the transformations distributed copies of a
  * recording actually undergo:
  *
  *  - **gain/volume changes**: a positive gain scales every band energy
  *    by the same factor, so every pairwise energy comparison keeps its
  *    sign. (For power-of-two gains the invariance is bit-EXACT even in
  *    floating point — scaling doubles by 2^k shifts exponents only —
  *    which AudioFingerprintSpec pins as an identity, not a tolerance.)
  *  - **resampling**: bands are fixed ABSOLUTE-Hz ranges and energies
  *    are Parseval-normalized per sample, so a 44.1 kHz render of the
  *    same signal lands the same band masses as a 16 kHz render up to
  *    spectral-leakage drift at the band edges (measured ≤ a few bits).
  *  - **duration/offset jitter**: time cells are FRACTIONAL regions of
  *    the clip ([[AudioCodec.cellFeatures]]'s discipline), so the hash
  *    is length-independent by construction.
  *
  * Shape: 17 time cells × 5 log-spaced bands ([200,400,800,1600,3200,
  * 6400) Hz) → the Haitsma–Kalker bit — the sign of the energy
  * difference across BOTH band and time, `(E(c,b)−E(c,b+1)) −
  * (E(c−1,b)−E(c−1,b+1)) > 0` — for 16 cell transitions × 4 band pairs
  * = one 64-bit hash per clip. The time derivative is load-bearing:
  * band-only comparisons collapse to ~4 bits on quasi-stationary audio
  * (every cell answers alike); spectral CHANGE is where a recording's
  * identity lives. Emitted as the SAME (media_id, phash) frame the
  * image path produces — so [[PerceptualHash.nearDupPairs]], the exact-by-pigeonhole
  * banded hamming self-join, serves every modality unchanged. At 100 TB
  * that is the load-bearing property: fingerprints are 8 bytes/clip,
  * payloads never shuffle, and ONE join implementation carries image and
  * audio dedup.
  *
  * Requires sampleRate ≥ 12.8 kHz (top band edge below Nyquist); lower
  * rates still hash deterministically but lose the resample-robustness
  * contract for the top band.
  */
object AudioFingerprint {

  /** Filterbank edges in Hz — geometric over [200, 6400), defining 5
    * TRIANGULAR filters (filter b spans edges b..b+2, peaked at b+1, in
    * log-frequency — the mel-filterbank discipline). Smooth filters are
    * load-bearing for resample robustness: with rectangular bands, a
    * tone near an edge splits across the two bands differently under
    * each rate's bin grid (measured 10-bit drift); a triangle ramps its
    * contribution continuously, so the split drifts smoothly. */
  private val Edges: Array[Double] =
    Array.tabulate(7)(i => 200.0 * math.pow(32.0, i / 6.0)) // 200..6400
  private val Bands = Edges.length - 2 // 5 triangular filters
  private val Cells = 17 // 16 cell TRANSITIONS carry the bits
  private val BitsPerCell = Bands - 1 // adjacent-filter diffs

  /** In-place iterative radix-2 Cooley–Tukey FFT (re/im length must be a
    * power of two). Pure-JDK, deterministic. */
  private def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = blk + k
          val b = a + len / 2
          val vr = re(b) * cr - im(b) * ci
          val vi = re(b) * ci + im(b) * cr
          re(b) = re(a) - vr; im(b) = im(a) - vi
          re(a) += vr; im(a) += vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Triangular-filterbank signal power for samples [from, until):
    * Hann-window (in the FRACTIONAL position i/n, i.e. continuous-time,
    * so two renders of the same cell at different rates see the same
    * taper), zero-pad to a power of two, FFT, then weight each bin's
    * |X_k|² by filter b's log-frequency triangle and normalize by N·M
    * (Parseval) — the result approximates the filter-weighted
    * per-sample power of the underlying continuous signal, independent
    * of the sample rate it was rendered at. */
  private[multimodal] def bandPowers(samples: Array[Float], from: Int,
      until: Int, rate: Int): Array[Double] = {
    val n = until - from
    var m = 1
    while (m < n) m <<= 1
    val re = new Array[Double](m)
    val im = new Array[Double](m)
    var i = 0
    while (i < n) {
      val w = 0.5 * (1 - math.cos(2 * math.Pi * i / n))
      re(i) = samples(from + i) * w
      i += 1
    }
    fft(re, im)
    val out = new Array[Double](Bands)
    val logEdges = Edges.map(math.log)
    var k = 1 // skip DC
    val half = m / 2
    while (k <= half) {
      val f = k.toDouble * rate / m
      if (f > Edges(0) && f < Edges(Edges.length - 1)) {
        val lf = math.log(f)
        val p = (re(k) * re(k) + im(k) * im(k)) / (n.toDouble * m)
        var b = 0
        while (b < Bands) {
          val lo = logEdges(b)
          val mid = logEdges(b + 1)
          val hi = logEdges(b + 2)
          val w =
            if (lf <= lo || lf >= hi) 0.0
            else if (lf < mid) (lf - lo) / (mid - lo)
            else (hi - lf) / (hi - mid)
          out(b) += p * w
          b += 1
        }
      }
      k += 1
    }
    out
  }

  /** 64-bit clip fingerprint: 16 overlapping fractional cell transitions
    * × 4 filter-pair Haitsma–Kalker signs — the sign of the energy
    * difference across both band and time, `(E(c,b)−E(c,b+1)) −
    * (E(c−1,b)−E(c−1,b+1)) > 0`. Cells overlap 50% (span 2/(Cells+1),
    * hop 1/(Cells+1) — the H–K frame/hop discipline): doubling the
    * samples per estimate halves the near-tie flips resampling drift
    * feeds on. Deterministic in (samples, rate); exactly invariant
    * under power-of-two gain (every energy, and hence every
    * difference, scales by exact FP exponent shifts). */
  def clipHash(clip: AudioCodec.Clip): Long = {
    val n = clip.samples.length
    var bits = 0L
    var prev: Array[Double] = null
    var c = 0
    while (c < Cells) {
      val from = (c.toLong * n / (Cells + 1)).toInt
      val until = math.max(from + 1, ((c + 2).toLong * n / (Cells + 1)).toInt)
      val e = bandPowers(clip.samples, from, math.min(until, n), clip.sampleRate)
      if (c > 0) {
        var b = 0
        while (b < BitsPerCell) {
          if ((e(b) - e(b + 1)) - (prev(b) - prev(b + 1)) > 0)
            bits |= 1L << ((c - 1) * BitsPerCell + b)
          b += 1
        }
      }
      prev = e
      c += 1
    }
    bits
  }

  /** media rows → (media_id, phash) through the REAL javax.sound decoder
    * — the [[PerceptualHash.hashes]] shape for the audio modality;
    * undecodable payloads yield null. Feed the result straight to
    * [[PerceptualHash.nearDupPairs]]. */
  def hashes(media: Dataset[Media.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio")
      .mapPartitions { rows =>
        // per-partition init: AudioSystem provider registry scan
        rows.map { r =>
          AudioCodec.decode(r.payload) match {
            case Some(clip) => (r.media_id, Some(clipHash(clip)))
            case None => (r.media_id, None)
          }
        }
      }
      .toDF("media_id", "phash")
  }
}
