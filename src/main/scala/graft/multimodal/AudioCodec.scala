package graft.multimodal

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset}

/** REAL audio codec over the JDK's built-in `javax.sound.sampled` (WAV/
  * AIFF/AU readers ship with Java 17 — no external libraries). Together
  * with [[ImageCodec]] this proves [[Media]]'s pipeline seams hold for a
  * second modality with an actual decoder: same row schema, same
  * iterator-to-iterator mapPartitions shape, same fixed-width feature
  * contract feeding the similarity operators unchanged.
  *
  * Decode failures (truncated/corrupt payloads) surface as NULL feature
  * rows rather than task aborts — the lenient path, mirroring
  * [[ImageCodec]] and the proto decoder (graft.ingest.ProtoWire).
  */
object AudioCodec {

  /** Decoded clip: mono PCM samples in [-1, 1] (channels averaged),
    * plus the source sample rate. */
  final case class Clip(samples: Array[Float], sampleRate: Int)

  /** payload → PCM clip, None on undecodable bytes. Handles any format
    * the JDK can convert to 16-bit signed PCM (covers standard WAV). */
  def decode(payload: Array[Byte]): Option[Clip] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val src = in.getFormat
        val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          src.getChannels * 2, src.getSampleRate, false)
        val pcm: AudioInputStream = AudioSystem.getAudioInputStream(fmt, in)
        try {
          val bytes = pcm.readAllBytes()
          val ch = fmt.getChannels
          val n = bytes.length / (2 * ch)
          if (n == 0) None
          else {
            val out = new Array[Float](n)
            var i = 0
            while (i < n) {
              var acc = 0f
              var c = 0
              while (c < ch) {
                val off = (i * ch + c) * 2
                val s = ((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort
                acc += s / 32768.0f
                c += 1
              }
              out(i) = acc / ch
              i += 1
            }
            Some(Clip(out, fmt.getSampleRate.toInt))
          }
        } finally pcm.close()
      } finally in.close()
    } catch { case _: Exception => None }

  /** Fixed-width temporal features: the clip is split into `cells`
    * equal time regions; each contributes (RMS energy, zero-crossing
    * rate), both in [0, 1] — the audio analogue of [[ImageCodec]]'s
    * grid-pooled features. Deterministic in the samples;
    * duration-independent (cells are fractional regions of the clip). */
  def cellFeatures(clip: Clip, cells: Int): Array[Float] = {
    val out = new Array[Float](cells * 2)
    val n = clip.samples.length
    var c = 0
    while (c < cells) {
      val from = (c.toLong * n / cells).toInt
      val until = math.max(from + 1, ((c + 1).toLong * n / cells).toInt)
      var sumSq = 0.0
      var zc = 0
      var i = from
      while (i < until && i < n) {
        val s = clip.samples(i)
        sumSq += s.toDouble * s
        if (i > from &&
            (s > 0f) != (clip.samples(i - 1) > 0f)) zc += 1
        i += 1
      }
      val len = math.max(1, math.min(until, n) - from)
      out(c * 2) = math.sqrt(sumSq / len).toFloat
      out(c * 2 + 1) = zc.toFloat / len
      c += 1
    }
    out
  }

  /** Feature extraction over media rows with the REAL decoder — identical
    * pipeline shape to [[Media.extractFeatures]] / [[ImageCodec
    * .extractImageFeatures]]: iterator-to-iterator mapPartitions,
    * per-partition codec init, fixed-width output, with (decoded,
    * sample_rate, n_samples) metadata recovered from the actual bytes.
    * Undecodable payloads yield decoded=false and a null feature vector.
    */
  def extractAudioFeatures(media: Dataset[Media.MediaRow],
                           cells: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio")
      .mapPartitions { rows =>
        // per-partition init point: AudioSystem scans its provider
        // registry once here, not per row
        rows.map { r =>
          decode(r.payload) match {
            case Some(clip) =>
              (r.media_id, true, clip.sampleRate, clip.samples.length,
                cellFeatures(clip, cells))
            case None =>
              (r.media_id, false, 0, 0, null: Array[Float])
          }
        }
      }
      .toDF("media_id", "decoded", "sample_rate", "n_samples", "features")
  }
}
