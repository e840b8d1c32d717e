package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Video near-dup — the multi-frame arm of the multimodal dedup cascade.
  * A clip's signature is the SEQUENCE of per-frame perceptual hashes
  * ([[PerceptualHash.dHash]] over [[VideoCodec]]'s composited,
  * stride-sampled frames): re-encoded/resized copies keep each frame's
  * hash within a small hamming radius, and stride sampling by FRACTIONAL
  * position (slot k samples frame k·total/n) keeps slots aligned even
  * when a copy was trimmed by a few frames.
  *
  * The pair search is the [[PerceptualHash.nearDupPairs]] band
  * discipline lifted to sequences: frame hashes explode to (slot, band,
  * band_bits) buckets, the self-join runs PER (slot, band) bucket, and
  * the pigeonhole guarantee applies per slot — any aligned frame pair
  * within `maxHamming ≤ nBands − 1` shares an intact band, so
  * `matched_slots` (the number of aligned sample positions within the
  * radius) is EXACT, not approximate. Two clips are near-dups when
  * `matched_slots ≥ minMatched`.
  *
  * At 100 TB: signatures are 8·nFrames bytes per clip, payloads never
  * shuffle, and the join is bucketed by (slot, band, band_bits) — the
  * same never-all-pairs shape as every other dedup family. Slot is part
  * of the bucket key, so cross-slot pairs (frame 0 of A vs frame 7 of
  * B) are never even generated.
  */
object VideoFingerprint {

  /** media rows → (media_id, slot, fhash) through the REAL multi-frame
    * decoder: stride-sample `nFrames` composited frames, dHash each
    * directly (no re-encode round-trip). Undecodable payloads yield
    * zero rows — the [[VideoCodec.sampleFrames]] lenient contract. */
  def frameHashes(media: Dataset[Media.MediaRow],
      nFrames: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .mapPartitions { rows =>
        // per-partition init: ImageIO reader registry scan
        rows.flatMap { r =>
          VideoCodec.decodeFrames(r.payload) match {
            case Some(frames) =>
              VideoCodec.strideIndices(frames.size, nFrames)
                .zipWithIndex.map { case (fi, slot) =>
                  (r.media_id, slot, PerceptualHash.dHash(frames(fi)))
                }
            case None => Seq.empty
          }
        }
      }
      .toDF("media_id", "slot", "fhash")
  }

  /** Exact slot-aligned near-dup pairs over (media_id, slot, fhash):
    * for every clip pair sharing ≥ `minMatched` sample positions whose
    * frame hashes are within `maxHamming`, emit (id_a, id_b,
    * matched_slots). Banding per slot keeps the join bucketed; the
    * per-slot pigeonhole (maxHamming ≤ 64/bandBits − 1) makes the
    * matched-slot count exact. */
  def nearDupPairs(frameHashes: DataFrame, bandBits: Int = 16,
      maxHamming: Int = 3, minMatched: Int = 6): DataFrame = {
    val nBands = 64 / bandBits
    require(64 % bandBits == 0, s"bandBits $bandBits must divide 64")
    require(maxHamming <= nBands - 1,
      s"maxHamming $maxHamming breaks the pigeonhole guarantee at " +
        s"$nBands bands (max ${nBands - 1})")
    val mask = (1L << bandBits) - 1
    val h = frameHashes.select(col("media_id"), col("slot"), col("fhash"))
      .localCheckpoint()
    val bands = h.select(col("media_id"), col("slot"), col("fhash"),
        posexplode(expr(
          s"""transform(sequence(0, ${nBands - 1}),
             |  b -> shiftright(fhash, int(b) * $bandBits) & ${mask}L)"""
            .stripMargin)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_bits"))
    val slotPairs = bands.select(col("slot"), col("band"), col("band_bits"),
        col("media_id").as("id_a"), col("fhash").as("h_a"))
      .join(bands.select(col("slot"), col("band"), col("band_bits"),
        col("media_id").as("id_b"), col("fhash").as("h_b")),
        Seq("slot", "band", "band_bits"))
      .filter(col("id_a") < col("id_b"))
      .filter(expr("bit_count(h_a ^ h_b)") <= maxHamming)
      .select("id_a", "id_b", "slot")
      .distinct() // a close pair can share several intact bands per slot
    slotPairs.groupBy("id_a", "id_b")
      .agg(count("*").as("matched_slots"))
      .filter(col("matched_slots") >= minMatched)
      .orderBy("id_a", "id_b")
  }
}
