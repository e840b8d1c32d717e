package graft.multimodal

import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual image hashing + banded hamming near-dup join — the
  * multimodal arm of the dedup cascade. Text dedups by shingle/minhash,
  * embeddings by cosine; images dedup by PERCEPTUAL fingerprints that
  * survive the transformations web-crawled copies actually undergo
  * (re-encoding, resizing, mild brightness shifts):
  *
  *  - dHash (difference hash): 9×8 grayscale grid (the fractional-cell
  *    [[ImageCodec.gridFeatures]] pooling, so it is resolution-
  *    independent by construction), bit = right cell brighter than
  *    left. Gradient SIGNS survive monotone luminance changes and
  *    resampling.
  *  - pHash (DCT hash, Zauner 2010): 32×32 grayscale grid → 2-D
  *    DCT-II → the 8×8 low-frequency block minus DC, bit = coefficient
  *    above the block median. Low-frequency structure survives
  *    compression noise better still.
  *
  * Both are pure JDK (the grid pooling is ImageCodec's; the DCT is 30
  * lines of cosines), 64-bit, deterministic in the pixels.
  *
  * The pair search is NEVER all-pairs: [[nearDupPairs]] reuses the
  * SimHash band discipline (queries/Pipeline simhashBanded, the r6
  * measured shape) — split the 64-bit hash into `64/bandBits` bands,
  * self-join per (band, band_bits) bucket, exact hamming filter. The
  * pigeonhole guarantee: any pair within `maxHamming ≤ nBands − 1`
  * shares at least one intact band, so the banded join finds EXACTLY
  * the pairs an all-pairs scan would — at bucket-join cost. At 100 TB
  * the hash table is 8 bytes/image and the join shuffles hash-sized
  * rows bucketed 2^bandBits ways per band; payloads never shuffle.
  */
object PerceptualHash {

  /** Luminance grid via the fractional-cell RGB pooling (BT.601). */
  private def grayGrid(img: BufferedImage, gx: Int, gy: Int): Array[Double] = {
    val rgb = ImageCodec.gridFeatures(img, gx, gy)
    Array.tabulate(gx * gy) { c =>
      0.299 * rgb(c * 3) + 0.587 * rgb(c * 3 + 1) + 0.114 * rgb(c * 3 + 2)
    }
  }

  /** 64-bit difference hash: 9×8 grid, bit (y·8+x) = cell (x+1, y)
    * brighter than cell (x, y). */
  def dHash(img: BufferedImage): Long = {
    val g = grayGrid(img, 9, 8)
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x + 1) > g(y * 9 + x)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** 64-bit DCT hash: 32×32 grid → DCT-II → 8×8 low-frequency block,
    * bit = coefficient above the median of the 63 non-DC coefficients
    * (the DC bit is always 0 — it carries only global brightness). */
  def pHash(img: BufferedImage): Long = {
    val n = 32
    val g = grayGrid(img, n, n)
    // 2-D DCT-II of the top-left 8×8 block only (64·n² cosine terms)
    val coeffs = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < n) {
          val cx = math.cos((2 * x + 1) * u * math.Pi / (2 * n))
          var y = 0
          while (y < n) {
            s += g(y * n + x) * cx *
              math.cos((2 * y + 1) * v * math.Pi / (2 * n))
            y += 1
          }
          x += 1
        }
        coeffs(v * 8 + u) = s
        v += 1
      }
      u += 1
    }
    val ac = coeffs.drop(1).sorted
    val median = (ac(30) + ac(31)) / 2.0
    var bits = 0L
    var i = 1
    while (i < 64) {
      if (coeffs(i) > median) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** media rows → (media_id, phash) through the REAL decoder (the
    * [[ImageCodec.extractImageFeatures]] partition-mapped shape;
    * undecodable payloads yield null). `algo` = "dhash" | "phash". */
  def hashes(media: Dataset[Media.MediaRow],
      algo: String = "dhash"): DataFrame = {
    import media.sparkSession.implicits._
    val hashFn: BufferedImage => Long = algo match {
      case "dhash" => dHash
      case "phash" => pHash
      case other => sys.error(s"unknown perceptual hash algo: $other")
    }
    media.filter(_.kind == "image")
      .mapPartitions { rows =>
        rows.map { r =>
          ImageCodec.decode(r.payload) match {
            case Some(img) => (r.media_id, Some(hashFn(img)))
            case None => (r.media_id, None)
          }
        }
      }
      .toDF("media_id", "phash")
  }

  /** Exact hamming-≤-`maxHamming` pairs over (media_id, phash) via the
    * banded bucket join. Requires maxHamming ≤ 64/bandBits − 1 (the
    * pigeonhole bound that makes banding exact, not approximate). */
  def nearDupPairs(hashes: DataFrame, bandBits: Int = 16,
      maxHamming: Int = 3): DataFrame = {
    val nBands = 64 / bandBits
    require(64 % bandBits == 0, s"bandBits $bandBits must divide 64")
    require(maxHamming <= nBands - 1,
      s"maxHamming $maxHamming breaks the pigeonhole guarantee at " +
        s"$nBands bands (max ${nBands - 1})")
    val mask = (1L << bandBits) - 1
    val h = hashes.filter(col("phash").isNotNull)
      .select(col("media_id"), col("phash")).localCheckpoint()
    val bands = h.select(col("media_id"), col("phash"),
        posexplode(expr(
          s"""transform(sequence(0, ${nBands - 1}),
             |  b -> shiftright(phash, int(b) * $bandBits) & ${mask}L)"""
            .stripMargin)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_bits"))
    bands.select(col("band"), col("band_bits"),
        col("media_id").as("id_a"), col("phash").as("h_a"))
      .join(bands.select(col("band"), col("band_bits"),
        col("media_id").as("id_b"), col("phash").as("h_b")),
        Seq("band", "band_bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(h_a ^ h_b)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy("id_a", "id_b")
  }
}
