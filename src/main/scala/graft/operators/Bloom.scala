package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter decontamination — the 100 TB shape of the benchmark-
  * contamination check (Bloom 1970, "Space/time trade-offs in hash
  * coding with allowable errors", CACM 13(7)).
  *
  * q_contamination broadcasts the benchmark n-gram set as STRINGS —
  * right while the set is small, but a real held-out suite at corpus
  * scale is ~10⁸ n-grams (gigabytes of strings: dead as a broadcast).
  * The Bloom filter compresses membership to m BITS with a bounded,
  * measurable false-positive rate and NO false negatives — so the
  * decontamination semantics ("flag every doc sharing an n-gram, maybe
  * a few extra") survive the scale-up: m = 2³³ bits carries 10⁸ grams
  * at k = 4 under a ~10⁻⁴ FP rate in 1 GB — broadcastable where the
  * strings are not.
  *
  * Spark shape — all built-ins, no UDF, no driver bit array:
  *  - BUILD is one aggregation: each gram explodes to its k probe bits
  *    (xxhash64 seeded by probe index), bits group into 64-bit words,
  *    `bit_or` folds them — bitwise OR is commutative/associative, so
  *    partial aggregation map-side-combines and shard filters MERGE for
  *    free (the count-min discipline). The filter IS a DataFrame of
  *    ≤ m/64 (word_idx, bits) rows.
  *  - PROBE is a broadcast join on word_idx: the corpus side computes
  *    its k probe positions map-side, joins the word rows, and ANDs the
  *    k indicator bits with a min aggregate. A LEFT join with a 0
  *    fallback, for the Sketch.estimate reason: an absent word row
  *    means the bit is 0, and an inner join would AND over a SUBSET of
  *    the k probes.
  */
object Bloom {

  /** Build the filter over a single-column gram frame: (word_idx, bits)
    * rows, at most mBits/64 of them. mBits must be a multiple of 64. */
  def build(grams: DataFrame, gramCol: String, mBits: Long, k: Int)
      : DataFrame = {
    require(mBits % 64 == 0, s"mBits $mBits not a multiple of 64")
    grams
      .select(col(gramCol).as("g"),
        explode(sequence(lit(0), lit(k - 1))).as("r"))
      .select(pmod(xxhash64(col("r"), col("g")), lit(mBits)).as("bit"))
      .groupBy((col("bit") / 64).cast("long").as("word_idx"))
      .agg(expr("bit_or(shiftleft(1L, int(bit % 64)))").as("bits"))
  }

  /** Grams from `cands` that MIGHT be in the built set: every truly
    * present gram survives (no false negatives); a false positive slips
    * through at the filter's ε. Keeps all other columns of `cands`. */
  def mightContain(filter: DataFrame, cands: DataFrame, gramCol: String,
      mBits: Long, k: Int): DataFrame = {
    val probed = cands
      .withColumn("r", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("bit", pmod(xxhash64(col("r"), col(gramCol)), lit(mBits)))
      .withColumn("word_idx", (col("bit") / 64).cast("long"))
      .join(broadcast(filter), Seq("word_idx"), "left")
      .withColumn("hit",
        expr("int(shiftright(coalesce(bits, 0L), int(bit % 64)) & 1L)"))
    val others = cands.columns.filterNot(_ == gramCol).map(col)
    probed
      .groupBy(col(gramCol) +: others: _*)
      .agg(min(col("hit")).as("all_set"))
      .filter(col("all_set") === 1)
      .drop("all_set")
  }
}
