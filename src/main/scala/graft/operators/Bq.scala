package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.BqExpressions

/** Binary quantization (1-bit per dimension) — the 32× end of the
  * quantizer family (PQ 16×, SQ8 4×), the shape modern vector stores
  * ship as "BQ": bit d = x[d] > median[d], distance = XOR+popcount
  * hamming over ⌈dim/8⌉-byte codes, then exact rerank of a shortlist.
  * One bit per dimension is exactly the axis-aligned special case of
  * sign-hyperplane hashing, but used as a SCAN payload (every code
  * scored, cheapest possible distance) rather than [[Lsh]]'s bucketed
  * candidate generation — the two compose rather than compete.
  *
  * Training is the exact per-dimension MEDIAN, computed in bounded
  * state by the two-pass bit-prefix histogram below (order-free ⇒ the
  * model is bit-deterministic under any partitioning, the [[Sq.train]]
  * discipline). The median centers each bit — maximum-entropy codes —
  * where a mean threshold lets a skewed dimension waste its bit.
  *
  * At 100 TB: the codes table is dim/8 bytes per vector (64-dim: 8
  * bytes — the corpus fits where one float32 dimension used to), the
  * scan is map-only with per-partition TopK pruning
  * (TakeOrdered-style via the row_number window), and only the
  * shortlist's float vectors are ever fetched for rerank. */
object Bq {

  final case class BqModel(thresholds: Array[Double]) {
    def dim: Int = thresholds.length
  }

  /** Exact per-dimension LOWER MEDIAN (the smallest v with
    * count(x ≤ v) ≥ ⌈n/2⌉) in BOUNDED state — the two-pass discipline
    * (the Misra–Gries/exact-heavy-hitters shape), because Spark's exact
    * `percentile` buffers one entry per DISTINCT VALUE per group, which
    * detonates on continuous floats at corpus scale (measured 60 s at
    * 1M×64 where this takes one partial-aggregated pass + one
    * bucket-bounded pass):
    *
    *  - floats map to their order-preserving bit pattern (the radix
    *    trick: flip all bits of negatives, the sign bit of positives);
    *  - pass 1 histograms the TOP 16 bits per dim (≤ dim·65536 counter
    *    rows, partial-aggregated map-side) and the driver locates each
    *    dim's median bucket by cumulative count;
    *  - pass 2 counts full keys ONLY inside each dim's median bucket —
    *    structurally ≤ 65536 distinct lower-bit keys per dim, whatever
    *    the corpus looks like (an all-constant dim is 1 row).
    *
    * Both passes are deterministic aggregations of exact integer
    * counts ⇒ the model is bit-identical under any partitioning. */
  def train(embeddings: DataFrame): BqModel = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // order-preserving unsigned 32-bit key of the float bit pattern
    // (radix trick), via a typed map — one cheap map-only pass per use
    def keyed = embeddings
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .as[(Int, Float)]
      .map { case (pos, x) =>
        val bits = java.lang.Float.floatToIntBits(x)
        val k = (if (bits < 0) ~bits else bits ^ 0x80000000).toLong &
          0xffffffffL
        (pos, k)
      }.toDF("pos", "k")
    val n = embeddings.count()
    val target = (n + 1) / 2 // ceil(n/2)
    // pass 1: 16-bit prefix histogram per dim
    val hist = keyed
      .groupBy(col("pos"), (col("k") / lit(65536L)).cast("long").as("b"))
      .agg(count(lit(1)).as("c"))
      .as[(Int, Long, Long)].collect()
    val dims = hist.map(_._1).max + 1
    val medianBucket = new Array[Long](dims)
    val rankInBucket = new Array[Long](dims)
    hist.groupBy(_._1).foreach { case (pos, rows) =>
      var cum = 0L
      rows.sortBy(_._2).foreach { case (_, b, c) =>
        if (cum < target && cum + c >= target) {
          medianBucket(pos) = b
          rankInBucket(pos) = target - cum
        }
        cum += c
      }
    }
    // pass 2: full-key counts inside each dim's median bucket only
    // (structurally <= 65536 distinct lower keys per dim)
    val buckets = medianBucket.zipWithIndex
      .map { case (b, pos) => (pos, b) }.toSeq.toDF("bpos", "b")
    val inBucket = keyed
      .join(broadcast(buckets), col("pos") === col("bpos") &&
        (col("k") / lit(65536L)).cast("long") === col("b"))
      .groupBy(col("pos"), col("k"))
      .agg(count(lit(1)).as("c"))
      .as[(Int, Long, Long)].collect()
    val medians = new Array[Double](dims)
    inBucket.groupBy(_._1).foreach { case (pos, rows) =>
      var cum = 0L
      var found = false
      rows.sortBy(_._2).foreach { case (_, k, c) =>
        if (!found) {
          cum += c
          if (cum >= rankInBucket(pos)) {
            // undo the order-preserving transform
            val raw =
              if (k < 0x80000000L) ~k & 0xffffffffL
              else k ^ 0x80000000L
            medians(pos) = java.lang.Float
              .intBitsToFloat(raw.toInt).toDouble
            found = true
          }
        }
      }
    }
    BqModel(medians)
  }

  /** (vec_id, code BINARY) — map-only, one kernel call per row. */
  def encode(embeddings: DataFrame, model: BqModel): DataFrame =
    embeddings.select(col("vec_id"),
      BqExpressions.encode(col("embedding"), model.thresholds).as("code"))

  /** Shortlist by symmetric hamming: queries are encoded through the
    * same thresholds and broadcast WITH their codes precomputed (one
    * encode per query, not per scored pair). Ties (hamming is coarse —
    * ≤ dim+1 distinct values) break by vec_id for determinism. */
  def search(codes: DataFrame, model: BqModel, queries: DataFrame,
      topK: Int): DataFrame = {
    val q = queries.select(col("q_id"),
      BqExpressions.encode(col("qvec"), model.thresholds).as("qcode"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("hamming").asc, col("vec_id").asc)
    codes.join(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("hamming",
        BqExpressions.hamming(col("code"), col("qcode")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("hamming"))
      .orderBy("q_id", "rnk")
  }

  /** Production shape: hamming shortlist → exact rerank of only the
    * shortlisted embeddings ([[Pq.rerank]]'s contract). Size the
    * shortlist to cover the hamming tie-set: 1-bit codes resolve which
    * neighborhood, not the ranking inside it (BqSpec pins this). */
  def searchRerank(codes: DataFrame, model: BqModel, corpus: DataFrame,
      queries: DataFrame, topK: Int, shortlist: Int): DataFrame =
    Pq.rerank(search(codes, model, queries, shortlist)
      .select(col("q_id"), col("vec_id")), corpus, queries, topK)

  def writeBq(model: BqModel, codes: DataFrame, dir: String): Unit = {
    codes.write.mode("overwrite").parquet(s"$dir/codes")
    val spark = codes.sparkSession
    import spark.implicits._
    model.thresholds.zipWithIndex.map { case (t, d) => (d, t) }
      .toSeq.toDF("pos", "thr")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/bq_thresholds")
  }

  def loadBq(spark: org.apache.spark.sql.SparkSession, dir: String)
      : (BqModel, DataFrame) = {
    import spark.implicits._
    val thr = spark.read.parquet(s"$dir/bq_thresholds")
      .orderBy("pos").select("thr").as[Double].collect()
    (BqModel(thr), spark.read.parquet(s"$dir/codes"))
  }
}
