package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary: the count-min sketch and its applications", J.
  * Algorithms 55(1)) over a token stream — the fixed-memory path for
  * frequency stats at corpus scale.
  *
  * Exact token counts at 100 TB shuffle the whole vocabulary (fine for
  * bounded vocab, detonates on open token spaces — URLs, n-grams,
  * user ids). The sketch is d hash rows × w buckets of counters:
  * per-partition partial aggregation combines map-side, the shuffle
  * carries AT MOST d·w rows per partition regardless of corpus size,
  * and sketches of corpus shards MERGE by bucketwise addition — the
  * associative shape Spark's partial/final aggregation already is.
  * Estimates are overestimates (never under), off by at most ε·N with
  * ε = e/w at probability 1−(1/e)^d per query — the classic trade.
  *
  * Everything is built-ins: xxhash64(seed-column, token) for the d
  * row-hashes, one groupBy for the sketch, one broadcast join for
  * point estimates.
  */
object Sketch {

  /** Build the sketch: (r, bucket, c) rows, at most d·w of them.
    * `tokens` is any single-column frame of string tokens. */
  def countMin(tokens: DataFrame, tokenCol: String, d: Int, w: Int)
      : DataFrame =
    tokens
      .select(col(tokenCol).as("token"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .groupBy(col("r"), pmod(xxhash64(col("r"), col("token")), lit(w))
        .as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Point estimates for candidate tokens: est(t) = min over the d rows
    * of the t-bucket counter. The sketch side is d·w rows — model-state
    * sized — and broadcast; the candidate side never shuffles. The join
    * is LEFT with a 0 fallback: a candidate whose bucket has no sketch
    * row has a zero counter there, and dropping that row (inner join)
    * would take the min over a SUBSET of the d counters — inflating the
    * estimate of an absent token to whatever collides in its other
    * rows, or losing the token from the output entirely. */
  def estimate(sketch: DataFrame, candidates: DataFrame, tokenCol: String,
      d: Int, w: Int): DataFrame = {
    val cand = candidates
      .select(col(tokenCol).as("token"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("bucket", pmod(xxhash64(col("r"), col("token")), lit(w)))
    cand.join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  // ------------------------------------------------------------------
  // HyperLogLog — cardinality, completing the sketch family triad
  // (counts: count-min; quantiles: DDSketch; distincts: HLL)
  // ------------------------------------------------------------------

  /** HyperLogLog registers (Flajolet et al. 2007, "HyperLogLog: the
    * analysis of a near-optimal cardinality estimation algorithm",
    * AofA) as a PERSISTABLE, MERGEABLE table — what Spark's built-in
    * `approx_count_distinct` cannot give you: registers that land in
    * parquet, merge across runs/shards by bucketwise MAX (commutative,
    * order-free — the same contract as the other two sketches), and
    * answer later without the raw data.
    *
    * All built-ins: bucket = low p bits of xxhash64, rho = position of
    * the first set bit of the remaining 64−p (via length(bin(w)) — a
    * positive long's binary string length IS floor(log2)+1). At most
    * m = 2^p rows ever shuffle per partition; standard error
    * ≈ 1.04/√m (p=12: ~1.6%).
    */
  def hll(tokens: DataFrame, tokenCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"hll needs 4 <= p <= 16, got $p")
    val m = 1 << p
    val h = xxhash64(col(tokenCol))
    val w = shiftrightunsigned(h, p)
    val rho = when(w === 0L, lit(64 - p + 1))
      .otherwise(lit(64 - p + 1) - length(bin(w)))
    tokens
      .select(pmod(h, lit(m)).cast("int").as("bucket"), rho.as("rho"))
      .groupBy("bucket").agg(max("rho").as("rho"))
  }

  /** Estimate from a register table (≤ 2^p rows — model state): the
    * classic alpha·m²/Σ2^−rho with the small-range linear-counting
    * correction. Driver math over collected registers, fixed formula —
    * deterministic. */
  def hllEstimate(registers: DataFrame, p: Int): Long = {
    val spark = registers.sparkSession
    import spark.implicits._
    val m = 1 << p
    val regs = registers.select(col("bucket"), col("rho"))
      .as[(Int, Int)].collect().toMap
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var b = 0
    while (b < m) {
      val rho = regs.getOrElse(b, 0)
      if (rho == 0) zeros += 1
      sum += math.pow(2.0, -rho)
      b += 1
    }
    val e = alpha * m * m / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.rint(corrected).toLong
  }

  // ------------------------------------------------------------------
  // DDSketch — quantiles with the same fixed-memory/mergeable shape
  // ------------------------------------------------------------------

  /** DDSketch (Masson, Rim & Lee 2019, "DDSketch: a fast and fully-
    * mergeable quantile sketch with relative-error guarantees", VLDB
    * 12(12)) over a positive value column — the quantile analogue of
    * the count-min path above, chosen over KLL/t-digest deliberately:
    * its buckets have FIXED log-scaled boundaries (bucket(x) =
    * ⌈log_γ x⌉, γ = (1+α)/(1−α)), so a sketch is just (bucket, count)
    * rows and MERGE is bucketwise addition — commutative, associative,
    * and independent of partition/merge order. KLL's randomized
    * compaction makes the sketch content depend on the order partials
    * meet, which breaks this repo's determinism contract; DDSketch's
    * answer is bit-stable for a given input no matter how Spark
    * schedules the aggregation.
    *
    * Memory/shuffle: the shuffle carries at most one row per occupied
    * bucket per partition — ⌈log_γ(max/min)⌉ buckets total (α = 1%:
    * ~2.3k buckets for a 10²⁰ dynamic range), regardless of row count.
    * Guarantee: the estimate for the rank-⌈qN⌉ value x has
    * |est − x| ≤ α·x (relative error, not rank error — the right
    * contract for long-tailed corpus stats). Values ≤ 0 are excluded
    * by definition (log domain); count them separately if they matter.
    */
  /** Misra–Gries summary (Misra & Gries 1982; mergeability per Agarwal
    * et al. 2012, "Mergeable summaries", PODS): ≤ k counters per
    * partition, maintained with the classic decrement-all step
    * (amortized O(1) — at most N/k decrement events, each O(k)), then
    * ONE aggregation over the ≤ k·partitions summary rows. The merged
    * counts c_low underestimate true frequencies by AT MOST N/(k+1)
    * (per-partition errors sum to Σ nᵢ/(k+1) = N/(k+1)), so every item
    * with true frequency above N/(k+1) is guaranteed present — the
    * deterministic counterpart to [[countMin]]'s probabilistic
    * overestimates, with per-item LOWER bounds instead of upper.
    *
    * mapPartitions is the honest shape here (the d-tier of the build
    * guidance): MG is inherently a sequential bounded-counter scan; the
    * state is k entries per task, shuffle volume ≤ k rows per
    * partition. NOTE the c_low values (not the guarantee) depend on the
    * partitioning — downstream users must either threshold with the
    * bound ([[exactHeavyHitters]]) or treat c_low as a lower bound. */
  def mgSummary(tokens: DataFrame, tokenCol: String, k: Int): DataFrame = {
    require(k > 0, s"mgSummary needs k > 0: $k")
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.select(col(tokenCol).cast("string")).as[String]
      .mapPartitions { it =>
        // BOXED values: a HashMap[String, Long] with Scala's primitive
        // Long makes get()'s missing-key null unbox to 0 and the null
        // check vacuous — every token would count exactly, no eviction
        val counters = new java.util.HashMap[String, java.lang.Long](k * 2)
        it.foreach { t =>
          val cur = counters.get(t)
          if (cur != null)
            counters.put(t, java.lang.Long.valueOf(cur.longValue() + 1L))
          else if (counters.size < k)
            counters.put(t, java.lang.Long.valueOf(1L))
          else {
            val dead = new scala.collection.mutable.ArrayBuffer[String]
            val e = counters.entrySet().iterator()
            while (e.hasNext) {
              val kv = e.next()
              if (kv.getValue.longValue() == 1L) dead += kv.getKey
              else kv.setValue(java.lang.Long.valueOf(
                kv.getValue.longValue() - 1L))
            }
            dead.foreach(counters.remove)
          }
        }
        import scala.jdk.CollectionConverters._
        counters.entrySet().iterator().asScala
          .map(kv => (kv.getKey, kv.getValue.longValue()))
      }
      .toDF("token", "c_low")
      .groupBy("token").agg(sum(col("c_low")).as("c_low"))
      .withColumnRenamed("token", tokenCol)
  }

  /** EXACT heavy hitters (frequency·den ≥ N·num) in bounded memory —
    * the classic two-pass composition: pass 1, an MG summary with
    * k = ⌈den/num⌉ counters whose guarantee makes the candidate set a
    * SUPERSET of the true hitters (kept by the integer-exact upper
    * bound (c_low·(k+1) + N)·den ≥ num·N·(k+1)); pass 2, exact counts
    * for ONLY the candidates (broadcast semi-sized join — the
    * vocabulary-sized shuffle of a naive exact groupBy never happens).
    * Output is EXACT and partitioning-independent, so it certifies
    * against the same oracle as the exact one-pass query. */
  def exactHeavyHitters(tokens: DataFrame, tokenCol: String,
      num: Int, den: Int): DataFrame = {
    require(num > 0 && den >= num, s"threshold $num/$den not in (0,1]")
    val k = (den + num - 1) / num
    // three consumers read the token stream (the count, the MG pass,
    // the exact-count semi join) — checkpoint the projected column once
    // so the upstream tokenization/explode runs once, not three times
    // (the multi-consumer localCheckpoint discipline)
    val toks = tokens.select(tokenCol).localCheckpoint()
    val n = toks.count()
    val cands = mgSummary(toks, tokenCol, k)
      .filter((col("c_low") * (k + 1) + n) * den >= num * n * (k + 1))
      .select(tokenCol)
    toks.join(broadcast(cands), Seq(tokenCol), "left_semi")
      .groupBy(tokenCol).agg(count(lit(1)).as("c"))
      .filter(col("c") * den >= num * n)
  }

  // ------------------------------------------------------------------
  // KMV / theta — distinct counts with SET OPERATIONS (what HLL
  // registers cannot give you: intersections and Jaccard between
  // corpus snapshots, the overlap questions decontamination and
  // mix-design ask)
  // ------------------------------------------------------------------

  /** KMV bottom-k sketch (Beyer et al. 2007, "On synopses for distinct-
    * value estimation under multiset operations", SIGMOD; the theta-
    * sketch family of Dasgupta et al. 2016): the k smallest DISTINCT
    * xxhash64 values of the column. Unlike HLL's lossy registers the
    * sketch is an exact SET — deterministic, partitioning-independent
    * (the k smallest of a set is the k smallest of its parts' k
    * smallest), and closed under union WITHOUT error accumulation:
    * kmvMerge(kmv(A), kmv(B)) == kmv(A ∪ B) bit-for-bit, which
    * SketchSpec pins as an identity.
    *
    * Shape: per-partition bounded state (a ≤ k-entry TreeSet in
    * mapPartitions — the [[mgSummary]] discipline), then one tiny
    * (≤ k·partitions rows) merge. Shuffle volume is ≤ k rows per
    * partition regardless of corpus size. Relative SE ≈ 1/√(k−2)
    * (k = 1024: ~3%). If the column has ≤ k distinct values the sketch
    * IS the distinct hash set and every downstream estimate is exact. */
  def kmv(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k > 1, s"kmv needs k > 1: $k")
    val spark = items.sparkSession
    import spark.implicits._
    items.select(xxhash64(col(itemCol)).as("h")).as[Long]
      .mapPartitions { it =>
        val bottom = new java.util.TreeSet[java.lang.Long]()
        it.foreach { h =>
          if (bottom.size < k) bottom.add(h)
          else if (h < bottom.last()) {
            if (bottom.add(h)) bottom.pollLast()
          }
        }
        import scala.jdk.CollectionConverters._
        bottom.iterator().asScala.map(_.longValue())
      }
      .toDF("h").distinct().orderBy("h").limit(k)
  }

  /** Lossless union merge: the k smallest of the two sketches' union —
    * exactly kmv(A ∪ B) when the inputs are kmv(A) and kmv(B). */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.union(b).distinct().orderBy("h").limit(k)

  /** Hash value → its fraction of the uniform signed-64 space. */
  private def hashFraction(h: Long): Double = h.toDouble / 18446744073709551616.0 + 0.5

  /** Distinct-count estimate: exact row count when the sketch holds
    * < k hashes (the column had ≤ k distincts), else the unbiased
    * (k−1)/θ with θ = the kth smallest hash's fraction of the hash
    * space. Driver math over ≤ k longs — model state. */
  def kmvEstimate(sketch: DataFrame, k: Int): Double = {
    val spark = sketch.sparkSession
    import spark.implicits._
    val hs = sketch.select(col("h")).as[Long].collect().sorted
    if (hs.length < k) hs.length.toDouble
    else (k - 1) / hashFraction(hs.last)
  }

  /** Theta intersection: restrict both sketches STRICTLY below the
    * smaller cutoff θ = min(θ_a, θ_b); every retained hash is a uniform
    * sample of A ∩ B at rate θ, so |A ∩ B| ≈ |retained| / θ. Strict
    * inequality matches [[kmvEstimate]]'s (k−1)/θ convention — the
    * cutoff hash itself is the sample BOUNDARY, not a sample member;
    * including it (the first cut's `<=`) biased the estimate up
    * whenever the cutoff hash was shared. Exact when both sketches are
    * exact (< k rows — then there is no cutoff and nothing is
    * excluded). This is the operation HLL cannot express — registers
    * destroy membership. */
  def kmvIntersectEstimate(a: DataFrame, b: DataFrame, k: Int): Double = {
    val spark = a.sparkSession
    import spark.implicits._
    val ha = a.select(col("h")).as[Long].collect().sorted
    val hb = b.select(col("h")).as[Long].collect().sorted
    (ha.length >= k, hb.length >= k) match {
      case (false, false) => // both exact: plain set intersection
        val sa = ha.toSet
        hb.count(sa).toDouble
      case pair =>
        val cutoff = pair match {
          case (true, false) => ha.last
          case (false, true) => hb.last
          case _             => math.min(ha.last, hb.last)
        }
        val sa = ha.iterator.takeWhile(_ < cutoff).toSet
        val matches = hb.iterator.takeWhile(_ < cutoff).count(sa)
        matches / hashFraction(cutoff)
    }
  }

  /** Jaccard |A∩B| / |A∪B| via the bottom-k of the union (the classic
    * one-permutation MinHash estimator): U = k smallest of the merged
    * sketches, J ≈ |U ∩ A ∩ B| / |U|. Exact when the UNION has ≤ k
    * distincts (then U is the whole union, not a sample). */
  def kmvJaccard(a: DataFrame, b: DataFrame, k: Int): Double = {
    val spark = a.sparkSession
    import spark.implicits._
    val ha = a.select(col("h")).as[Long].collect().toSet
    val hb = b.select(col("h")).as[Long].collect().toSet
    val u = (ha ++ hb).toSeq.sorted.take(k)
    if (u.isEmpty) 0.0
    else u.count(h => ha(h) && hb(h)).toDouble / u.size
  }

  def ddSketch(values: DataFrame, valueCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"ddSketch needs 0 < alpha < 1: $alpha")
    val gamma = (1 + alpha) / (1 - alpha)
    values
      .filter(col(valueCol).cast("double") > 0d)
      .select(ceil(log(gamma, col(valueCol).cast("double")))
        .cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
  }

  /** Quantile estimates at ranks ⌈q·N⌉ for each q in `qs` (0 < q ≤ 1).
    * The sketch is model-state sized, so the cumulative sum runs as a
    * broadcast range self-join (no single-partition window) and the
    * whole query is a handful of bucket-count-sized operations. */
  def ddQuantiles(sketch: DataFrame, alpha: Double,
      qs: Seq[Double]): DataFrame = {
    require(qs.forall(q => q > 0 && q <= 1), s"quantiles must be in (0,1]: $qs")
    val spark = sketch.sparkSession
    import spark.implicits._
    val gamma = (1 + alpha) / (1 - alpha)
    val cum = sketch.as("a")
      .join(broadcast(sketch.select(col("bucket").as("b2"),
        col("c").as("c2"))), col("b2") <= col("a.bucket"))
      .groupBy(col("a.bucket").as("bucket"))
      .agg(sum(col("c2")).as("cum"))
    val tot = sketch.agg(sum("c").as("n"))
    qs.toDF("q")
      .crossJoin(broadcast(cum.crossJoin(tot)))
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy("q").agg(min("bucket").as("bucket"))
      .select(col("q"),
        (lit(2.0) * pow(lit(gamma), col("bucket")) / lit(gamma + 1))
          .as("est"))
      .orderBy("q")
  }
}
