package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seeded k-means++ seeding for the coarse quantizers ([[Ann.buildIvf]],
  * [[Pq.train]], and through them [[SemDedup]]).
  *
  * The round-8 init (first k vectors by vec_id) is degenerate on
  * source-sorted corpora: when ingest order correlates with content
  * (crawl shards, per-source dumps — the normal case at 100 TB), the
  * first k vectors are ONE cluster and every centroid lands inside it.
  * Replacement is the k-means‖ shape (Bahmani et al. 2012, "Scalable
  * k-means++", VLDB): ONE distributed pass draws a pseudo-uniform
  * candidate sample — top-m by xxhash64(vec_id, seed), which is
  * order-independent and deterministic — then classical D²-weighted
  * k-means++ (Arthur & Vassilvitskii 2007, SODA) runs driver-side over
  * the model-sized candidate set with a seed-fixed RNG.
  *
  * Everything stays deterministic: same corpus + seed → same hash
  * sample → same java.util.Random stream → same centroids, independent
  * of partitioning, row order, and parallelism.
  */
private[graft] object KmeansInit {

  /** Order-independent candidate sample: the m corpus vectors with the
    * smallest xxhash64(vec_id, seed) — one TakeOrdered pass, no
    * full-corpus collect. Returns fewer than m when the corpus is
    * smaller. */
  def sample(corpus: DataFrame, m: Int, seed: Long = 42L): Array[Array[Float]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus
      .select(col("embedding"),
        xxhash64(col("vec_id"), lit(seed)).as("h"), col("vec_id"))
      .orderBy(col("h"), col("vec_id"))
      .limit(m)
      .select("embedding").as[Seq[Float]].collect().map(_.toArray)
  }

  /** Classical D² seeding over the candidates, deterministic via the
    * seeded RNG. When all remaining candidates coincide with chosen
    * centers (duplicate-heavy corpora: total D² = 0) the next unused
    * candidate index is taken in order — still deterministic. */
  def plusPlus(cand: Array[Array[Float]], k: Int,
      seed: Long = 42L): Array[Array[Float]] = {
    require(cand.length >= k,
      s"k-means++ needs at least k=$k candidates, got ${cand.length}")
    val n = cand.length
    val dim = cand.head.length
    val rnd = new java.util.Random(seed)
    val centers = new Array[Array[Float]](k)
    val minD = new Array[Double](n)
    java.util.Arrays.fill(minD, Double.MaxValue)
    var chosen = cand.indices.map(_ => false).toArray
    def relax(center: Array[Float]): Unit = {
      var i = 0
      while (i < n) {
        var d = 0.0
        var t = 0
        val v = cand(i)
        while (t < dim) {
          val diff = v(t).toDouble - center(t)
          d += diff * diff
          t += 1
        }
        if (d < minD(i)) minD(i) = d
        i += 1
      }
    }
    val first = rnd.nextInt(n)
    centers(0) = cand(first)
    chosen(first) = true
    relax(centers(0))
    var c = 1
    while (c < k) {
      var tot = 0.0
      var i = 0
      while (i < n) { tot += minD(i); i += 1 }
      var idx = -1
      if (tot > 0.0) {
        val target = rnd.nextDouble() * tot
        var acc = 0.0
        i = 0
        while (idx < 0 && i < n) {
          acc += minD(i)
          if (acc >= target) idx = i
          i += 1
        }
        if (idx < 0) idx = n - 1 // fp round-off on the last prefix sum
      } else {
        i = 0
        while (idx < 0 && i < n) { if (!chosen(i)) idx = i; i += 1 }
        if (idx < 0) idx = c % n // k > distinct candidates: reuse
      }
      centers(c) = cand(idx)
      chosen(idx) = true
      relax(centers(c))
      c += 1
    }
    centers
  }

  /** Driver-side Lloyd refinement over the candidate set — the second
    * half of k-means‖: D² seeds favor extremes, so polishing them
    * against the (model-sized) sample before the distributed iterations
    * start lands near the optimum the full corpus would converge to.
    * The assignment rule MATCHES the distributed iterations' rule
    * (`byDot = true` for [[Ann]]'s max-dot cells, L2 for [[Pq]]'s
    * subspace codebooks) — refining under a different metric than the
    * downstream Lloyd steps use would hand them a mis-matched start.
    * Empty clusters re-seed from the worst-assigned candidate
    * (deterministic). Cost: iters·m·k·dim driver flops. */
  def localRefine(cand: Array[Array[Float]], centers: Array[Array[Float]],
      iters: Int, byDot: Boolean = false): Array[Array[Float]] = {
    val n = cand.length
    val k = centers.length
    val dim = cand.head.length
    var cs = centers.map(_.clone())
    var it = 0
    while (it < iters) {
      val sums = Array.ofDim[Double](k, dim)
      val cnt = new Array[Long](k)
      var worstI = 0
      var worstD = Double.MaxValue
      var i = 0
      while (i < n) {
        val v = cand(i)
        // score: max dot or min L2, per the downstream assignment rule
        var best = if (byDot) Double.MinValue else Double.MaxValue
        var bj = 0
        var j = 0
        while (j < k) {
          var s = 0.0
          var t = 0
          val cj = cs(j)
          if (byDot) {
            while (t < dim) { s += v(t).toDouble * cj(t); t += 1 }
            if (s > best) { best = s; bj = j }
          } else {
            while (t < dim) {
              val diff = v(t).toDouble - cj(t)
              s += diff * diff
              t += 1
            }
            if (s < best) { best = s; bj = j }
          }
          j += 1
        }
        // worst-assigned = lowest dot / highest L2
        val badness = if (byDot) best else -best
        if (badness < worstD) { worstD = badness; worstI = i }
        cnt(bj) += 1
        var t = 0
        while (t < dim) { sums(bj)(t) += v(t); t += 1 }
        i += 1
      }
      cs = Array.tabulate(k) { j =>
        if (cnt(j) == 0) cand(worstI).clone()
        else {
          val c = new Array[Float](dim)
          var t = 0
          while (t < dim) { c(t) = (sums(j)(t) / cnt(j)).toFloat; t += 1 }
          c
        }
      }
      it += 1
    }
    cs
  }

  /** The standard composition: sample 8k candidates, D²-seed k centers,
    * polish with local Lloyd passes over the sample under the max-dot
    * assignment rule Ann's distributed iterations use. */
  def seed(corpus: DataFrame, k: Int, seed: Long = 42L): Array[Array[Float]] = {
    val cand = sample(corpus, math.max(k * 8, 64), seed)
    localRefine(cand, plusPlus(cand, k, seed), iters = 10, byDot = true)
  }
}
