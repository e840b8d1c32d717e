package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components for dedup clustering (the terminal stage of the
  * near-dup cascade: verified pairs → components → one canonical doc per
  * component).
  *
  * Distributed path (r15): ALTERNATING STAR CONTRACTION — Kiveris,
  * Lattanzi, Mirrokni, Rastogi, Vassilvitskii 2014, "Connected
  * Components in MapReduce and Beyond". Each round applies large-star
  * (every node's LARGER neighbors re-point to the min of its closed
  * neighborhood) then small-star (every node and its smaller parents
  * re-point to their min), contracting the graph toward a star forest
  * whose roots are the component minima — provably O(log²) rounds on
  * ANY graph, and the edge list SHRINKS toward n−1 star edges as it
  * converges. This replaced min-label propagation + pointer jumping,
  * whose "doubling" only holds when a node's best-known min lies
  * toward the component min: on structured id layouts it degraded
  * toward O(diameter) and at maxIter=25 returned silently wrong
  * labels (991 mislabels on the sparse co-purchase graph — caught by
  * the q_graph_components oracle at sf0.1, the r15 latent-bug find).
  *
  * The loop is driver-side control flow only: per-round work is two
  * star contractions (each one groupBy-min + one SHUFFLE_HASH join)
  * and a one-row checksum action for the fixpoint test. Nothing is
  * ever collected.
  *
  * Every join side here is corpus-scaled (edges and the per-node min
  * table), and long id columns delta-compress so well that AQE's
  * compressed-bytes broadcast promotion would happily pick a
  * multi-GiB side at exactly the graph sizes this operator exists for
  * (see SetSimJoin's scaladoc and PLANS.md round 6 for the measured
  * detonation). All joins are pinned SHUFFLE_HASH.
  */
object Dedup {

  /** Size-gated components (the [[Bpe.train]] localVocabLimit
    * discipline): ONE count decides the path. A small edge list —
    * the overwhelmingly common case for thresholded similarity graphs,
    * where survivors are corpus-tiny — collects to the driver and runs
    * union-find (zero iterative Spark jobs; the distributed loop pays
    * seconds of fixed per-round overhead however small the graph);
    * past the gate, the pointer-jumping loop below. Both label every
    * component by its MIN id, so the result is identical by
    * construction regardless of the path taken. */
  def components(edges: DataFrame,
      localEdgeLimit: Long = 2000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    if (e.count() > localEdgeLimit) return connectedComponents(e)
    // Primitive-array union-find: two long[] collects (no boxed tuple
    // array), ids densified by sort + binarySearch into an int[] parent
    // table — ~48 bytes/edge of transient driver heap at the gate
    // boundary instead of the several hundred MB a boxed
    // HashMap[Long,Long] costs at 2M edges.
    val srcArr: Array[Long] = e.select("src").as[Long].collect()
    val dstArr: Array[Long] = e.select("dst").as[Long].collect()
    val m = srcArr.length
    val all = new Array[Long](2 * m)
    System.arraycopy(srcArr, 0, all, 0, m)
    System.arraycopy(dstArr, 0, all, m, m)
    java.util.Arrays.sort(all)
    var u = 0
    var i = 1
    while (i < all.length) {
      if (all(i) != all(u)) { u += 1; all(u) = all(i) }
      i += 1
    }
    val n = if (m == 0) 0 else u + 1
    val uids = java.util.Arrays.copyOf(all, n)
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    i = 0
    while (i < m) {
      val ra = find(java.util.Arrays.binarySearch(uids, srcArr(i)))
      val rb = find(java.util.Arrays.binarySearch(uids, dstArr(i)))
      // roots point at the lower INDEX = lower id (uids is sorted), so
      // every component resolves to its min id — same labeling as the
      // distributed path, by construction
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      i += 1
    }
    val comp = new Array[Long](n)
    i = 0
    while (i < n) { comp(i) = uids(find(i)); i += 1 }
    // materialize executor-side off two primitive broadcasts — the
    // driver never builds a boxed (id, comp) tuple array
    val uidsB = spark.sparkContext.broadcast(uids)
    val compB = spark.sparkContext.broadcast(comp)
    spark.range(n.toLong).as[Long].mapPartitions { it =>
      val ids = uidsB.value; val cs = compB.value
      it.map(j => (ids(j.toInt), cs(j.toInt)))
    }.toDF("id", "comp")
  }

  /** One large-star round over canonical undirected pairs (lo < hi):
    * every node's LARGER neighbors re-point to the minimum of its
    * closed neighborhood. Keeps connectivity (Kiveris et al., lemma
    * 4.1) while strictly shrinking large-id chains. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("lo").as("u"), col("hi").as("v"))
      .unionByName(e.select(col("hi").as("u"), col("lo").as("v")))
    val m = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    sym.join(m.hint("shuffle_hash"), "u")
      .filter(col("v") > col("u")) // larger neighbors only
      .select(col("m").as("lo"), col("v").as("hi")) // m ≤ u < v
      .distinct()
  }

  /** One small-star round over child→parent star edges (lo < hi):
    * each node u and all its (smaller) parents re-point to the
    * minimum parent. */
  private def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy(col("hi").as("u")).agg(min("lo").as("m"))
    e.join(m.hint("shuffle_hash"), e("hi") === m("u"))
      .select(col("lo").as("v"), col("m"))
      .unionByName(m.select(col("u").as("v"), col("m")))
      .filter(col("v") =!= col("m")) // the min itself is the root
      .select(col("m").as("lo"), col("v").as("hi")) // m < v by min
      .distinct()
  }

  /** @param edges undirected edge list, columns `(src, dst)`.
    * @return (id, comp) for every id appearing in `edges`, comp = min id
    *         of its component.
    *
    * Alternating star contraction to the star-forest fixpoint —
    * O(log²) rounds on any graph, any id layout (the r15 replacement
    * for pointer jumping; see the object doc). The fixpoint test is a
    * one-row (count, hash-sum) checksum over the canonical edge set;
    * non-convergence within maxIter REQUIREs out loudly rather than
    * returning partial labels. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    var e = edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .distinct()
      .localCheckpoint()
    // DECIMAL(38,0) accumulator: a long sum of 2^63-scale hashes
    // overflows ANSI arithmetic after a handful of rows
    def checksum(df: DataFrame): (Long, String) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("lo"), col("hi"))
          .cast("decimal(38,0)")), lit(0L).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1).toPlainString)
    }
    var sig = checksum(e)
    var stable = false
    var it = 0
    while (!stable && it < maxIter) {
      // localCheckpoint TRUNCATES LINEAGE each round — an iterative
      // plan otherwise grows per round and analysis cost explodes
      // long before the data does
      e = smallStar(largeStar(e)).localCheckpoint()
      val s2 = checksum(e)
      if (s2 == sig) stable = true else sig = s2
      it += 1
    }
    require(stable,
      s"connected components did not converge in $maxIter rounds - " +
        "alternating star contraction is O(log^2 n); a non-convergent " +
        "run at this bound indicates a malformed edge list")
    // the fixpoint is a star forest (lo = component min, hi = member):
    // members from the hi side, roots label themselves; ids that only
    // ever appeared in self-loops have no star edge and keep their own
    // id (the pre-r15 contract — every id in `edges` gets a label)
    val star = e.select(col("hi").as("id"), col("lo").as("comp"))
      .unionByName(e.select(col("lo").as("id"), col("lo").as("comp")))
      .groupBy("id").agg(min("comp").as("comp"))
    edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
      .distinct()
      .join(star.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }
}
