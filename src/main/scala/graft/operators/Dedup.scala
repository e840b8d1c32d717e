package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components for dedup clustering (the terminal stage of the
  * near-dup cascade: verified pairs → components → one canonical doc per
  * component).
  *
  * Min-label propagation with POINTER JUMPING: each round first takes the
  * neighborhood minimum (one join + partial-aggregated min), then
  * replaces every label by its label's label (`comp(u) ← comp(comp(u))`)
  * — doubling the effective propagation distance, so convergence is
  * O(log diameter) rounds instead of O(diameter). A 1M-hop chain
  * converges in ~20 rounds; plain propagation would need 1M.
  *
  * The loop is driver-side control flow only: per-round work is two
  * distributed joins + one aggregation, and the convergence check is a
  * single count. Nothing is ever collected.
  *
  * Every join side here is corpus-scaled (labels and edges), and long
  * id/label columns delta-compress so well that AQE's compressed-bytes
  * broadcast promotion would happily pick a multi-GiB side at exactly
  * the graph sizes this operator exists for (see SetSimJoin's scaladoc
  * and PLANS.md round 6 for the measured detonation). All joins are
  * pinned SHUFFLE_HASH with the skinny label table as build side.
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

  /** @param edges undirected edge list, columns `(src, dst)`.
    * @return (id, comp) for every id appearing in `edges`, comp = min id
    *         of its component.
    *
    * Convergence: the pointer jump doubles knowledge distance when a
    * node's best-known min lies TOWARD the component min (a monotone
    * 200-chain converges in ~9 rounds — DedupSpec), but degrades
    * toward O(diameter) when local minima are knowledge dead-ends
    * (structured id layouts: the sparse co-purchase graph needed >25
    * and ≤60 rounds). The loop therefore REQUIRES convergence instead
    * of returning at maxIter (r15: it previously returned silently
    * wrong labels there — 991 mislabels, caught by the
    * q_graph_components oracle at sf0.1); raise maxIter for
    * diameter-heavy graphs, or use [[components]], whose size gate
    * routes small edge lists to exact driver union-find. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // symmetrize in ONE pass over the edge list: explode each edge into
    // its two directions. The union-of-two-projections form computed the
    // whole upstream edge pipeline TWICE (only exchanges are reused
    // across union branches; post-exchange work — e.g. the cascade's
    // verify joins — re-ran per branch, measured +1.9 s on
    // q_dedup_cascade_ppjoin at sf0.1 before the cache materialized)
    val sym = edges
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .cache()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // neighborhood minimum (partial agg: per-partition min combines
      // map-side before the shuffle)
      val viaEdges = sym.join(labels.hint("shuffle_hash"),
          sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("comp"))
      // re-alias the direct operand: both union children would otherwise
      // carry the SAME attribute ids (viaEdges embeds `labels`), which
      // trips Union constraint propagation
      val m = labels.select(col("id").as("id"), col("comp").as("comp"))
        .union(viaEdges)
        .groupBy("id").agg(min("comp").as("comp"))
      // pointer jump: comp(u) ← comp(comp(u))
      // localCheckpoint TRUNCATES LINEAGE each round — an iterative plan
      // otherwise doubles per iteration (the self-join references the
      // previous round twice) and analysis/explain cost grows
      // exponentially long before the data does. The PREVIOUS label
      // rides along inside the same checkpointed pass, so the
      // convergence check below is a filter-count over cached blocks —
      // one distributed job per round instead of two.
      val jumped = m.as("a")
        .join(m.select(col("id").as("cid"), col("comp").as("ccomp")).as("b")
          .hint("shuffle_hash"),
          col("a.comp") === col("b.cid"), "left")
        .join(labels.select(col("id").as("oid"), col("comp").as("old"))
          .hint("shuffle_hash"),
          col("a.id") === col("oid"))
        .select(col("a.id").as("id"),
          coalesce(col("b.ccomp"), col("a.comp")).as("comp"), col("old"))
        .localCheckpoint()
      changed = jumped.filter(col("comp") =!= col("old")).count()
      labels = jumped.select("id", "comp")
      it += 1
    }
    sym.unpersist()
    require(changed == 0,
      s"connected components did not converge in $maxIter rounds - " +
        "label propagation is O(diameter); raise maxIter (a chain " +
        "graph needs ~diameter rounds) or use components() for " +
        "driver union-find below the size gate")
    labels
  }
}
