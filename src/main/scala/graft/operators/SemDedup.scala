package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** SemDeDup — semantic (embedding-space) deduplication via cluster-then-
  * search, after Abbas et al. 2023 ("SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication", arXiv:2303.09540).
  *
  * The exact embedding near-dup join (q_embed_neardup) is O(n²) in
  * documents; SemDeDup's observation is that semantic duplicates are
  * nearest neighbors, so k-means the space first and search for pairs
  * ONLY within a cluster: expected candidate volume drops to O(n²/k)
  * with recall limited only by cluster-boundary splits.
  *
  * Spark shape:
  *  - clustering reuses [[Ann.buildIvf]] (deterministic init, distributed
  *    Lloyd steps, only k×dim centroid model state on the driver);
  *  - assignment is MULTI-PROBE (`probes` nearest cells per vector, the
  *    IVF-nprobe idea applied at index build): a boundary pair is found
  *    if ANY of their probe cells overlap, which is what rescues recall
  *    for pairs that k-means splits across adjacent cells — candidate
  *    volume grows only ×probes²/k per cell;
  *  - the candidate search is a self-equi-join ON cell_id over
  *    (cell, vec_id) pairs — a hash shuffle of ids, never a cross join —
  *    deduplicated BEFORE the embeddings are fetched (a pair sharing
  *    several probe cells verifies once); the array-carrying fetch joins
  *    are pinned SHUFFLE_HASH against AQE broadcast mis-promotion (the
  *    SetSimJoin lesson, PLANS round 6);
  *  - every candidate is verified with the EXACT codegen'd cosine before
  *    becoming an edge — precision is 1.0 by construction, recall dials
  *    are k (fewer clusters = bigger cells) and probes (more overlap);
  *  - duplicate groups are closed under transitivity with the shared
  *    [[Dedup.connectedComponents]]; the survivor is the min vec_id.
  *
  * At 100 TB: the probe assignment is written partitioned by cell_id
  * (the writeIvf layout), so the self-join co-locates by construction
  * and each cluster's pair search is partition-local; cluster sizes are
  * capped by k scaling with corpus size (k ≈ n/target_cell_size keeps
  * per-cell work constant).
  */
object SemDedup {

  /** @return (vec_id, cluster, kept): cluster = min vec_id of the
    *         semantic-duplicate group, kept = this vec_id is the group
    *         survivor (singletons keep themselves). */
  def semDedup(embeddings: DataFrame, k: Int, iters: Int, tau: Double,
      probes: Int = 2): DataFrame = {
    val idx = Ann.buildIvf(embeddings, k, iters)
    // multi-probe assignment from model state: sort (−dot, cell) structs,
    // take the `probes` best — all inside one codegen'd projection
    val scored = idx.centroids.zipWithIndex.map { case (c, i) =>
      struct((Vectors.dot(col("embedding"), typedLit(c.toSeq)) * -1)
        .as("nd"), lit(i).as("cell"))
    }
    val probeCells = transform(
      slice(array_sort(array(scored.toIndexedSeq: _*)), 1, probes),
      s => s.getField("cell"))
    val assign = embeddings
      .select(col("vec_id"), explode(probeCells).as("cell_id"))
    val cand = assign.select(col("cell_id"), col("vec_id").as("id_a"))
      .join(assign.select(col("cell_id"), col("vec_id").as("id_b")),
        Seq("cell_id"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val vecs = embeddings.select(col("vec_id"), col("embedding"))
    val edges = cand.hint("shuffle_hash")
      .join(vecs.select(col("vec_id").as("id_a"), col("embedding").as("va")),
        Seq("id_a"))
      .hint("shuffle_hash")
      .join(vecs.select(col("vec_id").as("id_b"), col("embedding").as("vb")),
        Seq("id_b"))
      .filter(Vectors.dot(col("va"), col("vb")) >= tau)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val cc = Dedup.connectedComponents(edges)
    val ids = embeddings.select(col("vec_id"))
    ids.join(cc.hint("shuffle_hash"), ids("vec_id") === cc("id"), "left")
      .select(col("vec_id"),
        coalesce(col("comp"), col("vec_id")).as("cluster"))
      .withColumn("kept", col("cluster") === col("vec_id"))
      .orderBy("vec_id")
  }
}
