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
  *    counting — precision is 1.0 by construction, recall dials are k
  *    (fewer clusters = bigger cells) and probes (more overlap);
  *  - the keep/drop decision is the paper's GREEDY one, not a transitive
  *    closure: a vector is dropped iff a verified neighbor with a lower
  *    vec_id exists, its representative being the LOWEST such neighbor —
  *    ONE aggregation over the verified edges. The round-8 profile
  *    showed why this matters: distributed connected components cost
  *    7.8 s of fixed per-round job overhead on a 785-edge duplicate
  *    graph (the duplicate graph is always tiny relative to the corpus);
  *    the engine's transitive-closure contract lives in q_dedup_cluster/
  *    q_dedup_cascade where clusters, not survivors, are the output.
  *
  * At 100 TB: the probe assignment is written partitioned by cell_id
  * (the writeIvf layout), so the self-join co-locates by construction
  * and each cluster's pair search is partition-local; cluster sizes are
  * capped by k scaling with corpus size (k ≈ n/target_cell_size keeps
  * per-cell work constant).
  */
object SemDedup {

  /** @return (vec_id, rep, kept): rep = lowest verified intra-cell
    *         neighbor below vec_id (itself if none), kept = no such
    *         neighbor exists. Greedy-by-id: along a chain a–b–c where
    *         a–c is not itself a near-dup, both b and c drop (each has
    *         a lower neighbor) — one survivor per chain, the paper's
    *         one-per-duplicate-set behavior with a deterministic pick. */
  def semDedup(embeddings: DataFrame, k: Int, iters: Int, tau: Double,
      probes: Int = 2): DataFrame = {
    val idx = Ann.buildIvf(embeddings, k, iters)
    // multi-probe assignment from model state: the codegen'd
    // NearestCells kernel scores all k centroids and selects the
    // `probes` best in one plan node — no per-centroid expression
    // copies (k is not bounded by codegen size) and no interpreted
    // HOF lambdas (QuantExpressions scaladoc)
    val probeCells = graft.functions.QuantExpressions.nearestCells(
      col("embedding"), idx.centroids.flatten, idx.centroids.length,
      idx.centroids.head.length, probes)
    // Verify INSIDE the cell self-join: the assignment frame (n·probes
    // rows) is the only thing that shuffles — one hash exchange on
    // cell_id reused by both join sides — and the O(n²/k·p²) candidate
    // pairs are STREAMED through the codegen'd dot filter without ever
    // materializing. The first cut materialized candidate ids, distinct'd
    // them, and re-fetched embeddings through two candidate-sized joins:
    // at 50k vectors that shuffled ~100M id pairs plus 2×100M embedding-
    // carrying join rows (ProfileAnn, 31 s); this shape shuffles ~25 MB
    // and spends its time in the dot loop instead (~3 s). A pair sharing
    // several probe cells is re-verified ≤p² times — dots are cheaper
    // than the shuffle that deduplicating them costs; edges dedup AFTER
    // the filter, where survivors are corpus-tiny.
    val assign = embeddings
      .select(col("vec_id"), col("embedding"),
        explode(probeCells).as("cell_id"))
      .repartition(col("cell_id"))
    val edges = assign
      .select(col("cell_id"), col("vec_id").as("id_a"),
        col("embedding").as("va"))
      .hint("shuffle_hash")
      .join(assign.select(col("cell_id"), col("vec_id").as("id_b"),
        col("embedding").as("vb")), Seq("cell_id"))
      .filter(col("id_a") < col("id_b") &&
        Vectors.dot(col("va"), col("vb")) >= tau)
      .select(col("id_a"), col("id_b"))
    // greedy keep/drop: one partial-aggregated shuffle on the higher id
    // (min-combines map-side, so the ≤p² duplicate edges also vanish
    // before the exchange)
    val reps = edges.groupBy(col("id_b").as("vec_id"))
      .agg(min(col("id_a")).as("low"))
    val ids = embeddings.select(col("vec_id"))
    ids.join(reps.hint("shuffle_hash"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("low"), col("vec_id")).as("rep"))
      .withColumn("kept", col("rep") === col("vec_id"))
      .orderBy("vec_id")
  }
}
