package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.functions.Vectors

/** Distributed kNN join / kNN-graph construction: EVERY vector gets
  * its top-k nearest neighbors (by dot product — cosine on unit-norm
  * embeddings). The corpus×corpus generalization of [[Ann.search]]'s
  * small-query-set shape, and the substrate for graph-based corpus
  * analysis (neighborhood stats, cluster discovery via
  * [[Dedup.connectedComponents]] on thresholded edges).
  *
  * Shape (the [[SemDedup]] cell-join discipline + WindowGroupLimit):
  *  - coarse IVF cells bucket the corpus; the DATA role keeps each
  *    vector in its one primary cell, the QUERY role explodes each
  *    vector to its `probes` nearest cells (codegen'd NearestCells —
  *    model state in-kernel), so a (q, v) candidate appears AT MOST
  *    ONCE (v has one primary cell; q probes it once) — no dedup pass;
  *  - candidates stream through the cell equi-join and the codegen'd
  *    dot WITHOUT materializing (one hash exchange on cell_id, the
  *    data side the SHUFFLE_HASH build — cell-sized by the
  *    k ≈ n/target_cell_size rule);
  *  - per-query top-k is the row_number window: Catalyst inserts a
  *    PARTIAL WindowGroupLimit below the exchange, so each map task
  *    forwards ≤ k sorted candidates per query — O(n·k) shuffle — and
  *    the machinery is UnsafeRow sort-based and SPILLABLE. The first
  *    cut used the typed TopKAggregator instead: its one boxed
  *    List-buffer per query group per partition OOM'd at 1M queries
  *    (ProfileKnn) — that aggregator's domain is FEW groups
  *    (q_agg_topk_custom's per-flag top-k), not a corpus of them.
  *
  * Exactness dial: `probes` = kCells probes every cell, making the
  * candidate set the whole corpus — the result is then EXACTLY the
  * brute-force kNN graph (KnnJoinSpec pins this identity); smaller
  * `probes` trades recall for the (probes·n/kCells)-per-query scan
  * that holds at 10⁹ vectors.
  *
  * At 100 TB: assignments partition by cell_id (writeIvf layout), the
  * join co-locates by construction, and per-cell work is capped by
  * kCells scaling with n. An NN-Descent refinement pass could sharpen
  * recall without more probes; the IVF join is the production-simple
  * first cut (it is what FAISS' IndexIVFFlat does per query,
  * vectorized here across all queries at once).
  */
object KnnJoin {

  /** (q_id, rnk, vec_id, cos): the kNN graph, `topK` edges per vector,
    * deterministic (score desc, then smaller vec_id). `rankRounded`
    * ranks on the score ROUNDED to 6 dp instead of the raw double —
    * the cross-engine determinism contract of q_ann_cosine_topk (both
    * engines tie-break the identical rounded value by vec_id), used by
    * the full-probe DuckDB-oracled declared form. */
  def knnGraph(embeddings: DataFrame, topK: Int, kCells: Int,
      iters: Int = 2, probes: Int = 2,
      rankRounded: Boolean = false): DataFrame = {
    val idx = Ann.buildIvf(embeddings, kCells, iters)
    knnGraphOnIndex(idx, embeddings, topK, probes, rankRounded)
  }

  def knnGraphOnIndex(idx: Ann.IvfIndex, embeddings: DataFrame,
      topK: Int, probes: Int, rankRounded: Boolean = false): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val probeCells = graft.functions.QuantExpressions.nearestCells(
      col("embedding"), idx.centroids.flatten, idx.centroids.length,
      idx.centroids.head.length, math.min(probes, idx.centroids.length))
    val data = idx.assignments
      .select(col("cell_id"), col("vec_id"), col("embedding").as("vd"))
    val queries = embeddings
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        explode(probeCells).as("cell_id"))
      .repartition(col("cell_id"))
    val rawScore = Vectors.dot(col("qv"), col("vd"))
    queries
      .join(data.hint("shuffle_hash"), Seq("cell_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        (if (rankRounded) round(rawScore, 6) else rawScore).as("score"))
      .transform(topKPerQuery(topK))
  }

  /** Per-query top-k via the rank window — spillable, with the partial
    * WindowGroupLimit bounding every map task's output to k rows per
    * query (plan-guarded). Deterministic: score desc, then smaller id.
    * `sorted = false` skips the global presentation orderBy — the
    * descent loop discards ordering immediately, and a per-round
    * range-shuffle sort of the O(n·k) graph would be pure waste. */
  private def topKPerQuery(topK: Int, sorted: Boolean = true)(
      scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    val ranked = scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("vec_id"),
        round(col("score"), 6).as("cos"))
    if (sorted) ranked.orderBy("q_id", "rnk") else ranked
  }

  /** NN-Descent refinement (Dong, Moses & Li 2011, "Efficient k-nearest
    * neighbor graph construction for generic similarity measures",
    * WWW): a neighbor of my neighbor is likely my neighbor. Each round
    * generates candidates from the SYMMETRIZED current graph joined
    * with itself on the shared middle vertex, scores them exactly, and
    * merges them into the per-query top-k through the same
    * spillable rank window. Candidate volume per round is
    * Σ_v deg(v)² ≈ 4k²·n — graph-sized, independent of cell layout —
    * so a cheap low-probe [[knnGraph]] plus a couple of descent rounds
    * beats raising `probes` (which scans probes/kCells of the corpus
    * per query). A converged graph is a fixed point: refining the
    * exact graph returns it unchanged (KnnJoinSpec).
    */
  def refine(graph: DataFrame, embeddings: DataFrame, topK: Int,
      rounds: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val emb = embeddings.select(col("vec_id"), col("embedding"))
      .localCheckpoint()
    var g = graph.select(col("q_id"), col("vec_id")).localCheckpoint()
    var r = 0
    while (r < rounds) {
      val sym = g.select(explode(array(
          struct(col("q_id").as("u"), col("vec_id").as("v")),
          struct(col("vec_id").as("u"), col("q_id").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
      // candidates (u, w) sharing neighbor v, UNION the current edges
      // (so survivors re-enter the top-k), deduped BEFORE the embedding
      // fetch — every pair is scored exactly once per round, all at the
      // same precision (mixed rounded/raw scores would let one pair
      // occupy two top-k slots)
      val cand = sym
        .join(sym.select(col("v"), col("u").as("w"))
          .hint("shuffle_hash"), Seq("v"))
        .filter(col("u") =!= col("w"))
        .select(col("u"), col("w"))
        .union(g.select(col("q_id").as("u"), col("vec_id").as("w")))
        .distinct()
      g = topKPerQuery(topK, sorted = false)(cand
        .join(emb.select(col("vec_id").as("u"),
          col("embedding").as("ue")).hint("shuffle_hash"), Seq("u"))
        .join(emb.select(col("vec_id").as("w"),
          col("embedding").as("we")).hint("shuffle_hash"), Seq("w"))
        .select(col("u").as("q_id"), col("w").as("vec_id"),
          Vectors.dot(col("ue"), col("we")).as("score")))
        .select("q_id", "vec_id")
        .localCheckpoint()
      r += 1
    }
    // final presentation pass: exact scores, ranked and rounded
    topKPerQuery(topK)(
      g.join(emb.select(col("vec_id").as("q_id"),
          col("embedding").as("qe")).hint("shuffle_hash"), Seq("q_id"))
        .join(emb.select(col("vec_id"),
          col("embedding").as("ve")).hint("shuffle_hash"), Seq("vec_id"))
        .select(col("q_id"), col("vec_id"),
          Vectors.dot(col("qe"), col("ve")).as("score")))
  }

  /** Neighborhood clusters: threshold the kNN graph at `tau` and run
    * connected components — graph-based corpus clustering in two
    * composed operators. Returns (vec_id, cluster). */
  def knnClusters(embeddings: DataFrame, topK: Int, kCells: Int,
      tau: Double, iters: Int = 2, probes: Int = 2,
      rankRounded: Boolean = false): DataFrame = {
    val edges = knnGraph(embeddings, topK, kCells, iters, probes,
        rankRounded)
      .filter(col("cos") >= tau)
      .select(col("q_id").as("src"), col("vec_id").as("dst"))
    // size-gated CC: thresholded survivors are usually corpus-tiny, so
    // the union-find fast path skips the iterative loop's fixed
    // per-round job overhead; past the gate the distributed loop runs
    val cc = Dedup.components(edges)
      .select(col("id").as("vec_id"), col("comp"))
    // singletons (no edge ≥ tau) cluster as themselves
    embeddings.select(col("vec_id"))
      .join(cc, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("comp"), col("vec_id")).as("cluster"))
      .orderBy("vec_id")
  }
}
