package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Graph-based ANN search — the HNSW family (Malkov & Yashunin 2016,
  * "Efficient and robust approximate nearest neighbor search using
  * Hierarchical Navigable Small World graphs"): HIERARCHICAL proximity
  * graphs + beam descent. The missing production shape beside IVF/PQ —
  * navigation through neighbor links reaches the true neighborhood
  * with exact-dot budgets independent of corpus size.
  *
  * Why layers are load-bearing, not decoration: a flat kNN graph over
  * clustered data DECOMPOSES — every vector's top-k links stay inside
  * its tight cluster, the symmetrized graph splits into per-cluster
  * components, and descent can never cross (measured recall 0.2 on the
  * hierarchical-cluster corpus in GraphAnnSpec's flat first cut).
  * Geometric subsampling fixes this structurally: a layer holding 1/4^ℓ
  * of the corpus has too few same-cluster members to fill a node's
  * degree, so its kNN graph is FORCED to carry long-range edges — the
  * exact mechanism HNSW's level assignment exists for. Search descends:
  * the top layer routes between far regions, each layer sharpens, the
  * base layer (the full NN-Descent-refined kNN graph) resolves the true
  * neighborhood.
  *
  * Layer membership is deterministic: node v lives in layers
  * 0..level(v), where level(v) counts how many times 4 divides
  * xxhash64(vec_id) (HNSW's geometric level draw, derandomized). Each
  * layer's graph is [[KnnJoin.knnGraphOnIndex]] over its members — the
  * same IVF-bucketed O(n·probes·cellSize) build, never all-pairs; build
  * cost is a geometric series ≈ 4/3 of the base graph alone.
  *
  * Search, distributed as ITERATIVE FRONTIER JOINS (the PageRank/CC
  * loop discipline — ALL queries advance together; the driver loop
  * only counts for convergence): per layer, a beam of the best
  * candidates expands unexpanded members through the layer's adjacency
  * (anti-joined against the per-layer visited set BEFORE the embedding
  * fetch — every (q, v) is scored at most once per layer, so the
  * exact-dot budget is auditable), merges through the spillable rank
  * window (the WindowGroupLimit shape), and converges when no
  * unexpanded row survives the beam cut; the surviving beam seeds the
  * next layer down. Upper layers run a narrow beam (routing), the base
  * layer the full `ef`.
  *
  * All joins carry corpus-scaled sides ⇒ SHUFFLE_HASH-pinned (the AQE
  * compressed-size mispromotion documented in SetSimJoin). Per-round
  * work is O(|frontier|·degree) candidate rows — graph-sized, never
  * corpus×corpus. At 100 TB the layer graphs and embeddings partition
  * by vec_id and the loop's joins co-locate on that key; beam state is
  * queries×ef rows.
  */
object GraphAnn {

  /** Layer graphs, base (level 0, the full corpus) FIRST; `entries` are
    * the top layer's member ids — the shared search seeds. */
  final case class GraphIndex(layers: Seq[DataFrame], entries: Array[Long])

  /** Build the hierarchy. `degree` is the per-layer out-degree (HNSW's
    * M); `kCells` the base layer's IVF bucketing (scaled down 4× per
    * layer); `descentRounds` NN-Descent refinement on the BASE layer
    * (upper layers are routing structures — refinement there buys
    * little); `minTopLayer` bounds the top layer's expected size, which
    * becomes the entry set. */
  def build(embeddings: DataFrame, degree: Int = 16, kCells: Int = 64,
      iters: Int = 2, probes: Int = 2, descentRounds: Int = 1,
      minTopLayer: Int = 32): GraphIndex = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val emb = embeddings.select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val maxLevel = math.max(0,
      (math.log(math.max(1.0, n.toDouble / minTopLayer)) / math.log(4.0)).toInt)
    def membersOf(l: Int): DataFrame =
      if (l == 0) emb
      else emb.filter(pmod(xxhash64(col("vec_id")), lit(pow4(l))) === 0)
    val layers = (0 to maxLevel).map { l =>
      val members = membersOf(l)
      val cells = math.max(4, (kCells >> (2 * l)))
      val idx = Ann.buildIvf(members, cells, iters)
      val g = KnnJoin.knnGraphOnIndex(idx, members, degree, probes)
      val refined =
        if (l == 0 && descentRounds > 0)
          KnnJoin.refine(g, members, degree, descentRounds)
        else g
      LoopState.checkpoint(
        refined.select(col("q_id").as("src"), col("vec_id").as("dst")))
    }
    // entry set = the top layer's MEMBERS (not its edge endpoints — an
    // isolated member must still seed searches); driver-sized by the
    // minTopLayer geometry
    val entries = membersOf(maxLevel)
      .select(col("vec_id")).orderBy("vec_id").as[Long].collect()
    GraphIndex(layers, entries)
  }

  private def pow4(l: Int): Long = 1L << (2 * l)

  /** Beam search down the hierarchy: (q_id, rnk, vec_id, cos) — the
    * [[Ann.search]] output contract. `queries` is (q_id, qvec); `ef`
    * is the base-layer beam width (HNSW's efSearch). */
  def search(index: GraphIndex, embeddings: DataFrame, queries: DataFrame,
      topK: Int, ef: Int = 32, maxRounds: Int = 10): DataFrame =
    searchCounted(index, embeddings, queries, topK, ef, maxRounds,
      countDots = false)._1

  /** Same, returning the exact-dot evaluation count (scored pairs
    * across all layers) — the budget GraphAnnSpec compares against
    * IVFPQ's shortlist. */
  private[graft] def searchCounted(index: GraphIndex,
      embeddings: DataFrame, queries: DataFrame, topK: Int, ef: Int,
      maxRounds: Int, countDots: Boolean = true): (DataFrame, Long) = {
    require(ef >= topK, s"beam width ef=$ef must be >= topK=$topK")
    val (beams, dots, _) = descendLayers(index, embeddings, queries,
      narrowEf = math.max(2, topK / 2), baseEf = ef, maxRounds,
      countDots)
    val beam = beams.head._2 // base layer
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    val out = beam
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("vec_id"),
        round(col("score"), 6).as("cos"))
      .orderBy("q_id", "rnk")
    (out, dots)
  }

  /** Metadata-FILTERED beam search — top-k under a row predicate, the
    * production retrieval shape (lang = 'en' AND quality ≥ q …).
    * `eligible` is the predicate's id set (vec_id), computed by the
    * caller so any predicate composes.
    *
    * Post-filtering the unfiltered top-k collapses recall at selective
    * predicates (k survivors of k·sel expected); PRE-filtering the
    * graph disconnects navigation (the filtered subgraph loses the
    * long-range routing edges). The filter-during-search shape keeps
    * both properties: NAVIGATION runs unfiltered (the beam routes
    * through ineligible nodes to reach eligible regions — hnswlib's
    * filter-callback semantics), while the RESULT ranks every scored
    * candidate that passes the filter — the full visited pool across
    * all layers (ef·rounds·degree-ish pairs, strictly more than the
    * beam), not just the surviving beam. Widen `ef` as selectivity
    * drops so ~ef·sel eligible survivors cover k; below ~1%
    * selectivity the right plan is [[FilteredSearch.exactFiltered]]'s
    * eligible-subset scan — [[FilteredSearch.auto]] routes on the
    * measured cardinality (the Qdrant/ACORN plan-selection rule).
    * FilteredSearchSpec pins recall@10 vs exact filtered brute force
    * across 1%/10%/50% selectivities. */
  def searchFiltered(index: GraphIndex, embeddings: DataFrame,
      queries: DataFrame, eligible: DataFrame, topK: Int, ef: Int = 32,
      maxRounds: Int = 10): DataFrame = {
    require(ef >= topK, s"beam width ef=$ef must be >= topK=$topK")
    val elig = eligible.select(col("vec_id")).localCheckpoint()
    val (_, _, scoredAll) = descendLayers(index, embeddings, queries,
      narrowEf = math.max(2, topK / 2), baseEf = ef, maxRounds,
      countDots = false)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    // a pair can be scored once per layer (same exact double each time)
    // — distinct AFTER the eligibility cut, so the dedup shuffle moves
    // only eligible survivors
    scoredAll
      .join(elig.hint("shuffle_hash"), Seq("vec_id"), "left_semi")
      .distinct()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("vec_id"),
        round(col("score"), 6).as("cos"))
      .orderBy("q_id", "rnk")
  }

  /** The layered descent, returning every layer's converged beam
    * (base layer FIRST) — search uses only the base beam; [[append]]
    * links new nodes into EVERY layer they inhabit, so it needs them
    * all — plus the union of EVERY scored (q_id, vec_id, score) across
    * layers ([[searchFiltered]]'s candidate pool; a lazy union over
    * frames that are already each localCheckpointed as beam lineage, so
    * accumulating it costs nothing unless consumed). Layer membership
    * is nested (4^ℓ | hash ⊆ 4^(ℓ−1) | hash), so a layer's beam only
    * ever holds that layer's members: seeds at the top are top-layer
    * members, seeds below are the layer-above's beam. */
  private def descendLayers(index: GraphIndex, embeddings: DataFrame,
      queries: DataFrame, narrowEf: Int, baseEf: Int, maxRounds: Int,
      countDots: Boolean = true)
      : (List[(Int, DataFrame)], Long, DataFrame) = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // LOOP-STATIC CO-PARTITIONING (optimization r19 — the r18 deferred
    // item): the embedding table and each layer's adjacency are joined
    // on the SAME key every beam round (emb on vec_id, adj on src), so
    // they cache pre-partitioned on those keys and the per-round joins
    // re-shuffle only the beam-sized side — the corpus-scaled frames
    // never cross the wire again. The partition count is SIZE-derived
    // (LoopState.adaptiveParts: one count job over the corpus, ~64 MB
    // per partition, clamped by spark.sql.shuffle.partitions), NOT the
    // session constant — the r18 attempt cached at the fixed session
    // count and toy data paid 32 tasks per stage where AQE coalesces
    // to ~2 (measured +1.5 s; reverted then, solved now).
    val emb0 = embeddings.select(col("vec_id"), col("embedding"))
    // corpus size from the INDEX GEOMETRY, not a count job: the entry
    // set is the top layer's members ≈ n/4^maxLevel by the
    // deterministic level draw, so n ≈ entries · 4^maxLevel — a
    // driver-side O(1) estimate (exact when the index is single-layer).
    // A count() here would be a full corpus scan per search call —
    // the one thing a static-cache sizing step must not add at 100 TB;
    // adaptiveParts only needs the order of magnitude.
    val nEmb = math.max(1L,
      index.entries.length.toLong << (2 * (index.layers.size - 1)))
    val embParts = LoopState.adaptiveParts(spark, nEmb, EmbBytesPerRow)
    val emb = emb0.repartition(embParts, col("vec_id")).cache()
    val qs = queries.select(col("q_id"), col("qvec")).localCheckpoint()
    val entriesDf = index.entries.toSeq.toDF("vec_id")
    var seeds = qs.select(col("q_id")).crossJoin(broadcast(entriesDf))
    var dots = 0L
    var beams = List.empty[(Int, DataFrame)]
    var scoredAll = List.empty[DataFrame]
    // top layer → base; upper layers route with a narrow beam
    index.layers.zipWithIndex.reverse.foreach { case (edges, l) =>
      val efL = if (l == 0) baseEf else narrowEf
      val roundsL = if (l == 0) maxRounds else math.max(2, maxRounds / 2)
      // layer l holds ~n/4^l members, each with ~degree out-edges
      // symmetrized — size its adjacency cache accordingly
      val adjParts = LoopState.adaptiveParts(spark,
        math.max(1L, nEmb >> (2 * l)), AdjBytesPerRow)
      val (b, d, s) = beamLayer(edges, emb, qs, seeds, efL, roundsL,
        countDots, adjParts)
      beams = (l, b) :: beams
      scoredAll = s :: scoredAll
      dots += d
      seeds = b.select(col("q_id"), col("vec_id"))
    }
    // every consumer of the returned frames reads checkpointed blocks,
    // so the static cache can go as soon as the descent is done
    emb.unpersist()
    (beams, dots, scoredAll.reduce(_ unionByName _))
  }

  /** Cache-sizing estimates for [[LoopState.adaptiveParts]]: a 64-dim
    * float embedding row ≈ 280 B; a layer member contributes
    * ~2·degree 16 B edge rows ≈ the same order. Order-of-magnitude
    * knobs — the count only decides how many ~64 MB cache partitions
    * the loop-static frames get. */
  private val EmbBytesPerRow = 300L
  private val AdjBytesPerRow = 256L

  /** One layer's frontier loop: seed pairs → converged beam of `ef`
    * scored candidates per query. Returns (beam, exact dots spent,
    * every scored pair — the beam's superset, one row per (q, v) the
    * loop evaluated). */
  private def beamLayer(edges: DataFrame, emb: DataFrame, qs: DataFrame,
      seedPairs: DataFrame, ef: Int, maxRounds: Int,
      countDots: Boolean, adjParts: Int): (DataFrame, Long, DataFrame) = {
    // symmetrize: descent must walk links both ways. Cached partitioned
    // on src — the key every round's frontier-expansion join probes —
    // at the size-derived count (see descendLayers): the dedup
    // aggregation runs inside the src partitioning (HashPartitioning(src)
    // clusters (src, dst) duplicates), so ONE exchange builds the cache
    // and no round re-shuffles the graph-sized side again.
    val adj = edges
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(adjParts, col("src"))
      .dropDuplicates("src", "dst")
      .cache()
    // self-match excluded up front (the Ann.search contract — query ids
    // share the corpus id namespace), so it never wastes a beam slot
    def score(pairs: DataFrame): DataFrame = pairs
      .filter(col("vec_id") =!= col("q_id"))
      .join(emb.hint("shuffle_hash"), Seq("vec_id"))
      .join(qs.hint("shuffle_hash"), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        Vectors.dot(col("embedding"), col("qvec")).as("score"))
    var dots = 0L
    var beam = LoopState.checkpoint(score(seedPairs.distinct())
      .withColumn("expanded", lit(false)))
    // dot accounting is one count job per checkpoint — the budget
    // audit pays it (searchCounted), the production search skips it
    if (countDots) dots += beam.count()
    // visited is a LAZY union over frames that are each checkpointed
    // (the seed beam + every round's scored) — no per-round checkpoint
    // job of its own, no recompute (each piece reads its cached blocks);
    // scoredAll is the same union WITH scores, kept for filtered search
    var visited = beam.select(col("q_id"), col("vec_id"))
    var scoredAll = beam.select(col("q_id"), col("vec_id"), col("score"))
    var frontierN = 1L
    var r = 0
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    while (frontierN > 0 && r < maxRounds) {
      val frontier = beam.filter(!col("expanded"))
        .select(col("q_id"), col("vec_id").as("src"))
      val cand = frontier
        .join(adj.hint("shuffle_hash"), Seq("src"))
        .select(col("q_id"), col("dst").as("vec_id"))
        .distinct()
        .join(visited.hint("shuffle_hash"), Seq("q_id", "vec_id"),
          "left_anti")
      val scored = LoopState.checkpoint(score(cand))
      if (countDots) dots += scored.count()
      visited = visited.union(scored.select(col("q_id"), col("vec_id")))
      scoredAll = scoredAll.union(scored)
      beam = LoopState.checkpoint(beam.withColumn("expanded", lit(true))
        .unionByName(scored.withColumn("expanded", lit(false)))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= ef)
        .drop("rnk"))
      r += 1
      // the convergence probe is pure loop control — when the round
      // budget is exhausted the loop exits regardless, so the last
      // round's count job is skipped (optimization r18).
      frontierN =
        if (r < maxRounds) beam.filter(!col("expanded")).count() else 0L
    }
    // beam and every scoredAll piece are checkpointed — the adjacency
    // cache has no consumers left
    adj.unpersist()
    (beam.drop("expanded"), dots, scoredAll)
  }

  /** Incremental maintenance — the HNSW INSERT, batched (grow-in-place,
    * the [[Ann.appendToIvf]] contract): each new vector keeps the SAME
    * deterministic level draw as build time (4-adic xxhash valuation,
    * so a later full rebuild assigns identical levels), descends the
    * EXISTING hierarchy to find its per-layer neighborhood (the
    * descent beam, run `degree` wide, IS the insert's candidate pool —
    * exactly HNSW's searchLayer-then-connect), and appends its
    * out-edges into every layer it inhabits. Existing graph rows are
    * untouched; search-time symmetrization makes the new nodes
    * reachable through their own out-edges. New top-layer members
    * extend the persisted entry set (ordered after the existing
    * entries — load order stays deterministic).
    *
    * Batch approximation, documented: new↔new links within one batch
    * are not formed (each insert sees only the pre-existing graph);
    * the periodic-rebuild discipline that owns model drift owns this
    * too. `embeddings` is the EXISTING corpus (the descent scores
    * candidates that are all existing members). */
  def append(spark: org.apache.spark.sql.SparkSession, dir: String,
      newVectors: DataFrame, embeddings: DataFrame, degree: Int = 16,
      maxRounds: Int = 10): Unit = {
    // layout guard (the appendToIvf discipline): refuse non-graph dirs
    // before writing anything
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/graph")) &&
      fs.exists(new org.apache.hadoop.fs.Path(s"$dir/entries")),
      s"$dir is not a graph index layout (graph/ + entries/) — " +
        "use the matching append for its index kind")
    val idx = load(spark, dir)
    val maxLevel = idx.layers.size - 1
    val newV = newVectors.select(col("vec_id"), col("embedding"))
      .localCheckpoint()
    val qs = newV.select(col("vec_id").as("q_id"),
      col("embedding").as("qvec"))
    val (beams, _, _) = descendLayers(idx, embeddings, qs,
      narrowEf = degree, baseEf = degree, maxRounds, countDots = false)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    beams.foreach { case (l, beam) =>
      val memberIds = newV
        .filter(pmod(xxhash64(col("vec_id")), lit(pow4(l))) === 0)
        .select(col("vec_id").as("q_id"))
      beam.join(memberIds.hint("shuffle_hash"), Seq("q_id"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= degree)
        .select(lit(l).as("layer"), col("q_id").as("src"),
          col("vec_id").as("dst"))
        .write.mode("append").partitionBy("layer").parquet(s"$dir/graph")
    }
    import spark.implicits._
    val newTop = newV
      .filter(pmod(xxhash64(col("vec_id")), lit(pow4(maxLevel))) === 0)
      .select("vec_id").orderBy("vec_id").as[Long].collect()
    if (newTop.nonEmpty) {
      val base = idx.entries.length
      newTop.toSeq.zipWithIndex.map { case (v, i) => (base + i, v) }
        .toDF("rnk", "vec_id")
        .coalesce(1).write.mode("append").parquet(s"$dir/entries")
    }
  }

  /** Persist / load — the `index --kind graph` layout: one parquet of
    * (layer, src, dst), the entry ids in order, and a meta parquet
    * carrying the LAYER COUNT. The count is load-bearing: an upper
    * layer whose tiny member set happened to build zero edges writes
    * no graph rows, and a load that reconstructed layers from the
    * DISTINCT layer values present would silently shift every higher
    * layer down one index — [[append]]'s pow4(maxLevel) membership
    * arithmetic would then file new top-layer members at the wrong
    * level. Materializing the recorded count (missing levels become
    * empty edge frames — a valid routing layer: its members still seed
    * from the layer above) keeps load ≡ the written index structurally,
    * not just on the layers that happened to have edges. */
  def write(index: GraphIndex, dir: String): Unit = {
    val spark = index.layers.head.sparkSession
    import spark.implicits._
    index.layers.zipWithIndex
      .map { case (g, l) => g.select(lit(l).as("layer"), col("src"), col("dst")) }
      .reduce(_ unionByName _)
      .write.mode("overwrite").partitionBy("layer").parquet(s"$dir/graph")
    // persist the ENTRY ORDER (rnk), not just the set — load must
    // reproduce the index bit-for-bit
    index.entries.toSeq.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("rnk", "vec_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/entries")
    Seq(index.layers.size).toDF("num_layers")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def load(spark: org.apache.spark.sql.SparkSession,
      dir: String): GraphIndex = {
    import spark.implicits._
    val g = spark.read.parquet(s"$dir/graph")
    val metaPath = new org.apache.hadoop.fs.Path(s"$dir/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nLayers =
      if (fs.exists(metaPath))
        spark.read.parquet(s"$dir/meta")
          .select(col("num_layers")).as[Int].head()
      else // pre-meta layout: every layer built edges, distinct is safe
        g.select(max(col("layer")).cast("int")).as[Int].head() + 1
    val layers = (0 until nLayers).map { l =>
      g.filter(col("layer") === l).select("src", "dst")
    }
    require(layers.nonEmpty, s"$dir/meta records zero layers")
    GraphIndex(layers,
      spark.read.parquet(s"$dir/entries")
        .orderBy("rnk").select("vec_id").as[Long].collect())
  }
}
