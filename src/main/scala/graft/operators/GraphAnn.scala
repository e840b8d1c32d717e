package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Graph-based ANN search (the HNSW/Vamana family — Malkov & Yashunin
  * 2016, "Efficient and robust approximate nearest neighbor search
  * using Hierarchical Navigable Small World graphs"; Subramanya et al.
  * 2019, DiskANN): beam search over a proximity graph. The missing
  * production shape beside IVF/PQ — on clustered data, greedy descent
  * through neighbor links reaches the true neighborhood with FAR fewer
  * exact-dot evaluations than a cell probe scans.
  *
  * The index IS the [[KnnJoin]] kNN graph (optionally NN-Descent
  * refined), symmetrized — undirected links are what make descent
  * navigable both ways — plus a fixed entry-point set: the vectors
  * nearest the corpus centroid (the Vamana medoid discipline;
  * deterministic, computed once at build time).
  *
  * Search, distributed as ITERATIVE FRONTIER JOINS (the PageRank/CC
  * loop discipline — ALL queries advance one hop per round, the driver
  * loop only counts for convergence):
  *  - state per query: a beam of the best `ef` scored candidates, each
  *    flagged expanded-or-not, plus the visited set;
  *  - per round: the unexpanded beam rows (the frontier) join the
  *    adjacency list for their neighbors; an anti-join against visited
  *    drops re-finds BEFORE the embedding fetch (each (q, v) pair is
  *    scored exactly once per search — the budget is auditable); new
  *    candidates score against their query vector and merge into the
  *    beam through the spillable rank window (the WindowGroupLimit
  *    shape — never a per-group buffer);
  *  - converged when no unexpanded row survives the beam cut (a
  *    strictly-better frontier must keep displacing the tail), or at
  *    `maxRounds`.
  *
  * All joins carry corpus-scaled sides ⇒ SHUFFLE_HASH-pinned (the AQE
  * compressed-size mispromotion documented in SetSimJoin). Per-round
  * frontier work is O(|frontier|·degree) candidate rows — graph-sized,
  * never corpus×corpus. At 100 TB the graph and embeddings partition
  * by vec_id and the loop's joins co-locate on that key; beam state is
  * queries×ef rows.
  */
object GraphAnn {

  /** Build the searchable index: refined kNN graph (symmetrized at
    * search time) + entry points. `degree` is the out-degree of the
    * stored graph — the navigability dial (HNSW's M). */
  def build(embeddings: DataFrame, degree: Int = 16, kCells: Int = 64,
      iters: Int = 2, probes: Int = 2, descentRounds: Int = 1,
      nEntries: Int = 4): GraphIndex = {
    val graph = {
      val rough = KnnJoin.knnGraph(embeddings, degree, kCells, iters, probes)
      if (descentRounds > 0)
        KnnJoin.refine(rough, embeddings, degree, descentRounds)
      else rough
    }
    GraphIndex(graph.select(col("q_id").as("src"), col("vec_id").as("dst")),
      entryPoints(embeddings, nEntries))
  }

  final case class GraphIndex(edges: DataFrame, entries: Array[Long])

  /** The `nEntries` vectors nearest the corpus centroid (medoid-style
    * fixed entry set). One posexplode aggregation for the centroid
    * (fully distributed, dim-sized result) + one TakeOrdered pass. */
  private[operators] def entryPoints(embeddings: DataFrame,
      nEntries: Int): Array[Long] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centroid = embeddings
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("pos").agg(avg(col("x")).as("m"))
      .orderBy("pos").select("m").as[Double].collect()
      .map(_.toFloat)
    embeddings
      .select(col("vec_id"),
        Vectors.dot(col("embedding"), typedLit(centroid.toSeq)).as("s"))
      .orderBy(col("s").desc, col("vec_id").asc)
      .limit(nEntries)
      .select("vec_id").as[Long].collect()
  }

  /** Beam search: (q_id, rnk, vec_id, cos) — the [[Ann.search]] output
    * contract. `queries` is (q_id, qvec). */
  def search(index: GraphIndex, embeddings: DataFrame, queries: DataFrame,
      topK: Int, ef: Int = 32, maxRounds: Int = 10): DataFrame =
    searchCounted(index, embeddings, queries, topK, ef, maxRounds)._1

  /** Same, returning the exact-dot evaluation count (scored pairs) —
    * the budget the spec compares against IVFPQ's shortlist. */
  private[operators] def searchCounted(index: GraphIndex,
      embeddings: DataFrame, queries: DataFrame, topK: Int, ef: Int,
      maxRounds: Int): (DataFrame, Long) = {
    require(ef >= topK, s"beam width ef=$ef must be >= topK=$topK")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val emb = embeddings.select(col("vec_id"), col("embedding"))
      .localCheckpoint()
    val qs = queries.select(col("q_id"), col("qvec")).localCheckpoint()
    // symmetrize: descent must walk links both ways
    val adj = index.edges
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .localCheckpoint()

    // self-match excluded up front (the Ann.search contract — query ids
    // share the corpus id namespace), so it never wastes a beam slot
    def score(pairs: DataFrame): DataFrame = pairs
      .filter(col("vec_id") =!= col("q_id"))
      .join(emb.hint("shuffle_hash"), Seq("vec_id"))
      .join(qs.hint("shuffle_hash"), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        Vectors.dot(col("embedding"), col("qvec")).as("score"))

    val entriesDf = index.entries.toSeq.toDF("vec_id")
    var scoredPairs = 0L
    // init: every query scores the shared entry set
    val seed = qs.select(col("q_id")).crossJoin(broadcast(entriesDf))
    var beam = score(seed)
      .withColumn("expanded", lit(false))
      .localCheckpoint()
    scoredPairs += beam.count()
    var visited = beam.select(col("q_id"), col("vec_id")).localCheckpoint()
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
      val scored = score(cand).localCheckpoint()
      scoredPairs += scored.count()
      visited = visited
        .union(scored.select(col("q_id"), col("vec_id")))
        .localCheckpoint()
      beam = beam.withColumn("expanded", lit(true))
        .unionByName(scored.withColumn("expanded", lit(false)))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= ef)
        .drop("rnk")
        .localCheckpoint()
      frontierN = beam.filter(!col("expanded")).count()
      r += 1
    }
    val out = beam
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("vec_id"),
        round(col("score"), 6).as("cos"))
      .orderBy("q_id", "rnk")
    (out, scoredPairs)
  }

  /** Persist / load — the `index --kind graph` layout: the edge list
    * plus the entry vector ids. */
  def write(index: GraphIndex, dir: String): Unit = {
    val spark = index.edges.sparkSession
    import spark.implicits._
    index.edges.select("src", "dst")
      .write.mode("overwrite").parquet(s"$dir/graph")
    index.entries.toSeq.toDF("vec_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/entries")
  }

  def load(spark: org.apache.spark.sql.SparkSession,
      dir: String): GraphIndex = {
    import spark.implicits._
    GraphIndex(spark.read.parquet(s"$dir/graph"),
      spark.read.parquet(s"$dir/entries")
        .orderBy("vec_id").select("vec_id").as[Long].collect())
  }
}
