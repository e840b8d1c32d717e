package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Metadata-filtered vector search — top-k under a row predicate, the
  * shape every production retrieval deployment hits (lang = 'en',
  * quality ≥ q, date range …) and that neither a bare IVF probe nor
  * the graph index covers on its own.
  *
  * The selectivity regimes and their right plans (the Qdrant/Weaviate
  * cardinality-routing rule, same discipline as [[SetSimJoin]]'s
  * `edgesAuto`):
  *
  *  - SELECTIVE predicate (few eligible rows): scan the eligible
  *    subset exactly — [[exactFiltered]]. The predicate prunes the
  *    scan itself (pushed to parquet on a real column), the query set
  *    broadcasts, and the whole thing is one map-side pass over
  *    |eligible| rows. Exact by construction; linear in the SURVIVORS,
  *    not the corpus.
  *  - BROAD predicate: filter-during-search on the graph index —
  *    [[GraphAnn.searchFiltered]] (navigation unfiltered, ranking
  *    filtered) with the beam widened by 1/selectivity so ~k eligible
  *    survivors are expected in the visited pool.
  *
  * [[auto]] measures |eligible| with one aggregation and routes; the
  * crossover is where the exact scan's |eligible| dots exceed the
  * graph search's ~ef·degree·rounds budget — at production scale the
  * exact path wins far beyond 1% selectivity because it reads only
  * predicate-pruned partitions. Never post-filters: the failure mode
  * this operator exists to avoid (top-k of k·sel expected survivors).
  */
object FilteredSearch {

  /** Exact filtered brute force: score every eligible vector against
    * every query (broadcast — queries are a driver-small set), rank
    * top-k. The oracle baseline AND the production plan for selective
    * predicates. `eligible` is (vec_id)-keyed; `corpus` is
    * (vec_id, embedding). */
  def exactFiltered(corpus: DataFrame, queries: DataFrame,
      eligible: DataFrame, topK: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    corpus
      .join(eligible.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(queries.select(col("q_id"), col("qvec"))))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(Vectors.dot(col("embedding"), col("qvec")), 6).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select("q_id", "rnk", "vec_id", "cos")
      .orderBy("q_id", "rnk")
  }

  /** Cardinality-routed filtered search. `scanBudget` is the exact
    * path's cutover: eligible sets at or below it scan exactly (the
    * dominant production case for selective predicates); above it the
    * graph search runs with `ef` widened by corpus/eligible, capped at
    * `efCap` (a beam wider than the eligible set is a scan — route
    * accordingly). Returns (q_id, rnk, vec_id, cos). */
  def auto(index: GraphAnn.GraphIndex, corpus: DataFrame,
      queries: DataFrame, eligible: DataFrame, topK: Int, ef: Int = 32,
      scanBudget: Long = 100000L, efCap: Int = 1024,
      maxRounds: Int = 10): DataFrame = {
    val elig = eligible.select(col("vec_id")).localCheckpoint()
    val nElig = elig.count()
    if (nElig <= scanBudget)
      exactFiltered(corpus, queries, elig, topK)
    else {
      // corpus count only on the graph branch — the routed-exact case
      // (the dominant one) must not pay a corpus-wide aggregation
      val n = corpus.count()
      val widened = math.min(efCap.toLong,
        math.max(ef.toLong, ef.toLong * n / math.max(1L, nElig))).toInt
      GraphAnn.searchFiltered(index, corpus, queries, elig, topK,
        widened, maxRounds)
    }
  }
}
