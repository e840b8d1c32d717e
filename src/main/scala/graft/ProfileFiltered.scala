package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ann, FilteredSearch, GraphAnn}

/** Developer tool: metadata-filtered search at corpus scale. `args`:
  * [n] [dim] [nQueries].
  *
  * One clustered corpus, three predicate selectivities (1%, 10%, 50%),
  * three plans each where applicable — exact eligible-subset scan,
  * filtered IVF (nprobe widened by 1/selectivity, capped at kCells),
  * filter-during-search graph descent — with recall@10 vs the exact
  * plan and wall time per, so the router's crossover is a measured
  * number (PLANS.md records the sweep). */
object ProfileFiltered {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-filtered")
    import spark.implicits._
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(48)
    val nQ = args.lift(2).map(_.toInt).getOrElse(16)
    val emb = ProfileDbscan.corpus(spark, n, dim).localCheckpoint()
    val queries = emb.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
      .localCheckpoint()
    val kCells = math.max(16, (n / 1000L).toInt)
    println(s"FILTERED building IVF (kCells=$kCells) + graph indexes...")
    // materialize the assignments INTO the searched index —
    // localCheckpoint returns a new frame, so the timed sweeps would
    // otherwise recompute the k-means assignment scan per search
    val ivf0 = Ann.buildIvf(emb, kCells, iters = 2)
    val ivf = Ann.IvfIndex(ivf0.assignments.localCheckpoint(),
      ivf0.centroids)
    val graph = GraphAnn.build(emb, degree = 12, kCells = kCells,
      iters = 2, probes = 2, descentRounds = 1)

    def recall(got: DataFrame, truth: Map[Long, Set[Long]]): Double = {
      val mine = got.select("q_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val per = truth.map { case (q, t) =>
        mine.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      per.sum / per.size
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    for (pct <- Seq(1, 10, 50)) {
      val elig = emb
        .filter(pmod(xxhash64(col("vec_id")), lit(100)) < pct)
        .select("vec_id").localCheckpoint()
      val nElig = elig.count()
      val (truthRows, tExact) = timed {
        FilteredSearch.exactFiltered(emb, queries, elig, 10)
          .select("q_id", "vec_id").as[(Long, Long)].collect()
      }
      val truth = truthRows.groupBy(_._1).view
        .mapValues(_.map(_._2).toSet).toMap
      val nprobe = math.min(kCells, math.max(4, kCells * 8 / pct / 10))
      val (rIvf, tIvf) = timed {
        recall(Ann.searchFiltered(ivf, queries, elig, 10, nprobe), truth)
      }
      val ef = math.min(1024, 32 * 100 / pct)
      val (rGraph, tGraph) = timed {
        recall(GraphAnn.searchFiltered(graph, emb, queries, elig, 10,
          ef), truth)
      }
      println(f"FILTERED n=$n%d sel=$pct%d%% |elig|=$nElig%d " +
        f"exact=${tExact}%.2fs " +
        f"ivf(nprobe=$nprobe%d)=${tIvf}%.2fs r=${rIvf}%.3f " +
        f"graph(ef=$ef%d)=${tGraph}%.2fs r=${rGraph}%.3f")
    }
    spark.stop()
  }
}
