package graft

import org.apache.spark.sql.functions._

import graft.operators.KnnJoin

/** Developer tool: kNN-graph construction throughput at scale.
  * `args`: [nVecs] [dim] [kCells] [probes] [topK] [descentRounds].
  *
  * Reuses [[ProfileEmbedDedup]]'s planted-cluster corpus (unit vectors
  * around kCells directions) so cells have real structure. Reports the
  * IVF-join graph build rate and, optionally, NN-Descent rounds on
  * top — the two knobs a 100 TB deployment trades (probe fraction vs
  * descent rounds).
  */
object ProfileKnn {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-knn")
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(32)
    val kCells = args.lift(2).map(_.toInt).getOrElse(
      math.max(16, (n / 1000L).toInt))
    val probes = args.lift(3).map(_.toInt).getOrElse(2)
    val topK = args.lift(4).map(_.toInt).getOrElse(10)
    val rounds = args.lift(5).map(_.toInt).getOrElse(1)
    val corpus = ProfileEmbedDedup.docs(spark, n, dim, kCells)
      .select(col("doc_id").as("vec_id"), col("embedding"))
      .persist()
    corpus.count()

    val tIdx = System.nanoTime()
    val idx = graft.operators.Ann.buildIvf(corpus, kCells, iters = 2)
    idx.assignments.count()
    val idxSec = (System.nanoTime() - tIdx) / 1e9
    println(f"INDEX n=$n%d cells=$kCells%d ${idxSec}%.1fs")

    val t0 = System.nanoTime()
    val graph = KnnJoin.knnGraphOnIndex(idx, corpus, topK, probes)
      .persist()
    val edges = graph.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    println(f"GRAPH n=$n%d cells=$kCells%d probes=$probes%d " +
      f"edges=$edges%d ${buildSec}%.1fs (${n / buildSec}%.0f vec/s)")

    if (rounds > 0) {
      val t1 = System.nanoTime()
      val refined = KnnJoin.refine(graph, corpus, topK, rounds)
      val redges = refined.count()
      val refSec = (System.nanoTime() - t1) / 1e9
      println(f"DESCENT rounds=$rounds%d edges=$redges%d ${refSec}%.1fs " +
        f"(${n / refSec}%.0f vec/s)")
    }
    spark.stop()
  }
}
