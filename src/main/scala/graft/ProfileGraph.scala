package graft

import org.apache.spark.sql.functions._

/** Scale sweep for the round-11 graph additions: triangle counting
  * (degree-oriented wedge join) and k-core peeling on the FULL
  * co-purchase / trade graphs at sf0.01 and sf0.1 — the evidence the
  * declared bench-sized configs (qty>30 projection, k=10) ride the
  * same plans that hold at 10× the edges.
  *
  * Usage: runMain graft.ProfileGraph [sfDir ...]
  */
object ProfileGraph {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-graph")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    dirs.foreach { d =>
      val t0 = System.nanoTime()
      val tri = queries.Graph.triangleCount(spark, d).collect().head
      val triSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val core = queries.Graph.kCore(spark, d, k = 10)
        .agg(count(lit(1)), sum(col("core_degree"))).collect().head
      val coreSec = (System.nanoTime() - t1) / 1e9
      // r14: label propagation on the full trade graph — community
      // count + coverage at 10× the edges on the same per-round plan
      val t2 = System.nanoTime()
      val comm = queries.Graph.labelPropagation(spark, d)
        .agg(count(lit(1)), countDistinct(col("label"))).collect().head
      val commSec = (System.nanoTime() - t2) / 1e9
      // r15: BFS hop layers + modularity at 10× the edges — both ride
      // the LPA/PR per-round plan, so the sweep should stay near-flat
      val t3 = System.nanoTime()
      val hops = queries.Graph.hopDistance(spark, d)
        .agg(count(lit(1)), max(col("hops"))).collect().head
      val hopsSec = (System.nanoTime() - t3) / 1e9
      val t4 = System.nanoTime()
      val qual = queries.Graph.communitiesQuality(spark, d)
        .agg(count(lit(1)), sum(col("mod_u"))).collect().head
      val qualSec = (System.nanoTime() - t4) / 1e9
      println(f"GRAPH $d full-graph: triangles=${tri.getLong(0)} " +
        f"edges=${tri.getLong(1)} in $triSec%.2fs; " +
        f"10-core nodes=${core.getLong(0)} " +
        f"coreEdges=${core.getLong(1) / 2} in $coreSec%.2fs; " +
        f"lpa nodes=${comm.getLong(0)} " +
        f"communities=${comm.getLong(1)} in $commSec%.2fs; " +
        f"hops reached=${hops.getLong(0)} " +
        f"maxHop=${hops.getLong(1)} in $hopsSec%.2fs; " +
        f"modularity communities=${qual.getLong(0)} " +
        f"totalQ_u=${qual.getLong(1)} in $qualSec%.2fs")
    }
    spark.stop()
  }
}
