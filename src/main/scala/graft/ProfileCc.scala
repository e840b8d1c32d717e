package graft

import org.apache.spark.sql.functions._

/** Scale/convergence sweep for the r15 star-contraction components:
  * million-scale graphs in the layouts that separate O(log²) from
  * O(diameter) — a monotone chain (pointer jumping's best case), a
  * REVERSED-id chain (its worst: every local min is a knowledge
  * dead-end, the old loop would need ~diameter rounds), and a random
  * graph. Each reports wall time and the label correctness signature
  * (components, min label, node count) against the known answer.
  *
  * Usage: runMain graft.ProfileCc [nNodes]
  */
object ProfileCc {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-cc")
    import spark.implicits._
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)

    def drive(name: String, edges: org.apache.spark.sql.DataFrame,
        expectComps: Long, expectMin: Long, expectNodes: Long): Unit = {
      val e = edges.localCheckpoint()
      val t0 = System.nanoTime()
      val got = graft.operators.Dedup.connectedComponents(e)
        .agg(countDistinct(col("comp")), min("comp"), count(lit(1)))
        .as[(Long, Long, Long)].head()
      val sec = (System.nanoTime() - t0) / 1e9
      val ok = got == ((expectComps, expectMin, expectNodes))
      println(f"CC $name n=$n: $sec%.2fs " +
        f"(comps=${got._1} min=${got._2} nodes=${got._3}) " +
        (if (ok) "OK" else s"WRONG expected ($expectComps,$expectMin,$expectNodes)"))
    }

    // monotone chain 0-1-2-…: ids increase along the path
    drive("chain-monotone",
      spark.range(n - 1).select(col("id").as("src"),
        (col("id") + 1).as("dst")),
      1L, 0L, n)
    // reversed-id chain: node i sits at position n-1-i — every local
    // min points AWAY from the component min, the old loop's worst case
    drive("chain-reversed",
      spark.range(n - 1).select((lit(n - 1) - col("id")).as("src"),
        (lit(n - 1) - col("id") - 1).as("dst")),
      1L, 0L, n)
    // random graph, ~2 edges/node: a few giant components + dust
    val rnd = spark.range(2 * n).select(
      pmod(xxhash64(col("id"), lit(1L)), lit(n)).as("src"),
      pmod(xxhash64(col("id"), lit(2L)), lit(n)).as("dst"))
      .filter(col("src") =!= col("dst")).localCheckpoint()
    val t0 = System.nanoTime()
    val got = graft.operators.Dedup.connectedComponents(rnd)
      .agg(countDistinct(col("comp")), count(lit(1)))
      .as[(Long, Long)].head()
    println(f"CC random n=$n: ${(System.nanoTime() - t0) / 1e9}%.2fs " +
      f"(comps=${got._1} nodes=${got._2})")
    spark.stop()
  }
}
