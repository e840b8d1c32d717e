package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Dbscan}

/** Developer tool: the DBSCAN scale claim, measured. `args`: [n] [runs]
  * [dim] [probes].
  *
  * Sweeps the IVF-cell ε-pair generator + labeler at n and 10n with
  * kCells ∝ n (the production rule: cell size stays constant) and
  * probes FIXED — the configuration where candidate volume is
  * ~probes·n·cellSize, i.e. LINEAR in the corpus, vs the all-pairs
  * baseline's n². Prints the measured candidate counts alongside wall
  * time so the near-linear claim is a number, not prose
  * (PLANS.md records the sweep).
  */
object ProfileDbscan {

  private def mix(z0: Long): Long = ProfileBpe.mix(z0)

  private def gauss(seed: Long): Double = {
    val u1 = ((mix(seed).abs % 1000000) + 1) / 1000001.0
    val u2 = (mix(seed * 31 + 7).abs % 1000000) / 1000000.0
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** Clustered unit vectors around n/1000 planted directions —
    * executor-side, zero RNG state on the driver. */
  /** Shared clustered-corpus generator (DbscanSpec and
    * FilteredSearchSpec call it too — ONE fixture shape, parameterized,
    * instead of drifting copies). Default kGroups ∝ n (constant cluster
    * SIZE): cluster count grows with the corpus, intra-cluster ε-edges
    * stay linear. A fixture with FIXED cluster count grows each
    * cluster's ε-clique quadratically — real DBSCAN output is itself
    * quadratic on such data, so that shape measures the data, not the
    * engine. */
  def corpus(spark: SparkSession, n: Long, dim: Int, kGroups: Int = -1,
      noise: Double = 0.08): DataFrame = {
    import spark.implicits._
    val kg = if (kGroups > 0) kGroups else math.max(20, (n / 1000L).toInt)
    val cents = Array.tabulate(kg) { c =>
      val v = Array.tabulate(dim)(j => gauss(c.toLong * 1009 + j))
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / nrm).toFloat)
    }
    val bc = spark.sparkContext.broadcast(cents)
    spark.range(0L, n).map { i =>
      val cs = bc.value
      val g = (mix(i).abs % cs.length).toInt
      val v = Array.tabulate(dim)(j =>
        cs(g)(j) + noise * gauss(i * 131 + j * 17))
      val nrm = math.sqrt(v.map(x => x * x).sum)
      (i, v.map(x => (x / nrm).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
  }

  /** Candidate volume of the cell join at this (kCells, probes) — the
    * quantity whose growth rate IS the scale claim. */
  def candidateCount(emb: DataFrame, kCells: Int, probes: Int): Long = {
    val idx = Ann.buildIvf(emb, kCells, iters = 2)
    val p = math.min(probes, idx.centroids.length)
    val probeCells = graft.functions.QuantExpressions.nearestCells(
      col("embedding"), idx.centroids.flatten, idx.centroids.length,
      idx.centroids.head.length, p)
    emb.select(explode(probeCells).as("cell_id"))
      .join(idx.assignments.groupBy("cell_id")
        .agg(count(lit(1)).as("sz")), Seq("cell_id"))
      .agg(sum("sz")).head().getLong(0)
  }

  def onePass(emb: DataFrame, kCells: Int, probes: Int): (Double, Long, Long) = {
    val t0 = System.nanoTime()
    val labeled = Dbscan.label(emb,
      Dbscan.epsPairsIvf(emb, eps = 0.75, kCells = kCells, probes = probes),
      minPts = 4).localCheckpoint()
    val clusters = labeled.filter(col("cluster") >= 0)
      .select(col("cluster")).distinct().count()
    val noise = labeled.filter(col("cluster") === -1).count()
    ((System.nanoTime() - t0) / 1e9, clusters, noise)
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-dbscan")
    val n = args.headOption.map(_.toLong).getOrElse(20000L)
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val dim = args.lift(2).map(_.toInt).getOrElse(48)
    val probes = args.lift(3).map(_.toInt).getOrElse(4)
    for (scale <- Seq(1L, 10L)) {
      val nn = n * scale
      val kCells = math.max(8, (nn / 1000L).toInt) // cellSize ≈ 1000 held
      val emb = corpus(spark, nn, dim).localCheckpoint()
      val cand = candidateCount(emb, kCells, probes)
      println(f"DBSCAN n=$nn%d kCells=$kCells%d probes=$probes%d " +
        f"candidates=$cand%d (${cand.toDouble / nn}%.0f per vector; " +
        f"all-pairs would be ${nn * (nn - 1) / 2}%d)")
      for (r <- 1 to runs) {
        val (sec, clusters, noise) = onePass(emb, kCells, probes)
        println(f"DBSCAN n=$nn%d run$r%d $sec%.2f s " +
          f"(${nn / sec}%.0f vec/s, $clusters%d clusters, $noise%d noise)")
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
