package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.EmbedNearDupStage

/** Developer tool: throughput of the streaming EMBEDDING near-dup stage
  * (probe assignment + registry verify join + in-batch verify + claim
  * write), the semantic sibling of [[ProfileCorpus]]. `args`: [nDocs]
  * [runs] [dim] [kCells].
  *
  * Synthetic corpus on the executors: unit vectors around kCells planted
  * cluster directions; every 5th doc is a near-dup (tiny perturbation)
  * of its group head — so the verify path carries real collisions. Each
  * run feeds 4 batches against a fresh registry; centroids = the planted
  * directions (the offline-trained coarse model).
  */
object ProfileEmbedDedup {

  private def mix(z0: Long): Long = ProfileBpe.mix(z0)

  private def gauss(seed: Long): Double = {
    // two uniform draws → Box-Muller (deterministic, executor-side)
    val u1 = ((mix(seed).abs % 1000000) + 1) / 1000001.0
    val u2 = (mix(seed * 31 + 7).abs % 1000000) / 1000000.0
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  def centroids(kCells: Int, dim: Int): Array[Array[Float]] =
    Array.tabulate(kCells) { c =>
      val v = Array.tabulate(dim)(j => gauss(c.toLong * 1009 + j))
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }

  def docs(spark: SparkSession, n: Long, dim: Int,
      kCells: Int): DataFrame = {
    import spark.implicits._
    val cents = centroids(kCells, dim)
    spark.range(0L, n).map { i =>
      val base = i - (i % 5) // every 5th doc shadows its group head
      val cell = (mix(base).abs % kCells).toInt
      val noise = if (i % 5 == 0) 0.3 else 0.01 // heads spread, dups tight
      val v = Array.tabulate(dim)(j =>
        cents(cell)(j) + noise * gauss(base * 131 + j * 17 + (i % 5) * 7))
      val nrm = math.sqrt(v.map(x => x * x).sum)
      (i, new java.sql.Timestamp(1700000000000L + i * 1000L),
        v.map(x => (x / nrm).toFloat).toSeq)
    }.toDF("doc_id", "ts", "embedding")
  }

  def onePass(corpus: DataFrame, nDocs: Long, cents: Array[Array[Float]])
      : (Double, Long) = {
    val reg = Files.createTempDirectory("prof-embed").toString + "/registry"
    val stage = EmbedNearDupStage(reg, watermarkMs = 3600L * 1000L,
      centroids = cents, tau = 0.95)
    val quarter = nDocs / 4
    val t0 = System.nanoTime()
    var kept = 0L
    for (e <- 0 until 4) {
      val batch = corpus.filter(col("doc_id") >= e * quarter &&
        col("doc_id") < (e + 1) * quarter)
      kept += stage.process(batch, e.toLong).count()
    }
    (nDocs / ((System.nanoTime() - t0) / 1e9), kept)
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-embed-dedup")
    val nDocs = args.headOption.map(_.toLong).getOrElse(100000L)
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val dim = args.lift(2).map(_.toInt).getOrElse(64)
    val kCells = args.lift(3).map(_.toInt).getOrElse(math.max(16,
      (nDocs / 1000L).toInt))
    val cents = centroids(kCells, dim)
    val corpus = docs(spark, nDocs, dim, kCells).persist()
    corpus.count()
    for (r <- 1 to runs) {
      val (dps, kept) = onePass(corpus, nDocs, cents)
      println(f"EMBED run$r%d ${dps}%.0f docs/s (kept $kept%d of $nDocs%d)")
    }
    spark.stop()
  }
}
