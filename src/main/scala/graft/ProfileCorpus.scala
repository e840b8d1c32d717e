package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.NearDupStage

/** Developer tool: throughput of the streaming MinHash/LSH near-dup
  * stage (signature + banding + registry join + claim write), the
  * corpus analogue of [[ProfileIngest]]. `args`: [nDocs] [runs].
  *
  * Synthetic corpus, generated ON the executors: ~100-token documents;
  * every 5th doc is a near-duplicate (one token changed) of an earlier
  * doc in the SAME quarter, every 11th an exact duplicate from a
  * PREVIOUS quarter — so both the in-batch and the cross-batch
  * collision paths carry real traffic. Each run feeds 4 batches
  * against a fresh registry.
  */
object ProfileCorpus {

  def docs(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0L, n).map { i =>
      val base = i - (i % 5)    // every 5th doc shadows its group head
      val seed = if (i % 5 == 0 || i % 11 != 0) base else base % 997
      val toks = (1 to 100).map(t => s"w${seed}_$t").toArray
      if (i % 5 != 0 && i % 5 < 3) toks(50) = s"CHANGED$i" // near-dup
      (i, new java.sql.Timestamp(1700000000000L + i * 1000L),
        toks.mkString(" "), s"src${i % 7}")
    }.toDF("doc_id", "ts", "text", "source")
  }

  /** One measured pass: nDocs in 4 epoch batches through NearDupStage
    * (fresh registry) via processWith, counting survivors as the sink.
    * Returns (docs/s, kept). Shared with graft.Bench so the
    * `neardup_docs_per_sec` metric and this profiler can never diverge. */
  def onePass(corpus: DataFrame, nDocs: Long): (Double, Long) = {
    val reg = Files.createTempDirectory("prof-corpus").toString + "/registry"
    val stage = NearDupStage(reg, watermarkMs = 3600L * 1000L)
    val quarter = nDocs / 4
    val t0 = System.nanoTime()
    var kept = 0L
    for (e <- 0 until 4) {
      val batch = corpus
        .filter(col("doc_id") >= e * quarter &&
          col("doc_id") < (e + 1) * quarter)
      stage.processWith(batch, e.toLong)(s => kept += s.count())
    }
    (nDocs / ((System.nanoTime() - t0) / 1e9), kept)
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-corpus")
    val nDocs = args.headOption.map(_.toLong).getOrElse(100000L)
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val corpus = docs(spark, nDocs).persist()
    corpus.count()
    for (r <- 1 to runs) {
      val (dps, kept) = onePass(corpus, nDocs)
      println(f"corpus run$r ${nDocs / dps}%.3f s  $dps%.0f docs/s" +
        f"  kept=$kept dropped=${nDocs - kept}")
    }
    spark.stop()
  }
}
