package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Pq, SemDedup}

/** Scale sweep for the embedding operators (SemDeDup, PQ) — the
  * evidence that the round-8 additions hold past the 2k-vector test
  * tables, same discipline as the 5M-doc dedup sweep (PLANS round 6).
  *
  * Synthetic corpus: deterministic 64-dim unit vectors from xxhash64
  * (no RNG, rerunnable); every 50th-plus-one vector is a near-copy of
  * its predecessor (small additive perturbation before normalization),
  * planting ~2% semantic duplicates with known structure.
  *
  * Usage: runMain graft.ProfileAnn [n ...]   (default 50000 200000 500000)
  */
object ProfileAnn {

  /** Deterministic pseudo-random unit vectors with planted near-dups.
    * All column math — generation scales with the cluster, not the
    * driver. */
  def vectors(spark: SparkSession, n: Long): DataFrame = {
    val dim = 64
    val ids = spark.range(0L, n).select(col("id").as("vec_id"))
    // seed: dup rows (id % 50 == 1) reuse the predecessor's seed
    val seeded = ids.withColumn("seed",
      when(col("vec_id") % 50 === 1, col("vec_id") - 1)
        .otherwise(col("vec_id")))
    // raw_j in [-1,1] from xxhash64(seed, j); dups add a small
    // deterministic perturbation so cosine lands high but below 1
    val raw = seeded.withColumn("raw", expr(
      s"""transform(sequence(0, ${dim - 1}), j ->
         |  cast(xxhash64(seed, j) as double) / 9.223372036854776e18 +
         |  if(vec_id % 50 = 1,
         |     0.05 * cast(xxhash64(vec_id, j) as double) / 9.223372036854776e18,
         |     cast(0.0 as double)))
         |""".stripMargin))
    // norm computed ONCE per row — inlining the 64-element aggregate
    // inside the transform would re-fold it per output element (64×)
    raw
      .withColumn("nrm", expr(
        "sqrt(aggregate(raw, cast(0.0 as double), (a, e) -> a + e * e))"))
      .select(col("vec_id"),
        expr("transform(raw, x -> cast(x / nrm as float))").as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-ann")
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(50000L, 200000L, 500000L)
    for (n <- sizes) {
      val emb = vectors(spark, n).persist()
      emb.count() // materialize off the clock
      // k ∝ n keeps the per-cell pair volume — and so total candidate
      // work per vector — constant: the linear-scaling contract
      val k = (n / 1000).toInt.max(16)

      var t0 = System.nanoTime()
      val sem = SemDedup.semDedup(emb, k = k, iters = 2, tau = 0.9,
        probes = 2)
      val dropped = sem.filter(!col("kept")).count()
      val semSec = (System.nanoTime() - t0) / 1e9
      val planted = (n + 48) / 50 // ids ≡ 1 (mod 50) in [0, n)
      println(f"ANN n=$n%d semdedup k=$k sec=$semSec%.1f " +
        f"dropped=$dropped%d planted=$planted%d " +
        f"recall=${dropped.toDouble / planted}%.3f")

      t0 = System.nanoTime()
      val model = Pq.train(emb, m = 16, k = 16, iters = 2)
      val trainSec = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val codes = Pq.encode(emb, model).persist()
      codes.count()
      val encSec = (System.nanoTime() - t0) / 1e9
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
      t0 = System.nanoTime()
      val hits = Pq.searchRerank(codes, model, emb, queries,
        topK = 10, shortlist = 50).count()
      val searchSec = (System.nanoTime() - t0) / 1e9
      println(f"ANN n=$n%d pq train=$trainSec%.1f encode=$encSec%.1f " +
        f"(${n / encSec}%.0f vec/s) search=$searchSec%.1f hits=$hits%d")
      codes.unpersist(); emb.unpersist()
    }
    spark.stop()
  }
}
