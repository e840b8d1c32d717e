package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared planted-corpus fixture for the dedup-operator regression
  * guards — the spec-sized analogue of the 5M-doc sweep's "boiler"
  * corpus (PLANS.md round 6): every doc carries the same boilerplate
  * block (hot shingles, df = nDocs — the cookie-banner / nav-chrome
  * shape) plus a unique tail, and each doc in the first half has one
  * planted near-dup partner (single tail token changed, J ≈ 0.82) in
  * the second half. Deterministic by construction (no RNG anywhere;
  * minhash is xxhash-seeded), so counts asserted on it are constants
  * of the corpus, not flaky draws.
  */
object BoilerCorpus {

  /** (doc_id, n, sset) rows — distinct 3-shingle sets, the shape the
    * dedup cascade builds. */
  def planted(spark: SparkSession, nDocs: Int): DataFrame = {
    import spark.implicits._
    val half = nDocs / 2
    val boiler = (1 to 12).map(i => s"boiler$i").mkString(" ")
    def uniq(i: Int) = (1 to 20).map(j => s"u${i}_$j").mkString(" ")
    val texts = (0 until half).map(i => (i.toLong, s"$boiler ${uniq(i)}")) ++
      (0 until half).map { i =>
        val t = s"$boiler ${uniq(i)}".split(" "); t(20) = "CHANGED"
        ((i + half).toLong, t.mkString(" "))
      }
    texts.toDF("doc_id", "text")
      .select(col("doc_id"), array_distinct(
        graft.functions.TextFunctions.shingles3(col("text"))).as("sset"))
      .select(col("doc_id"), size(col("sset")).as("n"), col("sset"))
  }

  /** The planted ground-truth near-dup pairs: (i, i + nDocs/2). */
  def plantedPairs(nDocs: Int): Set[(Long, Long)] =
    (0 until nDocs / 2).map(i => (i.toLong, (i + nDocs / 2).toLong)).toSet
}
