package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Distributed BPE training must be bit-identical to the classical
  * single-threaded algorithm (same winner rule, same left-to-right
  * apply), and deterministic across runs. */
class BpeSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("distributed merges equal the single-threaded reference") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val distributed = Bpe.train(docs, nMerges = 12)
      .as[(Int, String, String, Long)].collect().toSeq
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .as[(String, Long)].collect().toMap
    val reference = Bpe.trainLocal(words, nMerges = 12)
    assert(distributed == reference)
    assert(distributed.size == 12)
    // merges in learning order, each rank once
    assert(distributed.map(_._1) == (1 to 12))
  }

  test("handcrafted corpus: winner rule and overlap semantics") {
    import spark.implicits._
    // "aaab" x3, "ab" x2: pairs (a,a)=6, (a,b)=5 → first merge (a,a);
    // left-to-right apply on "aaab" gives [aa, a, b], NOT [a, aa, b]
    val docs = Seq("aaab aaab aaab ab ab").toDF("text")
    val merges = Bpe.train(docs, nMerges = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges.head == ((1, "a", "a", 6L)))
    // after merge 1: "aaab" → [aa, a, b] (pairs (aa,a)=3, (a,b)=5 w/ ab)
    assert(merges(1) == ((2, "a", "b", 5L)))
  }

  test("training is deterministic across runs") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = Bpe.train(docs, 8).as[(Int, String, String, Long)].collect().toSeq
    val b = Bpe.train(docs, 8).as[(Int, String, String, Long)].collect().toSeq
    assert(a == b)
  }
}
