package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Developer tool: BPE tokenizer throughput — merge-table training
  * wall-time at real merge counts and corpus encode tokens/s.
  * `args`: [nDocs] [nMerges] [runs].
  *
  * Synthetic Zipfian corpus, generated ON the executors: a fixed 30k
  * pseudo-word lexicon (3–11 lowercase chars, splitmix-derived), each
  * document 100 words drawn rank ~ V^u (log-uniform ≈ Zipf(1)) — the
  * head-heavy repetition profile that makes the encode kernel's word
  * cache representative of natural text.
  */
object ProfileBpe {

  private val V = 30000

  private[graft] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic lexicon — plain-letter pseudo-words. */
  private lazy val lexicon: Array[String] = Array.tabulate(V) { i =>
    val len = 3 + (mix(i.toLong * 7 + 1).abs % 9).toInt
    val sb = new StringBuilder(len)
    var j = 0
    while (j < len) {
      sb += ('a' + (mix(i.toLong * 131 + j).abs % 26).toInt).toChar
      j += 1
    }
    sb.result()
  }

  def docs(spark: SparkSession, n: Long): DataFrame = docs(spark, n, 0)

  /** `parts` > 0 overrides the partition count — scale sweeps that CACHE
    * a per-doc frame need partitions sized so a task's pinned cache
    * block plus its aggregation pages fit the local heap share (the
    * ProfileQuality 1M lesson: 32 fat partitions on an 8 GB heap starve
    * the partial agg — AGGREGATE_OUT_OF_MEMORY; a real cluster's many
    * small partitions never see this shape). */
  def docs(spark: SparkSession, n: Long, parts: Int): DataFrame = {
    import spark.implicits._
    val lex = lexicon
    val base = if (parts > 0) spark.range(0L, n, 1L, parts)
      else spark.range(0L, n)
    base.map { i =>
      val words = Array.tabulate(100) { t =>
        val u = (mix(i * 1009 + t).abs % 1000000) / 1000000.0
        lex(math.min(V - 1, math.pow(V.toDouble, u).toLong.toInt))
      }
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-bpe")
    import spark.implicits._
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nMerges = args.lift(1).map(_.toInt).getOrElse(1000)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val corpus = docs(spark, nDocs).persist()
    corpus.count()

    // training: corpus-sized vocab aggregation + driver-local merges
    val tTrain0 = System.nanoTime()
    val merges = Bpe.train(corpus, nMerges)
    val nLearned = merges.count()
    val trainSec = (System.nanoTime() - tTrain0) / 1e9
    // the driver-local component alone (vocab already aggregated)
    val words = Bpe.weightedVocab(corpus).as[(String, Long)].collect().toMap
    val tLocal0 = System.nanoTime()
    val learned = Bpe.trainLocalFast(words, nMerges)
    val localSec = (System.nanoTime() - tLocal0) / 1e9
    println(f"TRAIN merges=$nLearned%d total=$trainSec%.1fs " +
      f"(local-only=$localSec%.1fs over ${words.size}%d words, " +
      f"learned=${learned.size}%d)")

    val model = Bpe.rankModel(merges, corpus)
    println(s"MODEL vocab=${model.vocabSize} merges=${model.merges.length}")
    for (r <- 1 to runs) {
      val t0 = System.nanoTime()
      val nTok = Bpe.encodeIds(corpus, model)
        .agg(sum(size(col("ids")))).head().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"ENCODE run$r%d ${nDocs / sec}%.0f docs/s " +
        f"${nTok / sec / 1e6}%.1fM tokens/s (${nTok}%d tokens, $sec%.1fs)")
    }
    spark.stop()
  }
}
