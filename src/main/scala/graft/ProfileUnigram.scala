package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram

/** Developer tool: unigram-LM tokenizer throughput — EM training
  * wall-time at real vocabulary sizes and Viterbi corpus-encode
  * tokens/s. `args`: [nDocs] [vocabSize] [runs].
  *
  * Reuses [[ProfileBpe.docs]]' Zipfian pseudo-word corpus so the two
  * tokenizer families profile on identical text (the encode kernels
  * share the per-word cache discipline; head-heavy repetition is what
  * makes it representative).
  */
object ProfileUnigram {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-unigram")
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val vocab = args.lift(1).map(_.toInt).getOrElse(4000)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val corpus = ProfileBpe.docs(spark, nDocs).persist()
    corpus.count()

    val tTrain0 = System.nanoTime()
    val table = Unigram.train(corpus, vocabSize = vocab,
      maxPieceLen = 6, seedSize = vocab * 4)
    val nPieces = table.count()
    val trainSec = (System.nanoTime() - tTrain0) / 1e9
    println(f"TRAIN vocab=$nPieces%d total=$trainSec%.1fs " +
      f"(target=$vocab%d, seed=${vocab * 4}%d)")

    val model = Unigram.modelOf(table)
    for (r <- 1 to runs) {
      val t0 = System.nanoTime()
      val nTok = Unigram.encodeIds(corpus, model)
        .agg(sum(size(col("ids")))).head().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"ENCODE run$r%d ${nDocs / sec}%.0f docs/s " +
        f"${nTok / sec / 1e6}%.1fM tokens/s (${nTok}%d tokens, $sec%.1fs)")
    }
    spark.stop()
  }
}
