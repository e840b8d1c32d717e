package graft

import org.apache.spark.sql.functions._

import graft.operators.WordPiece

/** WordPiece corpus-encode throughput on [[ProfileBpe.docs]]' Zipf
  * corpus — the maximal-munch kernel is map-only with the same word
  * cache as BPE's, so docs/s should land in the same band as the other
  * two tokenizer families (the per-word munch is O(len·maxPiece) vs
  * BPE's merge scan).
  *
  * Usage: runMain graft.ProfileWordPiece [nDocs] [nMerges] [runs]
  */
object ProfileWordPiece {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-wordpiece")
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nMerges = args.lift(1).map(_.toInt).getOrElse(1000)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val corpus = ProfileBpe.docs(spark, nDocs).persist()
    corpus.count()
    val t0 = System.nanoTime()
    val model = WordPiece.train(corpus, nMerges)
    println(f"TRAIN pieces=${model.pieces.length}%d " +
      f"vocab=${model.vocabSize}%d ${(System.nanoTime() - t0) / 1e9}%.1fs")
    for (r <- 1 to runs) {
      val t1 = System.nanoTime()
      val nTok = WordPiece.encodeIds(corpus, model)
        .agg(sum(size(col("ids")))).head().getLong(0)
      val sec = (System.nanoTime() - t1) / 1e9
      println(f"ENCODE run$r%d ${nDocs / sec}%.0f docs/s " +
        f"${nTok / sec / 1e6}%.1fM tokens/s (${nTok}%d tokens, $sec%.1fs)")
    }
    spark.stop()
  }
}
