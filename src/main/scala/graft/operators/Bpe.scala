package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016, "Neural
  * machine translation of rare words with subword units", ACL) as a
  * distributed pipeline — the piece of the tokenizer story that has to
  * see the whole corpus (the BPE-ish regex tokenizer in queries/Llm
  * only APPLIES a vocabulary; this learns one).
  *
  * Scale shape — the classical trick, restated in Spark terms: merges
  * are learned over the WEIGHTED WORD VOCABULARY, not the raw corpus.
  * One corpus-sized shuffle builds (word, freq); every merge iteration
  * after that aggregates symbol pairs over vocab-sized data (≤ a few
  * million rows at web scale, vs trillions of tokens) with map-side
  * partial aggregation, and only the single winning pair — model
  * state — reaches the driver per round. localCheckpoint truncates the
  * per-iteration lineage exactly as in connectedComponents/pageRank.
  *
  * Determinism: the winner is (max freq, then lexicographically
  * smallest (left, right)) and the merge APPLY is left-to-right
  * non-overlapping — the classical contract, so the distributed result
  * is bit-identical to a single-threaded reference implementation
  * (pinned in BpeSpec).
  *
  * The merge apply runs as an `aggregate` HOF over each word's symbol
  * array — interpreted, but over vocab-sized data; if the vocabulary
  * itself is huge the apply is a linear per-row scan that drops into a
  * codegen'd kernel the same way PqCodes did. Not needed yet (the
  * iteration aggregate, not the apply, dominates at test scale).
  */
object Bpe {

  /** Adjacent symbol pairs of one word: (l, r) structs. */
  private def pairsCol: Column = expr(
    """transform(sequence(1, size(syms) - 1), i ->
      |  struct(element_at(syms, i) as l, element_at(syms, i + 1) as r))
      |""".stripMargin)

  /** Left-to-right non-overlapping replacement of adjacent (l, r) with
    * the merged symbol. */
  private def applyMerge(l: String, r: String): Column = {
    val lq = l.replace("'", "\\'")
    val rq = r.replace("'", "\\'")
    expr(
      s"""aggregate(sequence(1, size(syms)),
         |  struct(cast(array() as array<string>) as out, false as skip),
         |  (acc, i) -> if(acc.skip,
         |    struct(acc.out as out, false as skip),
         |    if(i < size(syms) and element_at(syms, i) = '$lq'
         |        and element_at(syms, i + 1) = '$rq',
         |      struct(concat(acc.out,
         |        array(concat(element_at(syms, i), element_at(syms, i + 1))))
         |        as out, true as skip),
         |      struct(concat(acc.out, array(element_at(syms, i))) as out,
         |        false as skip))),
         |  acc -> acc.out)
         |""".stripMargin)
  }

  /** Learn `nMerges` merges from a (text) corpus; returns the merge
    * table (rank, left, right, freq) in learning order. */
  def train(docs: DataFrame, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the ONE corpus-sized aggregation: word → weight
    var vocab = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(split(col("w"), "").as("syms"), col("freq"))
      .localCheckpoint()
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      // vocab-sized pair aggregate; ONE winning row to the driver.
      // single-symbol words carry no pairs — and sequence(1, 0) counts
      // DOWN in Spark, so they must not reach the transform at all
      val top = vocab
        .filter(size(col("syms")) >= 2)
        .select(explode(pairsCol).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("pf"))
        .orderBy(col("pf").desc, col("l").asc, col("r").asc)
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      top.headOption match {
        case None => done = true // every word is a single symbol
        case Some((l, r, pf)) =>
          merges += ((rank, l, r, pf))
          vocab = vocab
            .select(applyMerge(l, r).as("syms"), col("freq"))
            .localCheckpoint()
          rank += 1
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "freq")
      .orderBy("rank")
  }

  /** Reference single-threaded implementation — BpeSpec pins the
    * distributed result against it bit-for-bit. */
  private[operators] def trainLocal(words: Map[String, Long],
      nMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), pf) = counts.toSeq
          .sortBy { case ((l, r), pf) => (-pf, l, r) }.head
        out += ((rank, l, r, pf))
        vocab = vocab.map { case (syms, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), f)
        }
        rank += 1
      }
    }
    out.toSeq
  }
}
