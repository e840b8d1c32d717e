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
    * the merged symbol. The symbols ride in as `lit` columns — NEVER
    * string-interpolated into SQL text, where a backslash or quote in a
    * corpus token would break (or subvert) the expression. */
  private def applyMerge(l: String, r: String): Column =
    aggregate(
      expr("sequence(1, size(syms))"),
      struct(expr("cast(array() as array<string>)").as("out"),
        lit(false).as("skip")),
      (acc, i) => {
        val out = acc.getField("out")
        val cur = element_at(col("syms"), i.cast("int"))
        // try_element_at: i+1 past the end yields null → the null-safe
        // comparison is false, no ANSI index error
        val nxt = try_element_at(col("syms"), (i + 1).cast("int"))
        when(acc.getField("skip"),
          struct(out.as("out"), lit(false).as("skip")))
          .when(cur === lit(l) && nxt <=> lit(r),
            struct(concat(out, array(concat(cur, nxt))).as("out"),
              lit(true).as("skip")))
          .otherwise(
            struct(concat(out, array(cur)).as("out"),
              lit(false).as("skip")))
      },
      acc => acc.getField("out"))

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

  /** Unsigned byte-wise UTF-8 comparison — Spark's string order. */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
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
        // tie order must be Spark's: UTF8String compares raw UTF-8
        // bytes, which differs from Java String (UTF-16) order for
        // non-BMP vs U+E000..U+FFFF symbols
        val ((l, r), pf) = counts.toSeq.sortWith { case (((l1, r1), f1), ((l2, r2), f2)) =>
          if (f1 != f2) f1 > f2
          else if (l1 != l2) utf8Less(l1, l2)
          else utf8Less(r1, r2)
        }.head
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
