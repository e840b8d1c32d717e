package graft.operators

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BpeExpressions, BpeRanks}

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, "Neural machine
  * translation of rare words with subword units", ACL): TRAINING learns
  * a merge table from the corpus, ENCODE applies it back to produce
  * token ids (the kernel in [[graft.functions.BpeEncode]]).
  *
  * Scale shape — the classical trick, restated in Spark terms: merges
  * are learned over the WEIGHTED WORD VOCABULARY, not the raw corpus.
  * One corpus-sized shuffle builds (word, freq); everything after is
  * vocab-sized. The vocabulary is the sufficient statistic for BPE and
  * it is radically smaller than the corpus (a web-scale crawl has
  * trillions of tokens but ~10⁷ distinct words), so:
  *
  *  - when the vocabulary fits in driver memory (`localVocabLimit`,
  *    default 4M words — the overwhelmingly common case, and how every
  *    production BPE trainer works), it is collected ONCE and the merges
  *    are learned with an incremental pair-count algorithm
  *    ([[trainLocalFast]]: per-merge work touches only the words
  *    containing the winning pair, via an occurrence index + ordered
  *    count set) — 50k merges are a driver-local loop, zero Spark jobs;
  *  - past the limit, the distributed loop runs with EXACT MERGE
  *    BATCHING: each round aggregates pair counts once and applies the
  *    longest sorted prefix of pairs that provably commutes with
  *    sequential training (pairwise symbol-disjoint, concatenations
  *    collide with no live symbol, and the last admitted count strictly
  *    exceeds the first excluded count — under those three rules each
  *    admitted pair's count is invariant under the earlier ones and no
  *    created pair can outrank an admitted one, so batch order = rank
  *    order). Job count per B merges drops from B to 1; a degenerate
  *    round (tie at the head) falls back to the always-exact single
  *    merge.
  *
  * Determinism: the winner is (max freq, then UTF-8-lexicographically
  * smallest (left, right)) and the apply is left-to-right
  * non-overlapping — the classical contract. All three training paths
  * (naive local reference, fast local, batched distributed) are
  * bit-identical (pinned in BpeSpec).
  */
object Bpe {

  /** The ONE corpus-sized aggregation: word → weight. */
  def weightedVocab(docs: DataFrame): DataFrame = docs
    .select(explode(split(col("text"), " ")).as("w"))
    .filter(length(col("w")) > 0)
    .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Adjacent symbol pairs of one word: (l, r) structs. */
  private def pairsCol: Column = expr(
    """transform(sequence(1, size(syms) - 1), i ->
      |  struct(element_at(syms, i) as l, element_at(syms, i + 1) as r))
      |""".stripMargin)

  /** Left-to-right non-overlapping replacement of every adjacent pair in
    * `pairs` with its concatenation, ONE pass. Valid only for a batch
    * admitted by [[selectBatch]] (disjoint + collision-free), where one
    * scan is provably equal to applying the pairs sequentially in rank
    * order. Symbols ride as `lit` columns — never string-interpolated
    * into SQL text. */
  private def applyMergesCol(pairs: Seq[(String, String)]): Column = {
    val keys = array(pairs.map { case (l, r) =>
      struct(lit(l).as("l"), lit(r).as("r")) }: _*)
    aggregate(
      expr("sequence(1, size(syms))"),
      struct(expr("cast(array() as array<string>)").as("out"),
        lit(false).as("skip")),
      (acc, i) => {
        val out = acc.getField("out")
        val cur = element_at(col("syms"), i.cast("int"))
        // try_element_at: i+1 past the end yields null → the null-safe
        // coalesce is false, no ANSI index error
        val nxt = try_element_at(col("syms"), (i + 1).cast("int"))
        val hit = coalesce(
          array_contains(keys, struct(cur.as("l"), nxt.as("r"))), lit(false))
        when(acc.getField("skip"),
          struct(out.as("out"), lit(false).as("skip")))
          .when(hit,
            struct(concat(out, array(concat(cur, nxt))).as("out"),
              lit(true).as("skip")))
          .otherwise(
            struct(concat(out, array(cur)).as("out"),
              lit(false).as("skip")))
      },
      acc => acc.getField("out"))
  }

  /** Learn `nMerges` merges; returns the merge table
    * (rank, left, right, freq) in learning order. Vocabulary-local fast
    * path when the distinct-word count fits `localVocabLimit`, exact
    * batched distributed loop otherwise. */
  def train(docs: DataFrame, nMerges: Int,
      localVocabLimit: Long = 4000000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vdf = weightedVocab(docs)
    if (vdf.count() <= localVocabLimit) {
      val words = vdf.as[(String, Long)].collect().toMap
      trainLocalFast(words, nMerges)
        .toSeq.toDF("rank", "left", "right", "freq").orderBy("rank")
    } else trainDistributed(docs, nMerges)
  }

  /** The distributed path, batched: per round, ONE vocab-sized pair
    * aggregate (top slice to the driver — model state), then ONE
    * vocab-sized apply pass for the whole admitted batch.
    * localCheckpoint truncates lineage per round as in
    * connectedComponents/pageRank. */
  private[operators] def trainDistributed(docs: DataFrame,
      nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // single-symbol words carry no pairs — and sequence(1, 0) counts
    // DOWN in Spark, so they must not reach the transform at all
    var vocab = weightedVocab(docs)
      .select(split(col("w"), "").as("syms"), col("freq"))
      .localCheckpoint()
    // live symbol set (chars ∪ applied concatenations) — driver state
    // for the batch collision rule; char-set-sized, tiny
    val symbols = mutable.Set.empty[String]
    symbols ++= vocab.select(explode(col("syms")).as("s"))
      .distinct().as[String].collect()
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val remaining = nMerges - rank + 1
      val fetch = math.min(remaining, 63) + 1
      val top = vocab
        .filter(size(col("syms")) >= 2)
        .select(explode(pairsCol).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("pf"))
        .orderBy(col("pf").desc, col("l").asc, col("r").asc)
        .limit(fetch)
        .as[(String, String, Long)].collect().toSeq
      if (top.isEmpty) done = true // every word is a single symbol
      else {
        val batch = selectBatch(top, remaining, symbols,
          exhausted = top.size < fetch)
        batch.foreach { case (l, r, f) =>
          merges += ((rank, l, r, f))
          symbols += (l + r)
          rank += 1
        }
        vocab = vocab
          .select(applyMergesCol(batch.map(b => (b._1, b._2))).as("syms"),
            col("freq"))
          .localCheckpoint()
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "freq").orderBy("rank")
  }

  /** The exact-batch rule. `top` is the sorted (freq desc, l, r) head of
    * the pair counts; admit the longest prefix such that
    *  (a) pairs are pairwise symbol-disjoint (no admitted pair shares a
    *      symbol with another, nor uses another's concatenation), so
    *      each admitted count is invariant under the earlier merges;
    *  (b) no concatenation collides with a live symbol or another batch
    *      concatenation, so no old pair's count can be BOOSTED and no
    *      created pair can string-equal an admitted one;
    *  (c) the last admitted count strictly exceeds the first excluded
    *      count — every created pair's count is bounded by some
    *      conflicting (hence excluded) old pair's count, so under (c)
    *      nothing outside the batch can outrank anything inside it at
    *      any intermediate sequential step.
    * A batch of 1 is the classical sequential step — always exact, the
    * fallback when ties or conflicts stop the prefix immediately. */
  private[operators] def selectBatch(top: Seq[(String, String, Long)],
      remaining: Int, symbols: collection.Set[String],
      exhausted: Boolean): Seq[(String, String, Long)] = {
    val used = mutable.Set.empty[String]
    val cats = mutable.Set.empty[String]
    // keep one collected pair as the strict-descent sentinel unless the
    // pair space is globally exhausted
    val cap = math.min(remaining, if (exhausted) top.size else top.size - 1)
    var n = 0
    var stop = false
    while (!stop && n < cap) {
      val (l, r, _) = top(n)
      val cat = l + r
      if (used(l) || used(r) || cats(l) || cats(r) ||
          symbols(cat) || used(cat) || cats(cat)) stop = true
      else { used += l; used += r; cats += cat; n += 1 }
    }
    // strict descent vs the first excluded pair (none when exhausted)
    while (n > 1 && n < top.size && top(n - 1)._3 <= top(n)._3) n -= 1
    top.take(math.max(n, 1))
  }

  /** Unsigned byte-wise UTF-8 comparison — Spark's string order. */
  private[operators] def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  private[operators] def utf8Less(a: String, b: String): Boolean = utf8Cmp(a, b) < 0

  /** Left-to-right non-overlapping single-pair apply (the shared
    * reference semantics). */
  private def applyPass(syms: Array[String], l: String,
      r: String): Array[String] = {
    val out = new ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Incremental local trainer — the production path once the weighted
    * vocabulary is on the driver. Per merge, only the words CONTAINING
    * the winning pair are touched (occurrence index), pair counts are
    * updated by exact deltas, and the winner comes from an ordered set
    * in O(log P). Bit-identical to [[trainLocal]] (BpeSpec). */
  private[graft] def trainLocalFast(words: Map[String, Long],
      nMerges: Int): Seq[(Int, String, String, Long)] = {
    val entries = words.toArray
    val syms: Array[Array[String]] =
      entries.map(e => BpeRanks.codePoints(e._1))
    val freqs: Array[Long] = entries.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def scanPairs(s: Array[String])(f: ((String, String)) => Unit): Unit = {
      var i = 0
      while (i < s.length - 1) { f((s(i), s(i + 1))); i += 1 }
    }
    var wi = 0
    while (wi < syms.length) {
      val fq = freqs(wi)
      scanPairs(syms(wi)) { p =>
        counts.update(p, counts.getOrElse(p, 0L) + fq)
        where.getOrElseUpdate(p, mutable.Set.empty) += wi
      }
      wi += 1
    }
    // best-first: freq desc, then UTF-8-smallest (l, r) — Spark's order
    implicit val bestFirst: Ordering[(Long, String, String)] =
      (a, b) => {
        if (a._1 != b._1) java.lang.Long.compare(b._1, a._1)
        else {
          val c = utf8Cmp(a._2, b._2)
          if (c != 0) c else utf8Cmp(a._3, b._3)
        }
      }
    val queue = mutable.TreeSet.empty[(Long, String, String)]
    counts.foreach { case ((l, r), c) => queue += ((c, l, r)) }
    val out = ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    while (rank <= nMerges && queue.nonEmpty) {
      val (f, l, r) = queue.head
      out += ((rank, l, r, f))
      val pair = (l, r)
      // occurrence index is LAZY (stale words re-check and skip)
      val occ = where.getOrElse(pair, mutable.Set.empty).toArray
      where.remove(pair)
      val delta = mutable.HashMap.empty[(String, String), Long]
      occ.foreach { w =>
        val s = syms(w)
        var has = false
        scanPairs(s)(p => if (p == pair) has = true)
        if (has) {
          val fq = freqs(w)
          scanPairs(s)(p => delta.update(p, delta.getOrElse(p, 0L) - fq))
          val merged = applyPass(s, l, r)
          syms(w) = merged
          scanPairs(merged) { p =>
            delta.update(p, delta.getOrElse(p, 0L) + fq)
            where.getOrElseUpdate(p, mutable.Set.empty) += w
          }
        }
      }
      delta.foreach { case (p, d) =>
        if (d != 0L) {
          val old = counts.getOrElse(p, 0L)
          if (old != 0L) queue -= ((old, p._1, p._2))
          val nw = old + d
          if (nw > 0L) { counts.update(p, nw); queue += ((nw, p._1, p._2)) }
          else counts.remove(p)
        }
      }
      rank += 1
    }
    out.toSeq
  }

  /** Naive single-threaded reference — BpeSpec pins the fast local and
    * distributed results against it bit-for-bit. */
  private[operators] def trainLocal(words: Map[String, Long],
      nMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, f) =>
        (BpeRanks.codePoints(w).toVector, f)
      }
    val out = ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val counts = mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (s, f) =>
        s.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        // tie order must be Spark's: UTF8String compares raw UTF-8
        // bytes, which differs from Java String (UTF-16) order for
        // non-BMP vs U+E000..U+FFFF symbols
        val ((l, r), pf) = counts.toSeq.sortWith {
          case (((l1, r1), f1), ((l2, r2), f2)) =>
            if (f1 != f2) f1 > f2
            else if (l1 != l2) utf8Less(l1, l2)
            else utf8Less(r1, r2)
        }.head
        out += ((rank, l, r, pf))
        vocab = vocab.map { case (s, f) =>
          (applyPass(s.toArray, l, r).toVector, f)
        }
        rank += 1
      }
    }
    out.toSeq
  }

  // ------------------------------------------------------------------
  // ENCODE — apply the learned merges back to a corpus
  // ------------------------------------------------------------------

  /** Build the encode model from a merge table (as produced by [[train]])
    * and the corpus whose character set defines the base vocabulary.
    * Model-sized driver work: merges + distinct code points. */
  def rankModel(merges: DataFrame, docs: DataFrame): BpeRanks = {
    val spark = merges.sparkSession
    import spark.implicits._
    val ms = merges.orderBy("rank").select("left", "right")
      .as[(String, String)].collect()
    val chars = weightedVocab(docs)
      .select(explode(split(col("w"), "")).as("c"))
      .distinct().as[String].collect()
      .sortWith(utf8Less)
    new BpeRanks(ms, chars)
  }

  /** Corpus → (doc_id, ids ARRAY<INT>): map-only, ONE codegen'd kernel
    * call per row (graft.functions.BpeEncode). The 100 TB shape: no
    * shuffle, no broadcast join — the merge table is model state inside
    * the expression, and the Zipf word cache amortizes the greedy apply
    * across repeated words. */
  def encodeIds(docs: DataFrame, model: BpeRanks): DataFrame =
    docs.select(col("doc_id"),
      BpeExpressions.encodeIds(col("text"), model).as("ids"))

  /** Same, keeping the subword STRINGS (inspection/debugging shape). */
  def encodeTokens(docs: DataFrame, model: BpeRanks): DataFrame =
    docs.select(col("doc_id"),
      BpeExpressions.encodeTokens(col("text"), model).as("tokens"))

  /** (doc_id, ids) → (doc_id, text): vocabulary inversion, map-only.
    * decode(encode(w)) == w per word; across a whole document the ids
    * carry no word boundaries (training never merges across spaces), so
    * the round-trip is the space-stripped text — BpeSpec pins both. */
  def decodeIds(encoded: DataFrame, model: BpeRanks): DataFrame =
    encoded.select(col("doc_id"),
      BpeExpressions.decodeIds(col("ids"), model).as("text"))

  /** Naive in-rank-order reference apply — BpeSpec pins the kernel
    * against it bit-for-bit. */
  private[operators] def encodeWordLocal(w: String,
      merges: Seq[(String, String)]): Seq[String] = {
    var s = BpeRanks.codePoints(w)
    merges.foreach { case (l, r) => s = applyPass(s, l, r) }
    s.toSeq
  }

  /** Persist the tokenizer model (rank-ordered merges + base charset)
    * as two small parquet tables — the layout the `tokenize` CLI
    * round-trips, mirroring Ann.writeIvf/Pq.writePq's model-alongside
    * contract. */
  def writeModel(model: BpeRanks, spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    import spark.implicits._
    model.merges.toSeq.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    model.baseChars.toSeq.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("id", "char")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/charset")
  }

  def loadModel(spark: org.apache.spark.sql.SparkSession,
      dir: String): BpeRanks = {
    import spark.implicits._
    val merges = spark.read.parquet(s"$dir/merges")
      .orderBy("rank").select("left", "right")
      .as[(String, String)].collect()
    val chars = spark.read.parquet(s"$dir/charset")
      .orderBy("id").select("char").as[String].collect()
    new BpeRanks(merges, chars)
  }
}
