package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{BpeRanks, UnigramExpressions, UnigramModel}

/** Unigram-LM tokenizer (Kudo 2018 — the SentencePiece `unigram`
  * model): TRAINING learns a piece vocabulary with log-probabilities
  * by EM over the segmentation lattice; ENCODE Viterbi-segments text
  * into piece ids ([[graft.functions.UnigramEncode]]).
  *
  * Scale shape — the [[Bpe]] discipline: everything trains over the
  * WEIGHTED WORD VOCABULARY (one corpus-sized shuffle builds
  * (word, freq); a web crawl has trillions of tokens but ~10⁷ distinct
  * words), so every training pass is vocab-sized:
  *
  *  - seed: one substring-explode aggregate (≤ maxPieceLen·|word|
  *    entries per word) → top-`seedSize` by count×length;
  *  - E-step: map-only kernel over the words frame (forward–backward
  *    per word, expected counts quantized to micro-units) → one
  *    piece-keyed long sum → piece-sized collect (model state);
  *  - M-step / prune: driver-local over the piece table (model-sized).
  *
  * Determinism (the fixed-point contract): piece log-probs live in
  * MICRO-NATS (long); the E-step crosses row boundaries only as
  * quantized longs, so the distributed aggregation is order-free and
  * [[train]] ≡ [[trainLocal]] bit-for-bit (UnigramSpec). Prune follows
  * SentencePiece: a piece's loss is its Viterbi usage count × the
  * log-likelihood it loses when forced onto its best alternative
  * segmentation; single code points (atoms) are never pruned, so every
  * known word stays segmentable.
  */
object Unigram {

  /** Floor log-prob for pieces with zero expected count (micro-nats) —
    * matches the OOV edge penalty so dead pieces never outrank one. */
  private val FloorMicro: Long = UnigramModel.OovPenaltyMicro

  // ------------------------------------------------------------------
  // shared driver-side steps (pure functions over collected counts —
  // the distributed and local paths differ ONLY in how the counts were
  // aggregated, which is exactly what UnigramSpec pins)
  // ------------------------------------------------------------------

  private def utf8Cmp(a: String, b: String): Int = {
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

  /** atoms ∪ top-`seedSize` substrings by score desc → initial model.
    * `subScored` is (substring, score) ALREADY scored (count ×
    * length-in-code-points, the SentencePiece seed statistic) and may
    * be pre-trimmed to the top `seedSize` by the same total order —
    * the distributed path cuts in Spark so only seed-sized rows reach
    * the driver. Returns the model plus the seed scores as initial
    * counts. */
  private def seedFromCounts(
      atomScores: Seq[(String, Long)],
      subScored: Seq[(String, Long)],
      seedSize: Int): (UnigramModel, Map[String, Long]) = {
    val scored = subScored
      .sortWith { case ((p1, s1), (p2, s2)) =>
        if (s1 != s2) s1 > s2 else utf8Cmp(p1, p2) < 0
      }
      .take(math.max(0, seedSize - atomScores.size))
    val all = (atomScores ++ scored).toMap
    (modelFrom(all.map { case (p, s) => (p, math.max(s, 1L)) }), all)
  }

  /** counts (piece → long micro-units or raw longs — any nonnegative
    * mass) → model with logp = ln(c) − ln(Σc), pieces in UTF-8 id
    * order, zero-mass pieces floored. Driver-local, fixed iteration
    * order — deterministic. */
  private def modelFrom(counts: Map[String, Long]): UnigramModel = {
    val pieces = counts.keys.toArray.sortWith(utf8Cmp(_, _) < 0)
    val total = counts.valuesIterator.map(_.max(0L)).sum.toDouble
    val logp = pieces.map { p =>
      val c = counts(p)
      if (c > 0L && total > 0)
        math.rint((math.log(c.toDouble) - math.log(total)) * 1e6).toLong
      else FloorMicro
    }
    new UnigramModel(pieces, logp)
  }

  /** Viterbi score (micro-nats) of segmenting `piece` with the model
    * MINUS its own full-span edge — the prune alternative. Atoms have
    * no alternative (never pruned). */
  private def altScoreMicro(model: UnigramModel, piece: String): Long = {
    val cps = BpeRanks.codePoints(piece)
    val n = cps.length
    val best = new Array[Long](n + 1)
    java.util.Arrays.fill(best, Long.MinValue / 4)
    best(0) = 0L
    var j = 1
    while (j <= n) {
      val lo = math.max(0, j - model.maxLen)
      var i = lo
      while (i < j) {
        if (best(i) > Long.MinValue / 8 && !(i == 0 && j == n)) {
          val sub = cps.slice(i, j).mkString
          val id = model.idOf(sub)
          val lp: Long =
            if (id >= 0) model.logpMicro(id)
            else if (j - i == 1) UnigramModel.OovPenaltyMicro
            else Long.MinValue
          if (lp > Long.MinValue / 2) {
            val s = best(i) + lp
            if (s > best(j)) best(j) = s
          }
        }
        i += 1
      }
      j += 1
    }
    best(n)
  }

  /** One prune round: keep atoms + the highest-loss non-atoms down to
    * `target` pieces; re-normalize retained EM counts into the next
    * model. `emCounts`/`vCounts` are keyed by current piece id. */
  private def pruneSelect(model: UnigramModel, emCounts: Array[Long],
      vCounts: Array[Long], target: Int): UnigramModel = {
    val n = model.pieces.length
    val isAtom = model.pieces.map(p => p.codePointCount(0, p.length) == 1)
    val nAtoms = isAtom.count(identity)
    val dropBudget = n - math.max(target, nAtoms)
    if (dropBudget <= 0) return model
    // loss of dropping piece i: vCount_i × (logp_i − altScore_i);
    // driver doubles over collected longs in fixed order — deterministic
    val losses = (0 until n).filter(!isAtom(_)).map { i =>
      val alt = altScoreMicro(model, model.pieces(i))
      val loss = vCounts(i).toDouble * (model.logpMicro(i) - alt).toDouble
      (model.pieces(i), loss)
    }.sortWith { case ((p1, l1), (p2, l2)) =>
      if (l1 != l2) l1 < l2 else utf8Cmp(p1, p2) < 0
    }
    val dropped = losses.take(dropBudget).map(_._1).toSet
    val kept = (0 until n).filter(i => !dropped.contains(model.pieces(i)))
    modelFrom(kept.map(i =>
      (model.pieces(i), math.max(emCounts(i), 0L))).toMap)
  }

  // ------------------------------------------------------------------
  // distributed training
  // ------------------------------------------------------------------

  /** Learn a unigram piece vocabulary of (at most) `vocabSize` pieces.
    * Returns the piece table (id, piece, logp_micro) — id is the
    * UTF-8 sort position, the numbering [[UnigramEncode]] emits. */
  def train(docs: DataFrame, vocabSize: Int, maxPieceLen: Int = 6,
      seedSize: Int = 4000, emIters: Int = 2,
      keepRatio: Double = 0.75): DataFrame = {
    // The seed caps the initial vocabulary: a seed at or below the
    // vocab target silently trains an undersized model (nothing to
    // prune), so make an unreachable target fail loudly.
    require(seedSize >= vocabSize,
      s"seedSize ($seedSize) must be >= vocabSize ($vocabSize): " +
        "the seed caps the initial vocabulary the prune cuts from")
    val spark = docs.sparkSession
    val words = Bpe.weightedVocab(docs).localCheckpoint()
    val model = trainFromWords(
      atomScores(words), subScores(words, maxPieceLen, seedSize),
      m => eStepDistributed(words, m), m => vCountsDistributed(words, m),
      vocabSize, seedSize, emIters, keepRatio)
    pieceTable(spark, model)
  }

  private def atomScores(words: DataFrame): Seq[(String, Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    words.select(explode(split(col("w"), "")).as("p"), col("freq"))
      .filter(length(col("p")) > 0)
      .groupBy("p").agg(sum("freq").as("f"))
      .as[(String, Long)].collect().toSeq
  }

  /** Top-`lim` substrings by (count × code-point length) — the cut
    * runs IN Spark (orderBy + limit over the aggregate; Spark's string
    * sort is binary UTF-8, identical to the driver comparator), so the
    * driver receives seed-sized rows, never the full distinct-substring
    * table (~10⁸ rows at web scale — the scale contract). Spark's
    * length() counts code points, matching codePointCount. */
  private def subScores(words: DataFrame, maxLen: Int,
      lim: Int): Seq[(String, Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    words
      .select(explode(UnigramExpressions.substrings(col("w"), maxLen)).as("p"),
        col("freq"))
      .groupBy("p").agg(sum("freq").as("f"))
      .select(col("p"), (col("f") * length(col("p"))).as("score"))
      .orderBy(col("score").desc, col("p").asc)
      .limit(math.max(lim, 0))
      .as[(String, Long)].collect().toSeq
  }

  private def eStepDistributed(words: DataFrame,
      model: UnigramModel): Array[Long] = {
    val spark = words.sparkSession
    import spark.implicits._
    val out = new Array[Long](model.vocabSize)
    words
      .select(explode(UnigramExpressions.eStepPairs(col("w"), model)).as("p"),
        col("freq"))
      .select(col("p.id").as("id"), (col("p.mc") * col("freq")).as("mc"))
      .groupBy("id").agg(sum("mc").as("mc"))
      .as[(Int, Long)].collect()
      .foreach { case (id, mc) => if (id >= 0 && id < out.length) out(id) = mc }
    out
  }

  private def vCountsDistributed(words: DataFrame,
      model: UnigramModel): Array[Long] = {
    val spark = words.sparkSession
    import spark.implicits._
    val out = new Array[Long](model.vocabSize)
    words
      .select(explode(UnigramExpressions.encodeIds(col("w"), model)).as("id"),
        col("freq"))
      .filter(col("id") >= 0)
      .groupBy("id").agg(sum("freq").as("c"))
      .as[(Int, Long)].collect()
      .foreach { case (id, c) => if (id >= 0 && id < out.length) out(id) = c }
    out
  }

  /** The shared EM + prune schedule over count providers. */
  private def trainFromWords(
      atoms: Seq[(String, Long)], subs: Seq[(String, Long)],
      eStep: UnigramModel => Array[Long],
      vCounts: UnigramModel => Array[Long],
      vocabSize: Int, seedSize: Int, emIters: Int,
      keepRatio: Double): UnigramModel = {
    var (model, _) = seedFromCounts(atoms, subs, seedSize)
    var counts: Array[Long] = null
    var rounds = 0
    while ({
      var it = 0
      while (it < emIters) {
        counts = eStep(model)
        model = mStep(model, counts)
        it += 1
      }
      rounds += 1
      model.vocabSize > vocabSize && rounds < 32
    }) {
      val target = math.max(vocabSize,
        math.ceil(model.vocabSize * keepRatio).toLong.toInt)
      val pruned = pruneSelect(model, counts, vCounts(model), target)
      if (pruned.vocabSize == model.vocabSize) rounds = 32 // atoms floor
      model = pruned
    }
    model
  }

  /** M-step: re-normalize the aggregated expected counts (micro-unit
    * longs) into new log-probs, same piece set. */
  private def mStep(model: UnigramModel, counts: Array[Long]): UnigramModel =
    modelFrom(model.pieces.zipWithIndex.map { case (p, i) =>
      (p, math.max(counts(i), 0L)) }.toMap)

  def pieceTable(spark: SparkSession, model: UnigramModel): DataFrame = {
    import spark.implicits._
    model.pieces.zipWithIndex.map { case (p, i) =>
      (i, p, model.logpMicro(i)) }.toSeq
      .toDF("id", "piece", "logp_micro").orderBy("id")
  }

  def modelOf(pieceTable: DataFrame): UnigramModel = {
    val spark = pieceTable.sparkSession
    import spark.implicits._
    val rows = pieceTable.orderBy("id").select("piece", "logp_micro")
      .as[(String, Long)].collect()
    new UnigramModel(rows.map(_._1), rows.map(_._2))
  }

  // ------------------------------------------------------------------
  // local reference (UnigramSpec pins train ≡ trainLocal bit-for-bit)
  // ------------------------------------------------------------------

  /** Single-threaded reference: identical driver-side steps, counts
    * aggregated with plain loops over the word map — the per-word
    * kernel calls are the same code the executors run, so any
    * difference isolates the distributed plumbing. */
  private[graft] def trainLocal(words: Map[String, Long], vocabSize: Int,
      maxPieceLen: Int = 6, seedSize: Int = 4000, emIters: Int = 2,
      keepRatio: Double = 0.75): UnigramModel = {
    val atomAcc = mutable.HashMap.empty[String, Long]
    val subAcc = mutable.HashMap.empty[String, Long]
    words.foreach { case (w, f) =>
      val cps = BpeRanks.codePoints(w)
      var i = 0
      while (i < cps.length) {
        atomAcc.update(cps(i), atomAcc.getOrElse(cps(i), 0L) + f)
        val sb = new java.lang.StringBuilder
        sb.append(cps(i))
        var len = 2
        while (len <= maxPieceLen && i + len <= cps.length) {
          sb.append(cps(i + len - 1))
          val s = sb.toString
          subAcc.update(s, subAcc.getOrElse(s, 0L) + f)
          len += 1
        }
        i += 1
      }
    }
    def eStepLocal(model: UnigramModel): Array[Long] = {
      val out = new Array[Long](model.vocabSize)
      words.foreach { case (w, f) =>
        val arr = model.expectedCounts(
          org.apache.spark.unsafe.types.UTF8String.fromString(w))
        var i = 0
        while (i < arr.numElements()) {
          val row = arr.getStruct(i, 2)
          out(row.getInt(0)) += row.getLong(1) * f
          i += 1
        }
      }
      out
    }
    def vCountsLocal(model: UnigramModel): Array[Long] = {
      val out = new Array[Long](model.vocabSize)
      words.foreach { case (w, f) =>
        model.viterbiWord(w).foreach(id => if (id >= 0) out(id) += f)
      }
      out
    }
    val subScored = subAcc.toSeq.map { case (p, f) =>
      (p, f * p.codePointCount(0, p.length)) }
    trainFromWords(atomAcc.toSeq, subScored, eStepLocal, vCountsLocal,
      vocabSize, seedSize, emIters, keepRatio)
  }

  // ------------------------------------------------------------------
  // encode / decode / persistence
  // ------------------------------------------------------------------

  /** Corpus → (doc_id, ids): map-only Viterbi kernel, no shuffle. */
  def encodeIds(docs: DataFrame, model: UnigramModel): DataFrame =
    docs.select(col("doc_id"),
      UnigramExpressions.encodeIds(col("text"), model).as("ids"))

  /** (doc_id, ids) → (doc_id, text): space-stripped round-trip, the
    * same boundary contract as [[Bpe.decodeIds]]. */
  def decodeIds(encoded: DataFrame, model: UnigramModel): DataFrame =
    encoded.select(col("doc_id"),
      UnigramExpressions.decodeIds(col("ids"), model).as("text"))

  /** Persist as one small parquet table — the `tokenize` CLI layout. */
  def writeModel(model: UnigramModel, spark: SparkSession,
      dir: String): Unit =
    pieceTable(spark, model).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/pieces")

  def loadModel(spark: SparkSession, dir: String): UnigramModel =
    modelOf(spark.read.parquet(s"$dir/pieces"))
}
