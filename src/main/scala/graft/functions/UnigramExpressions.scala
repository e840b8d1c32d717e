package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer kernels (Kudo 2018, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates", ACL — the SentencePiece `unigram` model). Three kernels,
  * all in the BpeEncode discipline: model state as a codegen reference
  * object, ONE JVM-compiled call per row, map-only.
  *
  *  - [[UnigramEncode]]: text → token ids by per-word Viterbi
  *    segmentation (the corpus-sized hot path);
  *  - [[UnigramEStep]]: word → expected piece counts under the current
  *    model via forward–backward over the segmentation lattice (the
  *    training E-step — runs over the weighted word VOCABULARY, never
  *    the corpus);
  *  - [[UnigramDecode]]: ids → text (vocabulary inversion).
  *
  * Determinism contract (the fixed-point discipline shared with the
  * surprisal/PSI/classifier operators): piece log-probabilities are
  * stored as MICRO-NATS (long), so Viterbi scores are exact integer
  * sums — no float tie fuzz — and the E-step emits per-word expected
  * counts quantized to micro-units (long), so the distributed
  * aggregation is an order-free integer sum and bit-identical to the
  * single-threaded reference loop (UnigramSpec). The per-word lattice
  * math runs in doubles INSIDE one kernel call — identical code on
  * driver and executor — and only quantized longs cross row boundaries.
  *
  * Viterbi tie-break: predecessors are scanned in ascending start
  * index and replace only on a strictly greater score, so an equal
  * score keeps the SMALLEST start — i.e. the longest final piece —
  * deterministically.
  *
  * Out-of-vocabulary: every single code point always has a lattice
  * edge — its piece id if known, else the OOV sentinel id -1 at a
  * fixed penalty ([[UnigramModel.OovPenaltyMicro]]) — so every word
  * segments; -1 decodes as U+FFFD, mirroring BPE's sentinel.
  */
object UnigramExpressions {
  def encodeIds(text: Column, model: UnigramModel): Column =
    Bridge.column(UnigramEncode(Bridge.expression(text), model))

  def eStepPairs(word: Column, model: UnigramModel): Column =
    Bridge.column(UnigramEStep(Bridge.expression(word), model))

  def decodeIds(ids: Column, model: UnigramModel): Column =
    Bridge.column(UnigramDecode(Bridge.expression(ids), model))

  def substrings(word: Column, maxLen: Int): Column =
    Bridge.column(WordSubstrings(Bridge.expression(word), maxLen))
}

/** Model state for the unigram kernels: pieces in UTF-8 id order with
  * micro-nat log-probs. Driver-built (model-sized), shipped once per
  * task via the codegen references array. */
final class UnigramModel(
    val pieces: Array[String],
    val logpMicro: Array[Long]) extends RowTokenizer {
  require(pieces.length == logpMicro.length,
    s"unigram model: ${pieces.length} pieces vs ${logpMicro.length} logps")

  override def tokenIds(text: Column): Column =
    UnigramExpressions.encodeIds(text, this)

  /** Longest piece in code points — bounds the lattice in-degree. */
  val maxLen: Int =
    if (pieces.isEmpty) 1
    else math.max(1, pieces.map(p => p.codePointCount(0, p.length)).max)

  private val ids = new java.util.HashMap[String, Integer](
    math.max(16, pieces.length * 2))
  pieces.zipWithIndex.foreach { case (p, i) => ids.put(p, i) }

  def vocabSize: Int = pieces.length
  def idOf(piece: String): Int = {
    val v = ids.get(piece); if (v == null) -1 else v.intValue()
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()

  /** One word → piece ids, integer-score Viterbi over code points.
    * O(n · maxLen) lattice edges; ids -1 where only the OOV edge
    * covers a position. */
  def viterbiWord(w: String): Array[Int] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    val cps = BpeRanks.codePoints(w)
    val n = cps.length
    if (n == 0) return Array.emptyIntArray
    // best[j] = max micro-nat score of a segmentation of cps[0..j)
    val best = new Array[Long](n + 1)
    val backStart = new Array[Int](n + 1)
    val backId = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Long.MinValue / 4)
    best(0) = 0L
    var j = 1
    while (j <= n) {
      val lo = math.max(0, j - maxLen)
      var i = lo
      while (i < j) {
        if (best(i) > Long.MinValue / 8) {
          val piece = sliceCat(cps, i, j)
          val id = ids.get(piece)
          val lp: Long =
            if (id != null) logpMicro(id.intValue())
            else if (j - i == 1) UnigramModel.OovPenaltyMicro
            else Long.MinValue // no edge
          if (lp > Long.MinValue / 2) {
            val s = best(i) + lp
            if (s > best(j)) {
              best(j) = s
              backStart(j) = i
              backId(j) = if (id != null) id.intValue() else -1
            }
          }
        }
        i += 1
      }
      j += 1
    }
    // reconstruct
    val out = new scala.collection.mutable.ArrayBuffer[Int](n / 2 + 2)
    var k = n
    while (k > 0) { out += backId(k); k = backStart(k) }
    val arr = out.reverse.toArray
    if (cache.size() > 131072) cache.clear()
    cache.put(w, arr)
    arr
  }

  private def sliceCat(cps: Array[String], i: Int, j: Int): String =
    if (j - i == 1) cps(i)
    else {
      val sb = new java.lang.StringBuilder(4 * (j - i))
      var k = i
      while (k < j) { sb.append(cps(k)); k += 1 }
      sb.toString
    }

  /** Whole row: split on single spaces (the engine's tokenization
    * convention, shared with BPE), concatenate per-word ids. */
  def encodeIds(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[Int](s.length / 4 + 4)
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) out ++= viterbiWord(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out.toArray)
  }

  /** E-step for ONE word: expected piece counts under the current
    * model by forward–backward over the lattice, quantized to
    * micro-units. Per-word doubles; the cross-row sum is long-exact.
    * Caller multiplies by the word's corpus frequency (long × long). */
  def expectedCounts(word: UTF8String): ArrayData = {
    val cps = BpeRanks.codePoints(word.toString)
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val NEG = Double.NegativeInfinity
    // edge logps in nats (from the micro-nat model — both training
    // paths read the same quantized values)
    // alpha[j]: log-sum over segmentations of the prefix cps[0..j)
    val alpha = new Array[Double](n + 1)
    java.util.Arrays.fill(alpha, NEG)
    alpha(0) = 0.0
    var j = 1
    while (j <= n) {
      val lo = math.max(0, j - maxLen)
      // two-pass log-sum-exp, ascending i — fixed evaluation order
      var m = NEG
      var i = lo
      while (i < j) {
        val lp = edgeLp(cps, i, j)
        if (!lp.isNegInfinity && !alpha(i).isNegInfinity) {
          val v = alpha(i) + lp
          if (v > m) m = v
        }
        i += 1
      }
      if (!m.isNegInfinity) {
        var acc = 0.0
        i = lo
        while (i < j) {
          val lp = edgeLp(cps, i, j)
          if (!lp.isNegInfinity && !alpha(i).isNegInfinity)
            acc += math.exp(alpha(i) + lp - m)
          i += 1
        }
        alpha(j) = m + math.log(acc)
      }
      j += 1
    }
    val logZ = alpha(n)
    if (logZ.isNegInfinity) return new GenericArrayData(Array.empty[Any])
    val beta = new Array[Double](n + 1)
    java.util.Arrays.fill(beta, NEG)
    beta(n) = 0.0
    var i2 = n - 1
    while (i2 >= 0) {
      val hi = math.min(n, i2 + maxLen)
      var m = NEG
      var j2 = i2 + 1
      while (j2 <= hi) {
        val lp = edgeLp(cps, i2, j2)
        if (!lp.isNegInfinity && !beta(j2).isNegInfinity) {
          val v = lp + beta(j2)
          if (v > m) m = v
        }
        j2 += 1
      }
      if (!m.isNegInfinity) {
        var acc = 0.0
        j2 = i2 + 1
        while (j2 <= hi) {
          val lp = edgeLp(cps, i2, j2)
          if (!lp.isNegInfinity && !beta(j2).isNegInfinity)
            acc += math.exp(lp + beta(j2) - m)
          j2 += 1
        }
        beta(i2) = m + math.log(acc)
      }
      i2 -= 1
    }
    // expected count per edge: exp(alpha[i] + lp + beta[j] - logZ);
    // accumulate per piece id (OOV edges normalize but emit nothing)
    val acc = new java.util.HashMap[Integer, java.lang.Double]()
    var i3 = 0
    while (i3 < n) {
      val hi = math.min(n, i3 + maxLen)
      var j3 = i3 + 1
      while (j3 <= hi) {
        val piece = sliceCat(cps, i3, j3)
        val id = ids.get(piece)
        if (id != null && !alpha(i3).isNegInfinity && !beta(j3).isNegInfinity) {
          val e = math.exp(
            alpha(i3) + logpMicro(id.intValue()) * 1e-6 + beta(j3) - logZ)
          val old = acc.get(id)
          acc.put(id, if (old == null) e else old.doubleValue() + e)
        }
        j3 += 1
      }
      i3 += 1
    }
    // quantize and emit in ascending id order (deterministic layout)
    val keys = new Array[Int](acc.size())
    val it = acc.keySet().iterator()
    var ki = 0
    while (it.hasNext) { keys(ki) = it.next().intValue(); ki += 1 }
    java.util.Arrays.sort(keys)
    val rows = new scala.collection.mutable.ArrayBuffer[Any](keys.length)
    var k = 0
    while (k < keys.length) {
      val mc = math.rint(acc.get(keys(k)).doubleValue() * 1e6).toLong
      if (mc != 0L)
        rows += new GenericInternalRow(Array[Any](keys(k), mc))
      k += 1
    }
    new GenericArrayData(rows.toArray)
  }

  private def edgeLp(cps: Array[String], i: Int, j: Int): Double = {
    val id = ids.get(sliceCat(cps, i, j))
    if (id != null) logpMicro(id.intValue()) * 1e-6
    else if (j - i == 1) UnigramModel.OovPenaltyMicro * 1e-6
    else Double.NegativeInfinity
  }

  def decodeIds(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val sb = new java.lang.StringBuilder(n * 4)
    var i = 0
    while (i < n) {
      val id = arr.getInt(i)
      if (id >= 0 && id < pieces.length) sb.append(pieces(id))
      else sb.append('�')
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

object UnigramModel {
  /** Fixed OOV single-code-point edge penalty, micro-nats (≈ e^-23 —
    * worse than any real piece, but finite so every word segments). */
  val OovPenaltyMicro: Long = -23000000L
}

/** text → ARRAY<INT> token ids by Viterbi segmentation. */
final case class UnigramEncode(child: Expression, model: UnigramModel)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_encode needs STRING input, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    model.encodeIds(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramModel].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $m.encodeIds($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** word → ARRAY<STRUCT<id INT, mc LONG>> expected piece counts in
  * micro-units (the EM E-step; multiply mc by the word's frequency and
  * sum — an exact long aggregation). */
final case class UnigramEStep(child: Expression, model: UnigramModel)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("mc", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "unigram_estep"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_estep needs STRING input, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    model.expectedCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramModel].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $m.expectedCounts($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ids → text (vocabulary inversion; -1 → U+FFFD). */
final case class UnigramDecode(child: Expression, model: UnigramModel)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "unigram_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_decode needs ARRAY<INT> input, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    model.decodeIds(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramModel].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $m.decodeIds($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** word → every code-point substring of length 2..maxLen (one entry
  * PER OCCURRENCE — the seed-vocabulary statistic). Single code points
  * are the atom set, handled separately by the trainer. */
final case class WordSubstrings(child: Expression, maxLen: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_substrings"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_substrings needs STRING input, got ${other.sql}")
  }

  private def substrings(w: UTF8String): ArrayData = {
    val cps = BpeRanks.codePoints(w.toString)
    val n = cps.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](n * (maxLen - 1))
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder(4 * maxLen)
      sb.append(cps(i))
      var len = 2
      while (len <= maxLen && i + len <= n) {
        sb.append(cps(i + len - 1))
        out += UTF8String.fromString(sb.toString)
        len += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    substrings(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wordSubstrings", this,
      classOf[WordSubstrings].getName)
    nullSafeCodeGen(ctx, ev,
      v => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $self.kernel($v);")
  }

  /** Codegen entry point. */
  def kernel(w: UTF8String): ArrayData = substrings(w)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
