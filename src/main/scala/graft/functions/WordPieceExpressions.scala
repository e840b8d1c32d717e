package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece corpus ENCODE (Schuster & Nakajima 2012; the BERT
  * tokenizer, Devlin et al. 2019): greedy LONGEST-MATCH-FIRST
  * segmentation of each word against a subword vocabulary, continuation
  * pieces marked `##`. Same hot-path discipline as [[BpeEncode]] /
  * UnigramEncode: model state as a codegen reference object, ONE
  * JVM-compiled kernel call per row inside whole-stage codegen,
  * map-only — the corpus-sized pass never shuffles.
  *
  * Apply semantics (the BERT reference algorithm, exactly):
  *  - per word, maximal munch: at each position take the LONGEST vocab
  *    piece that matches (continuation lookups for non-initial
  *    positions), then continue after it;
  *  - if any position matches nothing, the WHOLE word becomes one
  *    [UNK] — not a partial segmentation (BERT's `wordpiece_tokenizer`
  *    contract);
  *  - words longer than `maxWordChars` code points are [UNK] outright
  *    (BERT's max_input_chars_per_word guard — it bounds the per-word
  *    O(len²) munch at adversarial inputs).
  *
  * Token ids, deterministic given the vocabulary: [UNK] = 0; initial
  * pieces take 1..n in UTF-8 byte order; continuation pieces take
  * n+1..2n in the same order. Initial and continuation namespaces are
  * SEPARATE maps — a corpus piece that itself starts with "##" can
  * never collide with a continuation marker.
  */
object WordPieceExpressions {
  def encodeIds(text: Column, model: WordPieceVocab): Column =
    Bridge.column(WordPieceEncode(Bridge.expression(text), model))

  def decodeIds(ids: Column, model: WordPieceVocab): Column =
    Bridge.column(WordPieceDecode(Bridge.expression(ids), model))
}

/** Model state for the kernel: the subword piece set. `pieces` must be
  * UTF-8-sorted and duplicate-free (the operator builds it so); each
  * piece exists in BOTH initial and continuation form, the standard
  * shape when the vocabulary is derived from a BPE/unigram subword
  * inventory. */
final class WordPieceVocab(
    val pieces: Array[String],
    val maxWordChars: Int = 200) extends RowTokenizer {

  override def tokenIds(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = WordPieceExpressions.encodeIds(text, this)

  val unkId = 0

  /** piece -> initial id (1..n) / continuation id (n+1..2n). */
  private val initIds = new java.util.HashMap[String, Integer](
    pieces.length * 2 + 16)
  private val contIds = new java.util.HashMap[String, Integer](
    pieces.length * 2 + 16)
  pieces.zipWithIndex.foreach { case (p, i) =>
    initIds.put(p, i + 1)
    contIds.put(p, pieces.length + i + 1)
  }

  /** Longest piece, in code points — bounds the munch's inner loop. */
  private val maxPieceCps: Int =
    if (pieces.isEmpty) 0
    else pieces.iterator.map(p => p.codePointCount(0, p.length)).max

  def vocabSize: Int = 2 * pieces.length + 1

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()

  /** One word → ids, BERT maximal munch. */
  private[graft] def encodeWord(w: String): Array[Int] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    val cps = BpeRanks.codePoints(w)
    val out: Array[Int] =
      if (cps.length > maxWordChars) Array(unkId)
      else {
        val buf = new scala.collection.mutable.ArrayBuffer[Int](cps.length)
        var start = 0
        var bad = false
        while (!bad && start < cps.length) {
          val limit = math.min(cps.length, start + math.max(maxPieceCps, 1))
          var end = limit
          var found = -1
          while (found < 0 && end > start) {
            val sub = concat(cps, start, end)
            val id = if (start == 0) initIds.get(sub) else contIds.get(sub)
            if (id != null) found = id.intValue() else end -= 1
          }
          if (found < 0) bad = true
          else { buf += found; start = end }
        }
        if (bad) Array(unkId) else buf.toArray
      }
    if (cache.size() > 131072) cache.clear()
    cache.put(w, out)
    out
  }

  private def concat(cps: Array[String], from: Int, until: Int): String = {
    val sb = new java.lang.StringBuilder
    var i = from
    while (i < until) { sb.append(cps(i)); i += 1 }
    sb.toString
  }

  /** Whole row: split on single spaces (the corpus tokenization shared
    * by all three tokenizer families), skip empties, concat per-word.
    * Primitive int buffer + arraycopy — an ArrayBuffer[Int] boxes every
    * id (measured 25× throughput loss at 0.25G tokens, ProfileWordPiece
    * before/after in PLANS round 11). */
  def encodeIds(text: UTF8String): ArrayData = {
    val s = text.toString
    var out = new Array[Int](math.max(8, s.length / 4 + 4))
    var m = 0
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          val ids = encodeWord(s.substring(start, i))
          if (m + ids.length > out.length)
            out = java.util.Arrays.copyOf(out,
              math.max(out.length * 2, m + ids.length))
          System.arraycopy(ids, 0, out, m, ids.length)
          m += ids.length
        }
        start = i + 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }

  /** ids → text: piece concatenation ([UNK] and out-of-range ids decode
    * as U+FFFD). Continuation ids map back to their piece text — the
    * `##` marker is an ID-SPACE property here, never part of the piece
    * string, so no stripping is needed. decode(encode(w)) == w for any
    * UNK-free word; across a document the ids carry no word boundaries
    * (same contract as BPE/unigram decode). */
  def decodeIds(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val sb = new java.lang.StringBuilder(n * 4)
    var i = 0
    while (i < n) {
      val id = arr.getInt(i)
      val pi = if (id >= 1 && id <= pieces.length) id - 1
        else if (id > pieces.length && id <= 2 * pieces.length)
          id - pieces.length - 1
        else -1
      if (pi >= 0) sb.append(pieces(pi)) else sb.append('�')
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

final case class WordPieceEncode(child: Expression, model: WordPieceVocab)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode needs STRING input, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    model.encodeIds(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("wpModel", model, classOf[WordPieceVocab].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $m.encodeIds($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Inverse of [[WordPieceEncode]] — see WordPieceVocab.decodeIds. */
final case class WordPieceDecode(child: Expression, model: WordPieceVocab)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "wordpiece_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_decode needs ARRAY<INT> input, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    model.decodeIds(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("wpModel", model, classOf[WordPieceVocab].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $m.decodeIds($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
