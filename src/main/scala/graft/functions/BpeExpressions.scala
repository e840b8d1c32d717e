package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE corpus ENCODE — apply a learned merge table (graft.operators.Bpe)
  * to text, producing subword token ids. This is the corpus-sized hot
  * path of the tokenizer story (training aggregates over the vocabulary;
  * encoding touches every byte of the corpus), so it follows the PqCodes
  * discipline: model state rides as a codegen reference object, the
  * whole-stage-codegen'd operator makes ONE call per row into a
  * JVM-compiled kernel — no interpreted HOF lambdas, no per-token
  * virtual dispatch, no shuffle (map-only).
  *
  * Apply semantics — must reproduce training's segmentation exactly
  * (BpeSpec pins kernel == naive in-rank-order apply, bit-for-bit):
  * training applied merge 1 everywhere, then merge 2, ... so encode
  * applies merges IN RANK ORDER, one left-to-right non-overlapping pass
  * each. The kernel runs that efficiently as "repeatedly merge the
  * lowest-ranked pair present, never revisiting a passed rank": absent
  * symbol-string collisions a merge only creates higher-ranked pairs, so
  * the ascending-rank scan IS the in-order apply; the `> lastRank` guard
  * makes it exact even when a collision (two merges concatenating to the
  * same string) would otherwise resurrect an already-passed rank.
  *
  * Token ids: base code points (sorted by UTF-8 byte order) take
  * 0..B-1, the rank-k merge takes B+k-1 — the classical vocabulary
  * numbering, deterministic given (corpus charset, merge table). A
  * character never seen in training encodes as -1 (OOV sentinel; the
  * caller filters or maps it).
  *
  * Words repeat Zipf-style, so the kernel memoizes word → ids in a
  * bounded concurrent cache shared by all tasks in the executor (cleared
  * wholesale past 128k entries — at web scale the hit rate on the head
  * of the distribution is what matters, not tail retention).
  */
object BpeExpressions {
  def encodeIds(text: Column, model: BpeRanks): Column =
    Bridge.column(BpeEncode(Bridge.expression(text), model, emitIds = true))

  def encodeTokens(text: Column, model: BpeRanks): Column =
    Bridge.column(BpeEncode(Bridge.expression(text), model, emitIds = false))

  def decodeIds(ids: Column, model: BpeRanks): Column =
    Bridge.column(BpeDecode(Bridge.expression(ids), model))
}

/** Model state for the encode kernel: rank-ordered merges + the base
  * character vocabulary. Driver-built (model-sized), shipped once per
  * task via the codegen references array. */
final class BpeRanks(
    val merges: Array[(String, String)],
    val baseChars: Array[String]) extends RowTokenizer {

  override def tokenIds(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = BpeExpressions.encodeIds(text, this)

  /** (l, r) -> 1-based rank. */
  private val ranks = new java.util.HashMap[(String, String), Integer](
    math.max(16, merges.length * 2))
  merges.zipWithIndex.foreach { case ((l, r), i) => ranks.put((l, r), i + 1) }

  /** token -> id: base chars (caller passes them UTF-8-sorted) then
    * merge outputs in rank order. A merge output string that collides
    * with an existing token keeps the FIRST id (first-wins, same rule
    * both here and in the local reference). */
  private val ids = new java.util.HashMap[String, Integer](
    merges.length * 2 + baseChars.length * 2 + 16)
  baseChars.zipWithIndex.foreach { case (c, i) =>
    if (!ids.containsKey(c)) ids.put(c, i)
  }
  merges.zipWithIndex.foreach { case ((l, r), k) =>
    val cat = l + r
    if (!ids.containsKey(cat)) ids.put(cat, baseChars.length + k)
  }

  def vocabSize: Int = ids.size()

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  /** One word → subword symbols, ascending-rank greedy apply. */
  private def encodeWord(w: String): Array[String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    var syms = BpeRanks.codePoints(w)
    var lastRank = 0
    var continue = syms.length >= 2
    while (continue) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get((syms(i), syms(i + 1)))
        if (r != null && r > lastRank && r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) continue = false
      else {
        val l = syms(bi)
        val rr = syms(bi + 1)
        // left-to-right non-overlapping pass for the selected pair —
        // identical to training's apply
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == rr) {
            out += (l + rr); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
        lastRank = best
        continue = syms.length >= 2
      }
    }
    if (cache.size() > 131072) cache.clear()
    cache.put(w, syms)
    syms
  }

  /** Whole row: split on single spaces (training's tokenization), skip
    * empties, concatenate per-word encodings in order. */
  private def encodeText(text: UTF8String): Array[String] = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length / 4 + 4)
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) out ++= encodeWord(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    out.toArray
  }

  // kernel entry points — called from generated code, one call per row
  def encodeIds(text: UTF8String): ArrayData = {
    val toks = encodeText(text)
    val arr = new Array[Int](toks.length)
    var i = 0
    while (i < toks.length) {
      val id = ids.get(toks(i))
      arr(i) = if (id == null) -1 else id.intValue()
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(arr)
  }

  def encodeTokens(text: UTF8String): ArrayData = {
    val toks = encodeText(text)
    val arr = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { arr(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(arr)
  }

  /** id → token string, the inverse of the vocabulary numbering. Ids
    * skipped by the first-wins collision rule stay null here and decode
    * as U+FFFD, same as the -1 OOV sentinel. */
  @transient private lazy val inv: Array[String] = {
    val arr = new Array[String](baseChars.length + merges.length)
    val it = ids.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); arr(e.getValue.intValue()) = e.getKey
    }
    arr
  }

  /** ids → text. Word boundaries are not part of the id stream (training
    * tokenizes on single spaces and no merge crosses one), so decode
    * returns the space-stripped text: decode(encodeIds(w)) == w for
    * every WORD, and decode(encodeIds(text)) == text minus spaces —
    * the exact inverse of the information the ids carry. BpeSpec pins
    * both identities. */
  def decodeIds(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val sb = new java.lang.StringBuilder(n * 4)
    var i = 0
    while (i < n) {
      val id = arr.getInt(i)
      if (id >= 0 && id < inv.length && inv(id) != null) sb.append(inv(id))
      else sb.append('�')
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

object BpeRanks {
  /** Code-point segmentation — mirrors Spark's split(w, '') exactly
    * (Java regex zero-width matches fall between code points, so
    * surrogate pairs stay whole). */
  def codePoints(w: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }
}

final case class BpeEncode(child: Expression, model: BpeRanks,
    emitIds: Boolean) extends UnaryExpression {

  override def dataType: DataType =
    if (emitIds) ArrayType(IntegerType, containsNull = false)
    else ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode needs STRING input, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String]
    if (emitIds) model.encodeIds(t) else model.encodeTokens(t)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeModel", model, classOf[BpeRanks].getName)
    val call = if (emitIds) "encodeIds" else "encodeTokens"
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $m.$call($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Inverse of [[BpeEncode]]: token ids → text (vocabulary inversion —
  * same codegen-reference-object discipline, one kernel call per row).
  * See BpeRanks.decodeIds for the exact round-trip contract. */
final case class BpeDecode(child: Expression, model: BpeRanks)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_decode needs ARRAY<INT> input, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    model.decodeIds(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeModel", model, classOf[BpeRanks].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $m.decodeIds($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
