package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** minhash_sig(shingles, nPerm) — MinHash signature as one native
  * expression.
  *
  * The composable form (`transform(sequence(0,P), j ->
  * array_min(transform(shingles, s -> xxhash64(s, j))))`) re-hashes every
  * shingle P times through interpreted lambda calls — P×|shingles| full
  * hashes per document. Here each shingle is hashed ONCE (xxHash64 of its
  * bytes) and the P permutations are derived by Fingerprint-style mixing
  * of that base hash — the standard "one hash + P affine mixes" MinHash
  * construction (broadcast-free, allocation-free inner loop).
  *
  * Null shingle elements are skipped; an empty/null input yields null.
  */
final case class MinHashSignature(child: Expression, nPerm: Int)
    extends UnaryExpression with CodegenFallback {

  require(nPerm > 0, s"nPerm must be positive: $nPerm")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs ARRAY<STRING>, got ${other.sql}")
  }

  // odd multipliers + offsets derived from splitmix64 of the perm index —
  // fixed at plan time, shared across rows
  private lazy val mulA: Array[Long] = Array.tabulate(nPerm)(j =>
    MinHashSignature.splitmix64(2L * j + 1) | 1L)
  private lazy val mulB: Array[Long] = Array.tabulate(nPerm)(j =>
    MinHashSignature.splitmix64(2L * j + 2))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val sig = Array.fill(nPerm)(Long.MaxValue)
    var i = 0
    var seen = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen += 1
        val s = arr.getUTF8String(i)
        val base = s.hashCode.toLong * 0x9e3779b97f4a7c15L ^
          MinHashSignature.hash64(s)
        var j = 0
        while (j < nPerm) {
          val h = MinHashSignature.mix64(base * mulA(j) + mulB(j))
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (seen == 0) null else new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  /** xxHash64-style base hash of a UTF8String's bytes. */
  def hash64(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(s, org.apache.spark.sql.types.StringType, 42L)

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def mix64(x: Long): Long = splitmix64(x)
}

/** minhash_sig3(text, tokens, nPerm) — [[MinHashSignature]] over the
  * word 3-gram shingles of `text`, FUSED into one tight loop.
  *
  * Value-identical to `minhashSig(shingles3(text), nPerm)` by
  * construction: `tokens` must be `split(text, " ")` (the caller passes
  * Spark's own split so tokenization semantics are Spark's, not ours);
  * each 3-gram is materialized with `UTF8String.concatWs` — the same
  * bytes `concat_ws(" ", …)` produces — and hashed through the identical
  * base-hash + affine-mix chain. What it removes is the interpreted
  * higher-order-function machinery: `shingles3` evaluates ~10 boxed
  * expression nodes per shingle and materializes the full shingle array
  * per document before the signature expression starts; this loop builds
  * one shingle at a time and feeds the mixer in place (measured ≈2× on
  * the streaming near-dup signature phase).
  */
final case class MinHash3GramSignature(left: Expression, right: Expression,
                                       nPerm: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  require(nPerm > 0, s"nPerm must be positive: $nPerm")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig3"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig3 needs (STRING, ARRAY<STRING>), got ${l.sql} / ${r.sql}")
    }

  private lazy val mulA: Array[Long] = Array.tabulate(nPerm)(j =>
    MinHashSignature.splitmix64(2L * j + 1) | 1L)
  private lazy val mulB: Array[Long] = Array.tabulate(nPerm)(j =>
    MinHashSignature.splitmix64(2L * j + 2))

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(textAny: Any, tokensAny: Any): Any = {
    val text = textAny.asInstanceOf[UTF8String]
    val tokens = tokensAny.asInstanceOf[ArrayData]
    val n = tokens.numElements()
    val sig = Array.fill(nPerm)(Long.MaxValue)
    if (n < 3) absorb(text, sig)
    else {
      var i = 0
      while (i + 2 < n) {
        absorb(UTF8String.concatWs(space, tokens.getUTF8String(i),
          tokens.getUTF8String(i + 1), tokens.getUTF8String(i + 2)), sig)
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  private def absorb(s: UTF8String, sig: Array[Long]): Unit = {
    val base = s.hashCode.toLong * 0x9e3779b97f4a7c15L ^
      MinHashSignature.hash64(s)
    var j = 0
    while (j < nPerm) {
      val h = MinHashSignature.mix64(base * mulA(j) + mulB(j))
      if (h < sig(j)) sig(j) = h
      j += 1
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** span_hashes(tokens, n) — every n-token window fingerprint of a token
  * array in O(tokens) total, via a rolling polynomial (base B, mod 2^64
  * by natural overflow) over per-token xxHash64 values; the leading
  * term is removed each step with a precomputed B^(n-1), so each window
  * costs O(1) regardless of n.
  *
  * The composable form (`md5(array_join(slice(ts, i, n), ' '))` per
  * position — q_span_dedup's DuckDB-mirrorable shape) rebuilds
  * O(n)-token strings per position: O(tokens × n) bytes hashed per doc.
  * This expression is the 100 TB hot path; because downstream dedup
  * counts depend only on span IDENTITY (the hash never reaches output),
  * any exact-span method yields identical statistics absent 64-bit
  * collisions, and the oracled md5 query certifies this one.
  *
  * Inputs shorter than n yield an empty array (no spans). Null token
  * elements hash to a fixed sentinel distinct from real tokens.
  */
final case class SpanHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n > 0, s"span length must be positive: $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "span_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"span_hashes needs ARRAY<STRING>, got ${other.sql}")
  }

  private val B = 1099511628211L // odd ⇒ invertible mod 2^64
  private lazy val bPowN1: Long = {
    var p = 1L; var i = 1; while (i < n) { p *= B; i += 1 }; p
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val h = new Array[Long](len)
    var i = 0
    while (i < len) {
      h(i) =
        if (arr.isNullAt(i)) 0x9e3779b97f4a7c15L // null sentinel
        else MinHashSignature.hash64(arr.getUTF8String(i))
      i += 1
    }
    val out = new Array[Long](len - n + 1)
    var w = 0L
    i = 0
    while (i < n) { w = w * B + h(i); i += 1 }
    out(0) = w
    var j = 1
    while (j <= len - n) {
      w = (w - h(j - 1) * bPowN1) * B + h(j + n - 1)
      out(j) = w
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** unicode_normalize(text, form) — Unicode canonical/compatibility
  * normalization (UAX #15), the text-pipeline front door Spark lacks as
  * a built-in: crawled corpora mix composed ("é" U+00E9) and decomposed
  * ("e"+U+0301) byte forms of the SAME text, which silently splits
  * exact-dedup fingerprints, vocabulary counts, and BPE merges. One
  * java.text.Normalizer call per row; the isNormalized fast path makes
  * already-NFC text (all ASCII in particular) a zero-allocation no-op,
  * so the common case costs one table scan of the bytes. CodegenFallback
  * is deliberate: the cost is inside ICU-style normalization itself, not
  * the dispatch (the MinHashSignature precedent).
  */
final case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {

  private val nf = java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize needs STRING, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, nf)) s.clone()
    else UTF8String.fromString(java.text.Normalizer.normalize(str, nf))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** Column DSL entry: MinHash signature of an ARRAY<STRING> column. */
  def minhashSig(shingles: Column, nPerm: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), nPerm))

  /** Column DSL entry: Unicode normalization; form is NFC/NFD/NFKC/NFKD. */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(text), form))

  /** Column DSL entry: rolling n-token span fingerprints (see
    * [[SpanHashes]]). */
  def spanHashes(tokens: Column, n: Int): Column =
    Bridge.column(SpanHashes(Bridge.expression(tokens), n))

  /** Fused `minhashSig(shingles3(text), nPerm)` — value-identical, one
    * tight loop per document (see [[MinHash3GramSignature]]). */
  def minhashSig3(text: Column, nPerm: Int): Column = {
    import org.apache.spark.sql.functions.split
    Bridge.column(MinHash3GramSignature(Bridge.expression(text),
      Bridge.expression(split(text, " ")), nPerm))
  }

  /** 3-gram word shingles of a text column; docs with <3 tokens fall back
    * to ONE whole-doc shingle via an explicit CASE (ANSI-safe — Spark 4
    * throws on element_at past the array end). The token array is bound
    * once per row via the single-element outer transform: HOF lambdas get
    * no CSE, so inlining split(text) into the per-shingle lambda would
    * re-tokenize the document 3× per shingle (measured 20× slower). */
  def shingles3(text: Column): Column = {
    import org.apache.spark.sql.functions._
    val tk = split(text, " ")
    when(size(tk) < 3, array(text)).otherwise(
      flatten(transform(array(tk), tkb =>
        transform(sequence(lit(1), size(tkb) - 2), i =>
          concat_ws(" ",
            element_at(tkb, i.cast("int")),
            element_at(tkb, i.cast("int") + 1),
            element_at(tkb, i.cast("int") + 2))))))
  }
}
