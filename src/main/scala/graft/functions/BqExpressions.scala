package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** Binary-quantization (1-bit) kernels — the [[QuantExpressions]]
  * discipline for the cheapest quantizer: bit d = x[d] > thr[d], packed
  * 8 bits per byte into a ⌈dim/8⌉-byte BINARY (32× compression over
  * float32 — the "BQ" of modern vector stores, with PQ at 16× and SQ8
  * at 4×). Distance is SYMMETRIC hamming (query encoded through the
  * same thresholds): XOR + popcount, the cheapest distance a CPU can
  * compute — then exact rerank recovers the ranking the 1-bit codes
  * blur. */
object BqExpressions {
  def encode(embedding: Column, thresholds: Array[Double]): Column =
    Bridge.column(BqEncode(Bridge.expression(embedding), thresholds))

  def hamming(codeA: Column, codeB: Column): Column =
    Bridge.column(BqHamming(Bridge.expression(codeA),
      Bridge.expression(codeB)))
}

final case class BqEncode(child: Expression, thresholds: Array[Double])
    extends UnaryExpression with FloatArrayInput {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "bq_encode"

  def kernel(input: ArrayData): Array[Byte] = {
    val dim = thresholds.length
    if (input.numElements() != dim)
      throw new IllegalArgumentException(
        s"bq_encode: embedding length ${input.numElements()} != $dim")
    val out = new Array[Byte]((dim + 7) / 8)
    var d = 0
    while (d < dim) {
      if (input.getFloat(d) > thresholds(d))
        out(d >> 3) = (out(d >> 3) | (1 << (d & 7))).toByte
      d += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bqEncode", this, classOf[BqEncode].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.kernel($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Symmetric hamming distance between two packed bit codes. */
final case class BqHamming(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bq_hamming"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bq_hamming needs (BINARY, BINARY), got (${l.sql}, ${r.sql})")
    }

  def kernel(a: Array[Byte], b: Array[Byte]): Int = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"bq_hamming: code lengths ${a.length} != ${b.length}")
    var h = 0
    var i = 0
    // 8 bytes per popcount where possible
    while (i + 8 <= a.length) {
      var xa = 0L
      var xb = 0L
      var j = 0
      while (j < 8) {
        xa = (xa << 8) | (a(i + j) & 0xffL)
        xb = (xb << 8) | (b(i + j) & 0xffL)
        j += 1
      }
      h += java.lang.Long.bitCount(xa ^ xb)
      i += 8
    }
    while (i < a.length) {
      h += Integer.bitCount((a(i) ^ b(i)) & 0xff)
      i += 1
    }
    h
  }

  override protected def nullSafeEval(aAny: Any, bAny: Any): Any =
    kernel(aAny.asInstanceOf[Array[Byte]], bAny.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bqHamming", this, classOf[BqHamming].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.kernel($a, $b);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
