package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar-quantization (SQ8) kernels — the [[QuantExpressions]]
  * discipline (native expressions, whole-stage codegen, model state as
  * reference objects) for the uniform per-dimension 8-bit quantizer:
  * code[d] = round((x[d] − min[d]) / delta[d]) ∈ 0..255, stored as a
  * dim-byte BINARY (true 4× compression — a ByteType array column
  * would still carry per-element overhead; bytes don't).
  *
  * The asymmetric distance never decodes: dot(q, decode(c)) =
  * Σ q[d]·min[d] + Σ q[d]·delta[d]·u8(c[d]) — one fused multiply-add
  * loop over raw bytes per row. Degenerate dimensions (constant value
  * ⇒ delta 0) encode as 0 and decode exactly to min[d].
  */
object SqExpressions {
  def encode(embedding: Column, vmin: Array[Float],
      vdelta: Array[Float]): Column =
    Bridge.column(SqEncode(Bridge.expression(embedding), vmin, vdelta))

  def decode(code: Column, vmin: Array[Float],
      vdelta: Array[Float]): Column =
    Bridge.column(SqDecode(Bridge.expression(code), vmin, vdelta))

  def dot(code: Column, qvec: Column, vmin: Array[Float],
      vdelta: Array[Float]): Column =
    Bridge.column(SqDot(Bridge.expression(code), Bridge.expression(qvec),
      vmin, vdelta))
}

final case class SqEncode(child: Expression, vmin: Array[Float],
    vdelta: Array[Float]) extends UnaryExpression with FloatArrayInput {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq_encode"

  def kernel(input: ArrayData): Array[Byte] = {
    val dim = vmin.length
    if (input.numElements() != dim)
      throw new IllegalArgumentException(
        s"sq_encode: embedding length ${input.numElements()} != $dim")
    val out = new Array[Byte](dim)
    var d = 0
    while (d < dim) {
      val delta = vdelta(d)
      val u =
        if (delta == 0f) 0
        else {
          val q = Math.round((input.getFloat(d) - vmin(d)) / delta)
          if (q < 0) 0 else if (q > 255) 255 else q
        }
      out(d) = u.toByte
      d += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sqEncode", this, classOf[SqEncode].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.kernel($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

final case class SqDecode(child: Expression, vmin: Array[Float],
    vdelta: Array[Float]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "sq_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq_decode needs BINARY input, got ${other.sql}")
  }

  def kernel(code: Array[Byte]): ArrayData = {
    val dim = vmin.length
    if (code.length != dim)
      throw new IllegalArgumentException(
        s"sq_decode: code length ${code.length} != $dim")
    val out = new Array[Float](dim)
    var d = 0
    while (d < dim) {
      out(d) = vmin(d) + vdelta(d) * (code(d) & 0xff)
      d += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sqDecode", this, classOf[SqDecode].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.kernel($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Asymmetric dot product: float query × SQ8 code, decode-free. */
final case class SqDot(left: Expression, right: Expression,
    vmin: Array[Float], vdelta: Array[Float]) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq_dot needs (BINARY, ARRAY<FLOAT>), got (${l.sql}, ${r.sql})")
    }

  def kernel(code: Array[Byte], q: ArrayData): Double = {
    val dim = vmin.length
    if (code.length != dim || q.numElements() != dim)
      throw new IllegalArgumentException(
        s"sq_dot: lengths ${code.length}/${q.numElements()} != $dim")
    var s = 0.0
    var d = 0
    while (d < dim) {
      val qd = q.getFloat(d).toDouble
      s += qd * (vmin(d) + vdelta(d) * (code(d) & 0xff))
      d += 1
    }
    s
  }

  override protected def nullSafeEval(codeAny: Any, qAny: Any): Any =
    kernel(codeAny.asInstanceOf[Array[Byte]], qAny.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sqDot", this, classOf[SqDot].getName)
    nullSafeCodeGen(ctx, ev, (c, q) => s"${ev.value} = $self.kernel($c, $q);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
