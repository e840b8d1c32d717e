package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** PCA projection kernel — the non-square sibling of
  * [[RotateVector]]: y = W·(x − μ) for a kOut×dim row-major component
  * matrix. Same (b)-tier design as the quantizer kernels: one codegen'd
  * plan node per row, model state as a codegen reference object, double
  * accumulation inside the row so the result is independent of row
  * order and partitioning. */
object PcaExpressions {

  /** Project an ARRAY<FLOAT>(dim) embedding onto kOut principal
    * components: out_i = Σ_j W[i·dim+j]·(x_j − mean_j). */
  def project(embedding: Column, mean: Array[Double],
      components: Array[Float], dim: Int, kOut: Int): Column =
    Bridge.column(ProjectVector(Bridge.expression(embedding), mean,
      components, dim, kOut))
}

final case class ProjectVector(child: Expression, mean: Array[Double],
    components: Array[Float], dim: Int, kOut: Int)
    extends UnaryExpression with FloatArrayInput {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pca_project"

  def kernel(input: ArrayData): ArrayData = {
    if (input.numElements() != dim)
      throw new IllegalArgumentException(
        s"pca_project: embedding length ${input.numElements()} != $dim")
    // center once into a scratch array so the k inner loops read
    // doubles, not repeated getFloat+subtract
    val centered = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      centered(j) = input.getFloat(j).toDouble - mean(j)
      j += 1
    }
    val out = new Array[Float](kOut)
    var i = 0
    while (i < kOut) {
      var s = 0.0
      val base = i * dim
      j = 0
      while (j < dim) {
        s += components(base + j).toDouble * centered(j)
        j += 1
      }
      out(i) = s.toFloat
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pcaProject", this,
      classOf[ProjectVector].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.kernel($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
