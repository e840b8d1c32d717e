package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Vector-quantization kernels as native Catalyst expressions.
  *
  * Why not built-ins: the natural compositions are higher-order
  * functions (`transform`/`aggregate` lambdas), and Spark evaluates HOF
  * lambdas INTERPRETED, one virtual call per element — the ProfileAnn
  * sweep measured PQ encoding at 5.5k vec/s that way. Expanding the
  * argmin inline as k·m expression copies instead made Catalyst
  * analysis the bottleneck (a 10⁴-node tree costs seconds per query).
  * A custom expression is the (b)-tier answer from the build guidance:
  * ONE plan node, whole-stage-codegen'd tight loops, model state
  * attached as a codegen reference object — the same discipline as
  * [[FloatVectorDot]].
  *
  * Model state (codebooks/centroids) is carried FLAT (row-major
  * float[]) inside the expression: k-quantizer state is small by
  * contract (it reaches the driver anyway) and a flat array indexes
  * with integer math in the generated loop.
  */
object QuantExpressions {

  /** PQ encode: embedding → m codeword ids (argmin L2 per subspace,
    * first index wins ties). `codebooks` is [m][k][sub] row-major. */
  def pqCodes(embedding: Column, codebooks: Array[Float], m: Int, k: Int,
      sub: Int): Column =
    Bridge.column(PqCodes(Bridge.expression(embedding), codebooks, m, k, sub))

  /** Top-p nearest centroids by dot product (descending; lower cell id
    * wins ties). `centroids` is [k][dim] row-major. */
  def nearestCells(embedding: Column, centroids: Array[Float], k: Int,
      dim: Int, p: Int): Column =
    Bridge.column(
      NearestCells(Bridge.expression(embedding), centroids, k, dim, p))

  /** ADC score: Σ_i table[i][codes(i)] over an ARRAY<INT> codes column
    * and an ARRAY<ARRAY<DOUBLE>> per-query lookup-table column. */
  def adcScore(codes: Column, table: Column): Column =
    Bridge.column(AdcScore(Bridge.expression(codes), Bridge.expression(table)))

  /** y = R·x for a dim×dim row-major rotation — the OPQ pre-transform
    * ([[graft.operators.Opq]]); orthonormal R preserves dot products,
    * so rotated-space ADC scores re-rank identically. */
  def rotate(embedding: Column, rotation: Array[Float], dim: Int): Column =
    Bridge.column(RotateVector(Bridge.expression(embedding), rotation, dim))
}

/** Map-only matrix-vector kernel: ARRAY<FLOAT>(dim) → ARRAY<FLOAT>(dim),
  * y_i = Σ_j R[i·dim+j]·x_j accumulated in double. Model state as a
  * codegen reference object, one kernel call per row (the BpeEncode
  * discipline — a transform() HOF would run interpreted per element). */
final case class RotateVector(child: Expression, rotation: Array[Float],
    dim: Int) extends UnaryExpression with FloatArrayInput {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "rotate_vector"

  def kernel(input: ArrayData): ArrayData = {
    if (input.numElements() != dim)
      throw new IllegalArgumentException(
        s"rotate_vector: embedding length ${input.numElements()} != $dim")
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      var s = 0.0
      val base = i * dim
      var j = 0
      while (j < dim) {
        s += rotation(base + j).toDouble * input.getFloat(j)
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
    val self = ctx.addReferenceObj("rotateVector", this,
      classOf[RotateVector].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.kernel($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

private[graft] trait FloatArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<FLOAT> input, got ${other.sql}")
  }
}

final case class PqCodes(child: Expression, codebooks: Array[Float],
    m: Int, k: Int, sub: Int)
    extends UnaryExpression with FloatArrayInput {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // per-row guard: getFloat past numElements is an unchecked off-heap
    // read on UnsafeArrayData — a short/overlong embedding must fail
    // loudly, not encode garbage (Pq.train only checks the first row)
    if (v.numElements() != m * sub)
      throw new IllegalArgumentException(
        s"pq_codes: embedding length ${v.numElements()} != ${m * sub}")
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = Double.MaxValue
      var bestj = 0
      var j = 0
      while (j < k) {
        var d = 0.0
        val base = (mi * k + j) * sub
        var t = 0
        while (t < sub) {
          val diff = v.getFloat(mi * sub + t).toDouble - codebooks(base + t)
          d += diff * diff
          t += 1
        }
        if (d < best) { best = d; bestj = j }
        j += 1
      }
      codes(mi) = bestj
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      val bestj = ctx.freshName("bestj")
      s"""
         |if ($v.numElements() != ${m * sub}) {
         |  throw new IllegalArgumentException(
         |    "pq_codes: embedding length " + $v.numElements() +
         |    " != ${m * sub}");
         |}
         |int[] $codes = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  double $best = Double.MAX_VALUE; int $bestj = 0;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $d = 0.0;
         |    int $base = ($mi * $k + $j) * $sub;
         |    for (int $t = 0; $t < $sub; $t++) {
         |      double $diff = ((double) $v.getFloat($mi * $sub + $t))
         |        - ((double) $cb[$base + $t]);
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $best) { $best = $d; $bestj = $j; }
         |  }
         |  $codes[$mi] = $bestj;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** The ADC hot loop: one table lookup per subspace per corpus row. The
  * `aggregate(sequence(...))` composition it replaces is an interpreted
  * lambda chain — measured 6.8 s of the 500k-vector PQ search in the
  * ProfileAnn sweep. No model state here: both sides are columns (the
  * per-query table rides a broadcast join). */
final case class AdcScore(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "adc_score"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _),
            ArrayType(ArrayType(org.apache.spark.sql.types.DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_score needs (ARRAY<INT>, ARRAY<ARRAY<DOUBLE>>), got " +
          s"${l.sql} / ${r.sql}")
    }

  override protected def nullSafeEval(codesAny: Any, tblAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val tbl = tblAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var s = 0.0
    var i = 0
    while (i < m) {
      s += tbl.getArray(i).getDouble(codes.getInt(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, tbl) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $m = $codes.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  $s += $tbl.getArray($i).getDouble($codes.getInt($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

final case class NearestCells(child: Expression, centroids: Array[Float],
    k: Int, dim: Int, p: Int)
    extends UnaryExpression with FloatArrayInput {

  require(p >= 1 && p <= k, s"nearest_cells needs 1 <= p <= k, got p=$p k=$k")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // same off-heap-read guard as pq_codes: length must equal dim
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"nearest_cells: embedding length ${v.numElements()} != $dim")
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      var s = 0.0
      var t = 0
      while (t < dim) { s += v.getFloat(t).toDouble * centroids(c * dim + t); t += 1 }
      dots(c) = s
      c += 1
    }
    val out = new Array[Int](p)
    val used = new Array[Boolean](k)
    var r = 0
    while (r < p) {
      var bi = -1
      var bv = Double.NegativeInfinity
      var i = 0
      while (i < k) {
        if (!used(i) && dots(i) > bv) { bv = dots(i); bi = i }
        i += 1
      }
      // all remaining dots NaN (NaN > x is always false): fall back to
      // the first unused cell instead of indexing used(-1)
      if (bi < 0) {
        var i2 = 0
        while (bi < 0 && i2 < k) { if (!used(i2)) bi = i2; i2 += 1 }
      }
      used(bi) = true
      out(r) = bi
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ct = ctx.addReferenceObj("cellCentroids", centroids, "float[]")
    nullSafeCodeGen(ctx, ev, v => {
      val dots = ctx.freshName("dots")
      val used = ctx.freshName("used")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val s = ctx.freshName("s")
      val r = ctx.freshName("r")
      val bi = ctx.freshName("bi")
      val bv = ctx.freshName("bv")
      val i = ctx.freshName("i")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "nearest_cells: embedding length " + $v.numElements() +
         |    " != $dim");
         |}
         |double[] $dots = new double[$k];
         |for (int $c = 0; $c < $k; $c++) {
         |  double $s = 0.0;
         |  for (int $t = 0; $t < $dim; $t++) {
         |    $s += ((double) $v.getFloat($t)) * ((double) $ct[$c * $dim + $t]);
         |  }
         |  $dots[$c] = $s;
         |}
         |int[] $out = new int[$p];
         |boolean[] $used = new boolean[$k];
         |for (int $r = 0; $r < $p; $r++) {
         |  int $bi = -1; double $bv = Double.NEGATIVE_INFINITY;
         |  for (int $i = 0; $i < $k; $i++) {
         |    if (!$used[$i] && $dots[$i] > $bv) { $bv = $dots[$i]; $bi = $i; }
         |  }
         |  if ($bi < 0) { // all remaining dots NaN: first unused cell
         |    for (int $i = 0; $bi < 0 && $i < $k; $i++) {
         |      if (!$used[$i]) $bi = $i;
         |    }
         |  }
         |  $used[$bi] = true;
         |  $out[$r] = $bi;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
