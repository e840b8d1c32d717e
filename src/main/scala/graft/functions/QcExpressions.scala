package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** qc_score_u(text) — the quality classifier's fixed-point score in ONE
  * kernel call per row: tokenize, hash unigrams+bigrams, accumulate the
  * long margin numerator against the weight table (a codegen reference
  * object), quantize. Training needs the featurize → broadcast-join →
  * aggregate shape (gradients are per-bucket rows); SCORING does not —
  * the join + doc-keyed aggregation collapses to a map-only expression,
  * so corpus scoring has NO shuffle at all and is legal as a stateless
  * stage in an append-mode stream (the CorpusPipeline quality filter).
  *
  * Bit-for-bit equal to the join path by construction, pinned in
  * QualityClassifierSpec:
  *  - tokens: UTF8String split on literal space, limit -1 — Spark's
  *    split(text, " ") semantics (trailing empties kept);
  *  - bucket: pmod(xxhash64(lit(HashSeed), tok), B) replicated through
  *    the same XxHash64Function composition (int literal folded into
  *    the seed, then the token bytes);
  *  - the margin numerator is a LONG sum (commutative — per-bucket
  *    grouping in featurize changes nothing), bias = w[B]·len;
  *  - the double ops and quantization are the Score path's, in the
  *    same order.
  */
object QcExpressions {

  def qcScoreU(text: Column, weightsU: Array[Long], buckets: Int,
      hashSeed: Int): Column =
    Bridge.column(
      QcScoreU(Bridge.expression(text), weightsU, buckets, hashSeed))

  /** Packed featurize: text → struct(len, pairs[(bucket, cnt)]) in one
    * kernel call — the bias pair (bucket = B, cnt = len) included,
    * pairs sorted by bucket. Map-only: the per-(doc, bucket) groupBy
    * shuffle of the exploded form disappears entirely. */
  def qcFeaturePairs(text: Column, buckets: Int, hashSeed: Int): Column =
    Bridge.column(
      QcFeaturePairs(Bridge.expression(text), buckets, hashSeed))

  /** Exact long margin numerator Σ cnt·w_u[bucket] over a packed pairs
    * array (bias included via its pair) — weights as a codegen
    * reference object, re-bound per training iteration. */
  def qcDotNum(pairs: Column, weightsU: Array[Long]): Column =
    Bridge.column(QcDotNum(Bridge.expression(pairs), weightsU))

  /** Kernel for [[QcFeaturePairs]]: returns (len, sorted (bucket, cnt)
    * pairs with the bias appended last). */
  def featurePairs(s: UTF8String, buckets: Int,
      hashSeed: Int): (Long, Array[(Int, Long)]) = {
    val seed2 = XxHash64Function.hash(hashSeed,
      org.apache.spark.sql.types.IntegerType, 42L)
    def bucket(tok: String): Int = {
      val h = XxHash64Function.hash(UTF8String.fromString(tok),
        StringType, seed2)
      (((h % buckets) + buckets) % buckets).toInt
    }
    val toks = s.toString.split(" ", -1)
    val n = toks.length
    val counts = new java.util.TreeMap[Integer, java.lang.Long]()
    def add(b: Int): Unit = {
      val prev = counts.get(b)
      counts.put(b, if (prev == null) 1L else prev + 1L)
    }
    var i = 0
    while (i < n) { add(bucket(toks(i))); i += 1 }
    i = 0
    while (i < n - 1) { add(bucket(toks(i) + " " + toks(i + 1))); i += 1 }
    val len = 2L * n - 1
    val out = new Array[(Int, Long)](counts.size() + 1)
    var j = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); out(j) = (e.getKey.intValue(), e.getValue.longValue())
      j += 1
    }
    out(j) = (buckets, len) // bias pair
    (len, out)
  }

  /** The whole per-row computation as a static call — the generated
    * code invokes it once per row (the loop lives here, compiled; the
    * per-row cost is hashing, not dispatch). */
  def scoreU(s: UTF8String, w: Array[Long], buckets: Int,
      hashSeed: Int): Long = {
    // xxhash64(lit(seed), tok): the int literal folds into the running
    // hash first, then the token bytes
    val seed2 = XxHash64Function.hash(hashSeed,
      org.apache.spark.sql.types.IntegerType, 42L)
    def bucket(tok: UTF8String): Int = {
      val h = XxHash64Function.hash(tok, StringType, seed2)
      (((h % buckets) + buckets) % buckets).toInt
    }
    val toks = s.toString.split(" ", -1)
    val n = toks.length
    var num = 0L
    var i = 0
    while (i < n) {
      num += w(bucket(UTF8String.fromString(toks(i))))
      i += 1
    }
    i = 0
    while (i < n - 1) {
      num += w(bucket(UTF8String.fromString(toks(i) + " " + toks(i + 1))))
      i += 1
    }
    val len = 2L * n - 1
    num += w(buckets) * len // bias feature: cnt = len
    val margin = (num.toDouble / len) / 1000000.0d
    Math.floor(margin * 1000000.0d + 0.5d).toLong
  }
}

final case class QcFeaturePairs(child: Expression, buckets: Int,
    hashSeed: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types._

  override def dataType: DataType = StructType(Seq(
    StructField("len", LongType, nullable = false),
    StructField("pairs", ArrayType(StructType(Seq(
      StructField("bucket", IntegerType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
      containsNull = false), nullable = false)))
  override def prettyName: String = "qc_feature_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qc_feature_pairs needs STRING, got ${other.sql}")
  }

  // CodegenFallback-style cost profile is fine here: one heavy call per
  // row (tokenize + hash), dispatch is noise — the MinHashSignature
  // precedent
  override protected def nullSafeEval(input: Any): Any = {
    val (len, pairs) = QcExpressions.featurePairs(
      input.asInstanceOf[UTF8String], buckets, hashSeed)
    val rows: Array[Any] = pairs.map { case (b, c) =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](b, c)): Any
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](len,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

final case class QcDotNum(child: Expression, weightsU: Array[Long])
    extends UnaryExpression {

  import org.apache.spark.sql.types._

  override def dataType: DataType = LongType
  override def prettyName: String = "qc_dot_num"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 2 &&
      s(0).dataType == IntegerType && s(1).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qc_dot_num needs ARRAY<STRUCT<INT, BIGINT>>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData]
    var num = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val r = arr.getStruct(i, 2)
      num += r.getLong(1) * weightsU(r.getInt(0))
      i += 1
    }
    num
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("qcWeights", weightsU, "long[]")
    nullSafeCodeGen(ctx, ev, p => {
      val i = ctx.freshName("i")
      val r = ctx.freshName("r")
      s"""${ev.value} = 0L; // nullSafeCodeGen's default init is -1
         |for (int $i = 0; $i < $p.numElements(); $i++) {
         |  org.apache.spark.sql.catalyst.InternalRow $r =
         |    $p.getStruct($i, 2);
         |  ${ev.value} += $r.getLong(1) * $w[$r.getInt(0)];
         |}""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

final case class QcScoreU(child: Expression, weightsU: Array[Long],
    buckets: Int, hashSeed: Int) extends UnaryExpression {

  require(weightsU.length == buckets + 1,
    s"weights length ${weightsU.length} != buckets+1 ${buckets + 1}")

  override def dataType: DataType = LongType
  override def prettyName: String = "qc_score_u"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qc_score_u needs STRING, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    QcExpressions.scoreU(input.asInstanceOf[UTF8String], weightsU,
      buckets, hashSeed)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("qcWeights", weightsU, "long[]")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.QcExpressions.scoreU(" +
        s"$t, $w, $buckets, $hashSeed);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
