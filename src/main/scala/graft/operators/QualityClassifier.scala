package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality filtering — a fastText-style linear classifier
  * over hashed bag-of-n-gram features (Joulin et al. 2016, "Bag of
  * Tricks for Efficient Text Classification", arXiv:1607.01759), the
  * shape of the GPT-3 / CCNet quality filters (Brown et al. 2020 §A;
  * Wenzek et al. 2019): train logistic regression on
  * curated-vs-crawl-style labels, score every corpus document, keep by
  * score band. Everything heuristic in the engine's filter family
  * (q_quality_filter, q_repetition, q_bigram_logprob) is rule-driven;
  * this operator is the LEARNED member of the family.
  *
  * Spark shape — and the determinism contract that makes a trained
  * model reproducible on a cluster:
  *  - features are hashed unigram+bigram counts (`pmod(xxhash64(tok),
  *    B)` buckets) normalized by document length; the bias is feature
  *    bucket B with value len/len = 1, so ONE uniform aggregation path
  *    carries it (no separate bias job per iteration);
  *  - training is full-batch gradient descent. Per iteration: weights
  *    (bounded model state, B+1 longs) broadcast-join onto the cached
  *    feature frame; per-doc margins are LONG sums of cnt·w_u —
  *    exact, so order-independent; the per-doc logistic error is a
  *    pure scalar function of that long, quantized to a LONG in
  *    nano-units; per-bucket gradients are again long sums. Every
  *    cross-row reduction in the loop is integer addition, so the
  *    learned weights are bit-identical under ANY partitioning or
  *    row order — [[trainLocal]] (the classical single-threaded loop)
  *    is the pinned reference, the PageRank/BPE discipline applied to
  *    gradient descent. Floating point appears only in per-row scalar
  *    position (sigmoid, quantization) where no reduction order
  *    exists.
  *  - per-iteration cluster traffic: one broadcast of B+1 weight rows
  *    out, one combined (map-side partial) gradient of ≤B+1 rows per
  *    partition back. The corpus-sized feature frame shuffles ONCE
  *    (the featurize groupBy), is cached partitioned by doc_id, and
  *    both per-iteration joins reuse that partitioning — at 100 TB
  *    the loop touches the corpus with zero additional shuffles.
  *
  * Scoring is one broadcast join + one partial-aggregated sum — map
  * side except the doc-keyed margin aggregation.
  */
object QualityClassifier {

  /** Weight / margin fixed-point scale (micro-units). */
  val WeightScale = 1000000L
  /** Per-doc error fixed-point scale (nano-units). */
  val ErrScale = 1000000000L

  private[graft] val HashSeed = 4242

  /** buckets hashed feature buckets; weightsU(buckets) is the bias. */
  case class QcModel(buckets: Int, weightsU: Array[Long])

  /** Hashed unigram+bigram features: (doc_id, label, len, bucket, cnt)
    * with the bias row (bucket = buckets, cnt = len) appended. `len` is
    * the total gram count — the normalizer that makes feature values
    * cnt/len, fastText's mean-of-embeddings reduction. Cache the result
    * before iterating: it is partitioned by doc_id so the training
    * loop's joins and aggregations reuse one layout. */
  def featurize(docs: DataFrame, buckets: Int, idCol: String = "doc_id",
      textCol: String = "text", labelCol: String = "label"): DataFrame = {
    val toks = split(col(textCol), " ")
    // slice length must be computed, not Int.MaxValue: Slice adds
    // start+length in INT and a MaxValue literal overflows to an empty
    // result — silently, which made round-9's first featurize
    // unigram-only (caught by the kernel-equivalence pin)
    val bigrams = filter(
      zip_with(col("toks"),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      g => g.isNotNull)
    val base = docs
      .select(col(idCol).as("doc_id"), col(labelCol).as("label"),
        toks.as("toks"))
      .select(col("doc_id"), col("label"),
        concat(col("toks"), bigrams).as("grams"))
      .select(col("doc_id"), col("label"),
        size(col("grams")).cast("long").as("len"), col("grams"))
    val counts = base
      .select(col("doc_id"), col("label"), col("len"),
        explode(col("grams")).as("tok"))
      .groupBy(col("doc_id"), col("label"), col("len"),
        pmod(xxhash64(lit(HashSeed), col("tok")), lit(buckets))
          .cast("int").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .union(base.select(col("doc_id"), col("label"), col("len"),
        lit(buckets).as("bucket"), col("len").as("cnt")))
      .repartition(col("doc_id"))
  }

  /** Per-doc margin numerator under `w`: Σ cnt·w_u — an EXACT long.
    * margin = num / len / WeightScale. */
  private def margins(features: DataFrame, w: Array[Long]): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    val wDf = w.toSeq.zipWithIndex.map { case (wu, b) => (b, wu) }
      .toDF("bucket", "w_u")
    features.join(broadcast(wDf), Seq("bucket"))
      .groupBy("doc_id")
      .agg(max("label").as("label"), max("len").as("len"),
        sum(col("cnt") * col("w_u")).as("num"))
      .select(col("doc_id"), col("label"), col("len"),
        ((col("num") / col("len")) / lit(WeightScale.toDouble))
          .as("margin"))
  }

  /** The executor-side error quantization — and, verbatim, the local
    * reference's: err·ErrScale/len quantized as floor(x + 0.5) (ties
    * toward +∞). floor is an exact IEEE operation with identical
    * semantics in SQL and in [[quantize]], so the two training paths
    * share the arithmetic by specification rather than by trusting
    * Round's interpreted-vs-codegen behavior. */
  private val errExpr =
    s"cast(floor(((1.0d / (1.0d + exp(-margin))) - label) * " +
      s"${ErrScale}.0d / len + 0.5d) as long)"

  private[operators] def quantize(v: Double): Long =
    Math.floor(v + 0.5d).toLong

  /** The (shared) driver-side weight update: exact same doubles on both
    * training paths because it is literally the same code. */
  private def update(w: Array[Long], grads: Iterator[(Int, Long)],
      lr: Double, n: Long): Unit =
    grads.foreach { case (b, gU) =>
      w(b) -= Math.round(
        lr * gU.toDouble * WeightScale / (ErrScale.toDouble * n))
    }

  /** Packed featurize: (doc_id, label, len, pairs[(bucket, cnt)]) in
    * ONE map-only kernel pass — no explode, no groupBy, NO shuffle.
    * The exploded [[featurize]] shuffled 289M feature rows at 1M docs;
    * this form shuffles nothing and [[trainPacked]] iterates over it
    * join-free. Pairs include the bias (bucket = buckets, cnt = len). */
  def featurizePacked(docs: DataFrame, buckets: Int,
      idCol: String = "doc_id", textCol: String = "text",
      labelCol: String = "label"): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(labelCol).as("label"),
      graft.functions.QcExpressions
        .qcFeaturePairs(col(textCol), buckets, HashSeed).as("f"))
      .select(col("doc_id"), col("label"),
        col("f.len").as("len"), col("f.pairs").as("pairs"))

  /** Training over the packed frame: per iteration ONE map pass (margin
    * numerator via the dot kernel, per-doc error in-row — e_u computed
    * in its own Project BELOW the Generate, the Pq posexplode lesson)
    * plus a ≤B+1-row partial-aggregated gradient shuffle. No joins, no
    * doc-keyed exchange at all — strictly less cluster traffic than
    * [[train]], bit-identical weights (same long sums, same scalar ops
    * in the same order; spec-pinned against train AND trainLocal). */
  def trainPacked(packed: DataFrame, buckets: Int, iters: Int,
      lr: Double): QcModel = {
    val spark = packed.sparkSession
    import spark.implicits._
    val n = packed.count()
    require(n > 0, "trainPacked: empty corpus (n = 0 divides the update)")
    val w = new Array[Long](buckets + 1)
    for (_ <- 0 until iters) {
      val grads = packed
        .select(col("pairs"), col("label"), col("len"),
          graft.functions.QcExpressions.qcDotNum(col("pairs"), w.clone())
            .as("num"))
        .select(col("pairs"), col("label"), col("len"),
          ((col("num") / col("len")) / lit(WeightScale.toDouble))
            .as("margin"))
        .select(col("pairs"), expr(errExpr).as("e_u"))
        .select(explode(col("pairs")).as("p"), col("e_u"))
        .groupBy(col("p.bucket").as("bucket"))
        .agg(sum(col("p.cnt") * col("e_u")).as("g_u"))
        .as[(Int, Long)].collect()
      update(w, grads.iterator, lr, n)
    }
    QcModel(buckets, w)
  }

  /** Full-batch logistic GD, distributed. Deterministic: same corpus,
    * buckets, iters, lr → bit-identical weights under any partitioning
    * (all reductions are long sums); [[trainLocal]] is the reference. */
  def train(features: DataFrame, buckets: Int, iters: Int,
      lr: Double): QcModel = {
    val spark = features.sparkSession
    import spark.implicits._
    val n = features.select("doc_id").distinct().count()
    require(n > 0, "train: empty corpus (n = 0 divides the update)")
    val w = new Array[Long](buckets + 1)
    for (_ <- 0 until iters) {
      val errs = margins(features, w)
        .select(col("doc_id"), expr(errExpr).as("e_u"))
      val grads = features.join(errs, Seq("doc_id"))
        .groupBy("bucket")
        .agg(sum(col("cnt") * col("e_u")).as("g_u"))
        .as[(Int, Long)].collect()
      update(w, grads.iterator, lr, n)
    }
    QcModel(buckets, w)
  }

  /** The classical single-threaded trainer — the bit-exactness oracle
    * for [[train]], in the BpeSpec mold. Collects the feature frame
    * (test scale only) and runs the identical fixed-point arithmetic
    * sequentially. */
  def trainLocal(features: DataFrame, buckets: Int, iters: Int,
      lr: Double): QcModel = {
    val rows = features.select("doc_id", "label", "len", "bucket", "cnt")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4)))
    val n = rows.map(_._1).distinct.length.toLong
    val byDoc = rows.groupBy(_._1).toSeq.sortBy(_._1)
    val w = new Array[Long](buckets + 1)
    for (_ <- 0 until iters) {
      val grads = new Array[Long](buckets + 1)
      byDoc.foreach { case (_, fs) =>
        val label = fs.head._2
        val len = fs.head._3
        val num = fs.map(f => f._5 * w(f._4)).sum
        val margin = (num.toDouble / len) / WeightScale.toDouble
        val err = 1.0d / (1.0d + Math.exp(-margin)) - label
        val eU = quantize(err * ErrScale.toDouble / len)
        fs.foreach(f => grads(f._4) += f._5 * eU)
      }
      update(w, grads.iterator.zipWithIndex.map(_.swap), lr, n)
    }
    QcModel(buckets, w)
  }

  /** Persist a trained model: (bucket, w_u) parquet — exact longs, so
    * the round-trip is bit-for-bit (the Pq.writePq discipline). */
  def save(model: QcModel, spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    import spark.implicits._
    model.weightsU.toSeq.zipWithIndex.map { case (w, b) => (b, w) }
      .toDF("bucket", "w_u")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  def load(spark: org.apache.spark.sql.SparkSession, dir: String): QcModel = {
    import spark.implicits._
    val rows = spark.read.parquet(dir).select("bucket", "w_u")
      .as[(Int, Long)].collect().sortBy(_._1)
    require(rows.nonEmpty && rows.last._1 == rows.length - 1,
      s"malformed quality model at $dir")
    QcModel(rows.length - 1, rows.map(_._2))
  }

  /** Score a featurized frame: (doc_id, label, score_u, predicted) —
    * score_u the micro-unit margin (monotone in P(label=1)),
    * predicted = score_u > 0. Deterministic: the margin is a scalar
    * function of an exact long. */
  def score(features: DataFrame, model: QcModel): DataFrame =
    margins(features, model.weightsU)
      .select(col("doc_id"), col("label"),
        expr(s"cast(floor(margin * ${WeightScale}.0d + 0.5d) as long)")
          .as("score_u"))
      .withColumn("predicted", (col("score_u") > 0).cast("int"))

  /** Map-only scoring straight off raw documents — the in-row kernel
    * (functions/QcExpressions) computes the same fixed-point score with
    * NO featurize, NO join, NO shuffle: one expression call per row.
    * Bit-for-bit equal to [[score]] (spec-pinned); this is the corpus
    * scoring path and the one legal inside an append-mode stream. */
  def scoreKernel(docs: DataFrame, model: QcModel,
      idCol: String = "doc_id", textCol: String = "text",
      labelCol: String = "label"): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(labelCol).as("label"),
      graft.functions.QcExpressions.qcScoreU(col(textCol),
        model.weightsU, model.buckets, HashSeed).as("score_u"))
      .withColumn("predicted", (col("score_u") > 0).cast("int"))
}
