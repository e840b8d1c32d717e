package graft.operators

import graft.functions.PcaExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-
  * reduction step a training-data pipeline runs before clustering /
  * visualization / cheap ANN (and the whitening front-end of many
  * embedding dedup recipes).
  *
  * Reference scope: the sink's consumers post-process landed embedding
  * tables; this is the missing reduce step beside the quantizer ladder
  * (PQ 16× / SQ8 4× / BQ 32× compress the SAME dim — PCA is the only
  * operator that cuts dim itself).
  *
  * Scale design (100 TB): training is ONE corpus pass — a mapPartitions
  * moment accumulator carrying E[xxᵀ] (d² doubles), Σx (d doubles) and
  * the row count in a single quantized partial, combined with an
  * order-free long treeReduce; d×d stays driver-sized by contract
  * (d ≤ a few thousand), exactly the [[Opq.secondMoment]] shape.
  * Projection is map-only: one codegen'd kernel call per row
  * ([[graft.functions.ProjectVector]]), no shuffle, no UDF.
  *
  * Determinism (house discipline): partials quantize to micro-unit
  * longs so the combine is order-free integer addition (partitioning-
  * independent bit-for-bit); the eigendecomposition is the
  * deterministic cyclic-Jacobi sweep shared with OPQ; component order
  * is (eigenvalue desc, index asc) and each component's sign is
  * canonicalized so its largest-|coordinate| entry is positive —
  * re-training on a repartitioned corpus reproduces the model exactly.
  */
object Pca {

  /** `components` is kOut×dim row-major; `evals` are the matching
    * eigenvalues (variance captured per component), descending. */
  final case class PcaModel(mean: Array[Double], components: Array[Float],
      evals: Array[Double], dim: Int, kOut: Int, totalVariance: Double) {
    /** Fraction of total variance captured by the kOut components. */
    def varianceExplained: Double = evals.sum / totalVariance
  }

  /** One-pass moments: (E[xxᵀ], mean, n). Each ROW's contributions
    * quantize to micro-unit longs before entering the accumulator —
    * stricter than [[Opq.secondMoment]]'s per-partition quantization,
    * because the PcaSpec pin is bit-identity under REPARTITIONING, and
    * a per-partition double sum leaks the partition boundaries into the
    * float dust. Long-sum bound: |x_ix_j|·1e6 per row per cell, so the
    * accumulator holds n·max|x|²·1e6 — raise the micro-unit scale down
    * if a corpus pushes past ~10¹² rows of unit-scale embeddings. */
  private[operators] def moments(embeddings: DataFrame, dim: Int)
      : (Array[Array[Double]], Array[Double], Long) = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val nSlots = dim * dim + dim + 1
    val micro = embeddings.select(col("embedding")).as[Array[Float]]
      .rdd.mapPartitions { it =>
        val q = new Array[Long](nSlots)
        it.foreach { v =>
          require(v.length == dim,
            s"pca moments: embedding length ${v.length} != $dim")
          var i = 0
          while (i < dim) {
            val vi = v(i).toDouble
            q(dim * dim + i) += math.rint(vi * 1e6).toLong
            val base = i * dim
            var j = 0
            while (j < dim) {
              q(base + j) += math.rint(vi * v(j) * 1e6).toLong
              j += 1
            }
            i += 1
          }
          q(nSlots - 1) += 1L
        }
        Iterator.single(q)
      }
      .treeReduce { (a, b) =>
        val out = new Array[Long](a.length)
        var i = 0
        while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
        out
      }
    val n = micro(nSlots - 1)
    require(n > 0, "PCA needs a non-empty corpus")
    val exx = Array.tabulate(dim, dim)((i, j) => micro(i * dim + j) / 1e6 / n)
    val mu = Array.tabulate(dim)(i => micro(dim * dim + i) / 1e6 / n)
    (exx, mu, n)
  }

  /** Train a kOut-component model: covariance = E[xxᵀ] − μμᵀ, Jacobi
    * eigendecomposition, components by (eigenvalue desc, index asc)
    * with canonical sign. */
  def train(embeddings: DataFrame, kOut: Int): PcaModel = {
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    require(kOut >= 1 && kOut <= dim, s"kOut $kOut out of [1, $dim]")
    val (exx, mu, _) = moments(embeddings, dim)
    val cov = Array.tabulate(dim, dim)((i, j) => exx(i)(j) - mu(i) * mu(j))
    val (evals, vecs) = Opq.jacobiEigen(cov)
    val order = (0 until dim).sortBy(i => (-evals(i), i)).take(kOut)
    val comps = new Array[Float](kOut * dim)
    val outEvals = new Array[Double](kOut)
    var r = 0
    while (r < kOut) {
      val e = order(r)
      // canonical sign: the largest-|coordinate| entry (first wins
      // ties) is made positive — eigenvectors are only defined up to
      // sign, and Jacobi's depends on the input's float dust
      var best = 0
      var i = 1
      while (i < dim) {
        if (math.abs(vecs(i)(e)) > math.abs(vecs(best)(e))) best = i
        i += 1
      }
      val flip = if (vecs(best)(e) < 0.0) -1.0 else 1.0
      i = 0
      while (i < dim) {
        comps(r * dim + i) = (flip * vecs(i)(e)).toFloat
        i += 1
      }
      outEvals(r) = evals(e)
      r += 1
    }
    PcaModel(mu, comps, outEvals, dim, kOut,
      totalVariance = (0 until dim).map(i => cov(i)(i)).sum)
  }

  /** Map-only projection: adds `pc` = ARRAY<FLOAT>(kOut). */
  def project(embeddings: DataFrame, model: PcaModel): DataFrame =
    embeddings.withColumn("pc",
      PcaExpressions.project(col("embedding"), model.mean,
        model.components, model.dim, model.kOut))

  /** Persist the model per component row (the [[Opq.writeOpq]] layout
    * discipline: small model state lands as ordered parquet rows). */
  def write(spark: org.apache.spark.sql.SparkSession, model: PcaModel,
      dir: String): Unit = {
    import spark.implicits._
    (0 until model.kOut).map { r =>
      (r, model.components.slice(r * model.dim, (r + 1) * model.dim).toSeq,
        model.evals(r))
    }.toDF("r", "row", "eval")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/components")
    Seq((model.mean.toSeq, model.dim, model.kOut, model.totalVariance))
      .toDF("mean", "dim", "k_out", "total_variance")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def load(spark: org.apache.spark.sql.SparkSession, dir: String)
      : PcaModel = {
    import spark.implicits._
    val (mean, dim, kOut, tv) = spark.read.parquet(s"$dir/meta")
      .as[(Seq[Double], Int, Int, Double)].head()
    val rows = spark.read.parquet(s"$dir/components")
      .orderBy("r").select("row", "eval")
      .as[(Seq[Float], Double)].collect()
    PcaModel(mean.toArray, rows.flatMap(_._1).toArray, rows.map(_._2),
      dim, kOut, tv)
  }
}
