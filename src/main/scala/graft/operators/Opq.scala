package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.QuantExpressions

/** Optimized product quantization — the parametric variant of Ge et
  * al. 2013 ("Optimized product quantization for approximate nearest
  * neighbor search", CVPR): learn an orthonormal rotation R that
  * decorrelates the embedding (PCA basis) and BALANCES variance across
  * the m PQ subspaces (eigenvalue allocation), then product-quantize
  * the rotated vectors. Plain PQ's independence assumption fails on
  * correlated embeddings — real encoder outputs concentrate variance
  * in a few directions, so some subspaces carry most of the error;
  * OPQ-P fixes both in closed form (no alternating optimization),
  * which keeps training deterministic and cheap.
  *
  * Spark shape (all model-state discipline):
  *  - the d×d second moment is ONE map-only pass: each partition
  *    accumulates its d² partial in doubles and emits it quantized to
  *    micro-units, so the cross-partition combine is an order-free
  *    LONG sum — the fixed-point contract; the matrix (a few thousand
  *    doubles) is the only thing that reaches the driver;
  *  - the eigendecomposition is a driver-local cyclic Jacobi sweep
  *    over the d×d symmetric matrix (deterministic rotation order);
  *  - rotation is a map-only codegen kernel
  *    ([[graft.functions.RotateVector]]); orthonormal R preserves dot
  *    products, so exact re-rank scores are unchanged and recall
  *    gains come purely from lower quantization error.
  *
  * Uncentered second moment, not covariance, deliberately: ADC scores
  * are dot products, and mean-centering would shift them; the PCA of
  * E[xxᵀ] optimizes exactly the geometry the quantizer sees.
  */
object Opq {

  /** Rotation (dim×dim row-major) + the PQ model trained in the
    * rotated basis. */
  final case class OpqModel(rotation: Array[Float], dim: Int,
      pq: Pq.PqModel)

  /** Distributed d×d second moment, micro-unit fixed point: partition
    * partials quantize to longs, the combine is an order-free long
    * sum. Returns E[xxᵀ] (divided by n) in doubles. */
  private[operators] def secondMoment(embeddings: DataFrame,
      dim: Int): Array[Array[Double]] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // ONE corpus pass: the quantized partial array carries the row
    // count in its last slot, so n comes out of the same treeReduce —
    // a separate count() would be a second full scan
    val micro = embeddings.select(col("embedding")).as[Array[Float]]
      .rdd.mapPartitions { it =>
        val acc = new Array[Double](dim * dim)
        var rows = 0L
        it.foreach { v =>
          require(v.length == dim,
            s"second moment: embedding length ${v.length} != $dim")
          var i = 0
          while (i < dim) {
            val vi = v(i).toDouble
            val base = i * dim
            var j = 0
            while (j < dim) { acc(base + j) += vi * v(j); j += 1 }
            i += 1
          }
          rows += 1L
        }
        val q = new Array[Long](dim * dim + 1)
        var t = 0
        while (t < dim * dim) { q(t) = math.rint(acc(t) * 1e6).toLong; t += 1 }
        q(dim * dim) = rows
        Iterator.single(q)
      }
      .treeReduce { (a, b) =>
        val out = new Array[Long](a.length)
        var i = 0
        while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
        out
      }
    val n = micro(dim * dim).toDouble
    require(n > 0, "OPQ needs a non-empty corpus")
    Array.tabulate(dim, dim)((i, j) => micro(i * dim + j) / 1e6 / n)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix —
    * deterministic (fixed (p,q) sweep order, fixed sweep count bound).
    * Returns (eigenvalues, eigenvectors as COLUMNS of V). */
  private[operators] def jacobiEigen(a0: Array[Array[Double]],
      maxSweeps: Int = 64, tol: Double = 1e-12)
      : (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < maxSweeps && off > tol) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol / (n * n)) {
            // classical Jacobi rotation zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              math.signum(theta) / (math.abs(theta) +
                math.sqrt(theta * theta + 1.0)) match {
                case x if x == 0.0 => 1.0 // theta == 0 → t = 1
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < n) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) {
        if (i != j) s += a(i)(j) * a(i)(j)
        j += 1
      }
      i += 1
    }
    math.sqrt(s)
  }

  /** Eigenvalue allocation (Ge 2013 §4): dims in eigenvalue-descending
    * order, each assigned greedily to the subspace with the smallest
    * current Σ log λ that still has capacity — balancing the PER-
    * SUBSPACE variance products so no codebook drowns. Returns the
    * eigen indices of each subspace, in assignment order. */
  private[operators] def allocate(evals: Array[Double],
      m: Int): Array[Array[Int]] = {
    val dim = evals.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val cap = dim / m
    val order = evals.indices.sortBy(i => (-evals(i), i))
    val buckets = Array.fill(m)(new scala.collection.mutable.ArrayBuffer[Int])
    val sums = new Array[Double](m)
    order.foreach { ei =>
      var best = -1
      var bestSum = Double.MaxValue
      var b = 0
      while (b < m) {
        if (buckets(b).size < cap && sums(b) < bestSum) {
          best = b; bestSum = sums(b)
        }
        b += 1
      }
      buckets(best) += ei
      sums(best) += math.log(math.max(evals(ei), 1e-12))
    }
    buckets.map(_.toArray)
  }

  /** Full training: second moment → Jacobi → allocation → rotation →
    * PQ in the rotated basis. */
  def train(embeddings: DataFrame, m: Int, k: Int, iters: Int): OpqModel = {
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    val (evals, vecs) = jacobiEigen(secondMoment(embeddings, dim))
    val rot = buildRotation(evals, vecs, m)
    val rotated = rotatedCorpus(embeddings, rot, dim)
    OpqModel(rot, dim, Pq.train(rotated, m, k, iters))
  }

  /** Row r of R = the r-th allocated eigenvector (as a row), so
    * y = R·x expresses x in the allocation-ordered PCA basis. */
  private[operators] def buildRotation(evals: Array[Double],
      vecs: Array[Array[Double]], m: Int): Array[Float] = {
    val dim = evals.length
    val rows = allocate(evals, m).flatten
    val rot = new Array[Float](dim * dim)
    var r = 0
    while (r < dim) {
      val ei = rows(r)
      var j = 0
      while (j < dim) { rot(r * dim + j) = vecs(j)(ei).toFloat; j += 1 }
      r += 1
    }
    rot
  }

  private def rotatedCorpus(embeddings: DataFrame, rot: Array[Float],
      dim: Int): DataFrame =
    embeddings.select(col("vec_id"),
      QuantExpressions.rotate(col("embedding"), rot, dim).as("embedding"))

  /** Encode through the composed kernels: rotate → pq_codes, both
    * map-only codegen calls, no shuffle. */
  def encode(embeddings: DataFrame, model: OpqModel): DataFrame =
    Pq.encode(rotatedCorpus(embeddings, model.rotation, model.dim), model.pq)

  /** ADC shortlist in the rotated basis, exact re-rank in the ORIGINAL
    * basis (rotation preserves dot products, so the two agree; using
    * the original corpus avoids a second rotated copy of it). */
  def searchRerank(codes: DataFrame, model: OpqModel, corpus: DataFrame,
      queries: DataFrame, topK: Int, shortlist: Int): DataFrame = {
    val rq = queries.select(col("q_id"),
      QuantExpressions.rotate(col("qvec"), model.rotation, model.dim)
        .as("qvec"))
    val short = Pq.search(codes, model.pq, rq, shortlist)
      .select(col("q_id"), col("vec_id"))
    Pq.rerank(short, corpus, queries, topK)
  }

  /** The full production composition (the FAISS index-factory
    * "OPQ_m,IVF_k,PQ_m" shape): rotation first, then coarse cells AND
    * PQ codes both trained in the rotated basis. Probes, ADC and the
    * re-rank all run rotated — orthonormal rotation preserves dot
    * products, so the exact re-rank scores are the same numbers up to
    * float rounding, and recall inherits OPQ's lower quantization
    * error on top of IVFPQ's partition-pruned scan. */
  final case class OpqIvfPqIndex(rotation: Array[Float], dim: Int,
      index: Pq.IvfPqIndex)

  def buildIvfPq(embeddings: DataFrame, kCells: Int, m: Int, k: Int,
      iters: Int): OpqIvfPqIndex = {
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    val (evals, vecs) = jacobiEigen(secondMoment(embeddings, dim))
    val rot = buildRotation(evals, vecs, m)
    OpqIvfPqIndex(rot, dim,
      Pq.buildIvfPq(rotatedCorpus(embeddings, rot, dim), kCells, m, k,
        iters))
  }

  def searchIvfPq(idx: OpqIvfPqIndex, queries: DataFrame,
      corpus: DataFrame, topK: Int, nprobe: Int,
      shortlist: Int): DataFrame = {
    val rq = queries.select(col("q_id"),
      QuantExpressions.rotate(col("qvec"), idx.rotation, idx.dim)
        .as("qvec"))
    // probes + ADC run rotated; the exact re-rank uses the ORIGINAL
    // corpus and queries (rotation preserves dot products — the
    // searchRerank argument). Rotating the corpus for the re-rank
    // would evaluate the dim² kernel on every probed corpus row per
    // search instead of only the broadcast-fetched shortlist.
    val short = Pq.searchIvfPqShortlist(idx.index, rq, nprobe, shortlist)
    Pq.rerank(short, corpus, queries, topK)
  }

  def writeOpqIvfPq(idx: OpqIvfPqIndex, dir: String): Unit = {
    Pq.writeIvfPq(idx.index, dir)
    val spark = idx.index.assignments.sparkSession
    import spark.implicits._
    (0 until idx.dim).map { r =>
      (r, idx.rotation.slice(r * idx.dim, (r + 1) * idx.dim).toSeq)
    }.toDF("r", "row")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/rotation")
  }

  def loadOpqIvfPq(spark: org.apache.spark.sql.SparkSession,
      dir: String): OpqIvfPqIndex = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$dir/rotation")
      .orderBy("r").select("row").as[Seq[Float]].collect()
    OpqIvfPqIndex(rows.flatten.toArray, rows.length,
      Pq.loadIvfPq(spark, dir))
  }

  /** Persist rotation + codebooks + codes in one layout ([[Pq.writePq]]
    * plus the rotation table). */
  def writeOpq(model: OpqModel, codes: DataFrame, dir: String): Unit = {
    Pq.writePq(model.pq, codes, dir)
    val spark = codes.sparkSession
    import spark.implicits._
    (0 until model.dim).map { r =>
      (r, model.rotation.slice(r * model.dim, (r + 1) * model.dim).toSeq)
    }.toDF("r", "row")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/rotation")
  }

  def loadOpq(spark: org.apache.spark.sql.SparkSession, dir: String)
      : (OpqModel, DataFrame) = {
    import spark.implicits._
    val (pq, codes) = Pq.loadPq(spark, dir)
    val rows = spark.read.parquet(s"$dir/rotation")
      .orderBy("r").select("row").as[Seq[Float]].collect()
    (OpqModel(rows.flatten.toArray, rows.length, pq), codes)
  }
}
