package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SqExpressions

/** Scalar quantization (SQ8) — FAISS's other production quantizer
  * beside PQ/OPQ (IndexScalarQuantizer, QT_8bit): each DIMENSION is
  * quantized independently to 8 bits on a uniform [min, max] grid
  * learned from the corpus. 4× compression with near-lossless
  * ranking — the shape deployments pick when PQ's codebook training
  * is unwanted and 4× (not 16-64×) compression suffices.
  *
  * Training is embarrassingly order-free: per-dimension min/max (one
  * posexplode aggregation, exact — no k-means, no seeds, so the model
  * is bit-deterministic under ANY partitioning by construction).
  * Encode and the decode-free asymmetric dot are codegen kernels
  * ([[graft.functions.SqEncode]]/[[graft.functions.SqDot]] — model
  * state as reference objects, one call per row); codes are dim-byte
  * BINARY.
  *
  * Search follows [[Pq.searchRerank]]'s production shape: the byte
  * codes table prunes the corpus to a shortlist per query, and only
  * shortlisted vectors' full embeddings are fetched for the exact
  * rerank. Quantization error is BOUNDED (≤ delta/2 per dimension —
  * SqSpec pins it), so modest shortlists recover exact ranking with
  * high probability; contrast PQ, whose codebook error is data-shaped.
  */
object Sq {

  /** Per-dim grid: vmin[d] + vdelta[d]·u, u ∈ 0..255. */
  final case class SqModel(vmin: Array[Float], vdelta: Array[Float]) {
    def dim: Int = vmin.length
  }

  /** One exact aggregation: per-dimension min/max over the corpus. */
  def train(embeddings: DataFrame): SqModel = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val rows = embeddings
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .orderBy("pos").select("lo", "hi").as[(Float, Float)].collect()
    SqModel(rows.map(_._1),
      rows.map { case (lo, hi) => (hi - lo) / 255f })
  }

  /** (vec_id, code BINARY) — map-only, one kernel call per row. */
  def encode(embeddings: DataFrame, model: SqModel): DataFrame =
    embeddings.select(col("vec_id"),
      SqExpressions.encode(col("embedding"), model.vmin, model.vdelta)
        .as("code"))

  /** Shortlist by the decode-free asymmetric dot over the codes table
    * (queries broadcast with their float vectors), same output contract
    * as [[Pq.search]]. */
  def search(codes: DataFrame, model: SqModel, queries: DataFrame,
      topK: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sqdot").desc, col("vec_id").asc)
    codes.join(broadcast(queries.select(col("q_id"), col("qvec"))))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sqdot",
        SqExpressions.dot(col("code"), col("qvec"), model.vmin, model.vdelta))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("vec_id"),
        round(col("sqdot"), 6).as("sqdot"))
      .orderBy("q_id", "rnk")
  }

  /** Production shape: SQ shortlist → exact rerank of only the
    * shortlisted embeddings ([[Pq.rerank]]'s contract). */
  def searchRerank(codes: DataFrame, model: SqModel, corpus: DataFrame,
      queries: DataFrame, topK: Int, shortlist: Int): DataFrame =
    Pq.rerank(search(codes, model, queries, shortlist)
      .select(col("q_id"), col("vec_id")), corpus, queries, topK)

  // ------------------------------------------------------------------
  // IVF + SQ — the composed index (FAISS factory "IVF_k,SQ8"): coarse
  // cells for partition-pruned probes, dim-byte SQ codes as the
  // scanned payload. Mirrors Pq.buildIvfPq/searchIvfPq structurally —
  // only the payload quantizer differs.
  // ------------------------------------------------------------------

  final case class IvfSqIndex(assignments: DataFrame,
      centroids: Array[Array[Float]], model: SqModel)

  def buildIvfSq(embeddings: DataFrame, kCells: Int, iters: Int)
      : IvfSqIndex = {
    val ivf = Ann.buildIvf(embeddings, kCells, iters)
    val model = train(embeddings)
    IvfSqIndex(ivf.assignments.select(col("vec_id"), col("cell_id"),
      graft.functions.SqExpressions.encode(col("embedding"),
        model.vmin, model.vdelta).as("code")), ivf.centroids, model)
  }

  /** Probe the nprobe nearest cells, asymmetric-dot ONLY their codes,
    * exact-rerank the shortlist — [[Pq.searchIvfPq]]'s contract. */
  def searchIvfSq(index: IvfSqIndex, queries: DataFrame,
      corpus: DataFrame, topK: Int, nprobe: Int,
      shortlist: Int): DataFrame = {
    val probes = queries.select(col("q_id"), col("qvec"),
      explode(graft.functions.QuantExpressions.nearestCells(col("qvec"),
        index.centroids.flatten, index.centroids.length,
        index.centroids.head.length, nprobe)).as("cell_id"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sqdot").desc, col("vec_id").asc)
    val short = index.assignments
      .join(broadcast(probes), Seq("cell_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sqdot", graft.functions.SqExpressions.dot(
        col("code"), col("qvec"), index.model.vmin, index.model.vdelta))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= shortlist)
      .select(col("q_id"), col("vec_id"))
    Pq.rerank(short, corpus, queries.select(col("q_id"), col("qvec")), topK)
  }

  /** Materialize the composed index: cell-partitioned codes (pruned
    * probes) + centroids + grid — [[Pq.writeIvfPq]]'s layout shape. */
  def writeIvfSq(index: IvfSqIndex, dir: String): Unit = {
    val spark = index.assignments.sparkSession
    import spark.implicits._
    index.assignments.write.mode("overwrite")
      .partitionBy("cell_id").parquet(s"$dir/assignments")
    index.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("cell_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    index.model.vmin.zip(index.model.vdelta).zipWithIndex
      .map { case ((lo, de), d) => (d, lo, de) }
      .toSeq.toDF("pos", "vmin", "vdelta")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/sq_grid")
  }

  /** Incremental maintenance: frozen coarse centroids pick the cell,
    * the frozen grid encodes the code, rows append into the cell
    * partitions — [[Ann.appendToIvf]]'s grow-in-place contract. */
  def appendToIvfSq(spark: org.apache.spark.sql.SparkSession,
      dir: String, newVectors: DataFrame): Unit = {
    // layout guard BEFORE the model load: SQ assignments carry a BINARY
    // `code`; refuse plain IVF (embedding) and IVFPQ (codes) layouts,
    // and OPQ dirs — fail with the guard's message, not a missing-path
    // read error
    val assignCols = spark.read.parquet(s"$dir/assignments").columns
    require(assignCols.contains("code") && !assignCols.contains("codes") &&
      !assignCols.contains("embedding"),
      s"$dir/assignments is not an IVF+SQ layout — use the matching append")
    Ann.requireNoRotation(spark, dir)
    val idx = loadIvfSq(spark, dir)
    Ann.nearestCell(newVectors.select(col("vec_id"), col("embedding")),
        idx.centroids)
      .select(col("vec_id"), col("cell_id"),
        graft.functions.SqExpressions.encode(col("embedding"),
          idx.model.vmin, idx.model.vdelta).as("code"))
      .write.mode("append").partitionBy("cell_id")
      .parquet(s"$dir/assignments")
  }

  def loadIvfSq(spark: org.apache.spark.sql.SparkSession,
      dir: String): IvfSqIndex = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell_id").select("centroid")
      .as[Seq[Float]].collect().map(_.toArray)
    val rows = spark.read.parquet(s"$dir/sq_grid")
      .orderBy("pos").select("vmin", "vdelta")
      .as[(Float, Float)].collect()
    IvfSqIndex(spark.read.parquet(s"$dir/assignments"), centroids,
      SqModel(rows.map(_._1), rows.map(_._2)))
  }

  /** Materialize: codes table + the tiny per-dim grid, mirroring
    * [[Pq.writePq]]'s layout contract (detection key: `sq_grid`). */
  def writeSq(model: SqModel, codes: DataFrame, dir: String): Unit = {
    codes.write.mode("overwrite").parquet(s"$dir/codes")
    val spark = codes.sparkSession
    import spark.implicits._
    model.vmin.zip(model.vdelta).zipWithIndex
      .map { case ((lo, de), d) => (d, lo, de) }
      .toSeq.toDF("pos", "vmin", "vdelta")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/sq_grid")
  }

  def loadSq(spark: org.apache.spark.sql.SparkSession, dir: String)
      : (SqModel, DataFrame) = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$dir/sq_grid")
      .orderBy("pos").select("vmin", "vdelta")
      .as[(Float, Float)].collect()
    (SqModel(rows.map(_._1), rows.map(_._2)),
      spark.read.parquet(s"$dir/codes"))
  }
}
