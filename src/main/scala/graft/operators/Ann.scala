package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * scale path for embedding search (driver north star; complements the
  * sign-LSH variant in graft.queries.Llm).
  *
  * Index: k-means cells over the corpus. Centroids are MODEL STATE — k×dim
  * floats — so Lloyd iterations keep per-dim means distributed (explode →
  * groupBy(cell, dim) → avg, a shuffle of k·dim aggregates) and only the
  * k×dim centroid table ever reaches the driver. Assignments stay in a
  * DataFrame keyed by cell.
  *
  * Search: score the query against k centroids (driver math on model
  * state), probe the `nprobe` nearest cells — the corpus scan is
  * `nprobe/k` of the data, scored exactly with the codegen'd vec_dot, then
  * windowed top-k. At 100 TB the assignment table is partitioned (or
  * bucketed) by cell_id, so a probe reads only its cells' files.
  *
  * Determinism: centroid init = seeded k-means++ over a hash-sampled
  * candidate set ([[KmeansInit]] — order-independent, seed-fixed RNG);
  * Lloyd means are exact per-dim averages.
  */
object Ann {

  final case class IvfIndex(
      assignments: DataFrame,             // (vec_id, embedding, cell_id)
      centroids: Array[Array[Float]])     // model state, k×dim

  /** Kernel argmax over cells (unit-norm ⇒ max dot = nearest): ONE
    * codegen'd plan node scoring all k centroids per row
    * ([[graft.functions.NearestCells]], p=1). Replaced the k-element
    * struct-array expression (round 8): that form inlined one dot
    * expression per cell, so codegen size bounded k at ~256; the kernel
    * carries the centroids as a flat reference object and k is bounded
    * only by per-task model-state memory. */
  private def nearestCellExpr(centroids: Array[Array[Float]]): Column =
    element_at(graft.functions.QuantExpressions.nearestCells(
      col("embedding"), centroids.flatten, centroids.length,
      centroids.head.length, p = 1), 1)

  /** Large-k assignment: centroids as a broadcast TABLE, corpus ⋈ all k
    * cells scoring dot per pair, min_by per vector. The join carries
    * k rows per vector but never materializes the k-way expression
    * array; data volume is corpus × k, embarrassingly parallel and
    * map-side only (broadcast join + partial-aggregated min_by). */
  private def assignByJoin(corpus: DataFrame,
      centroids: Array[Array[Float]]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cells = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell_id", "centroid")
    corpus.join(broadcast(cells))
      .select(col("vec_id"), col("embedding"), col("cell_id"),
        Vectors.dot(col("embedding"), col("centroid")).as("dot"))
      .groupBy(col("vec_id"))
      // tiebreak must MATCH the kernel path (NearestCells keeps the
      // LOWEST cell id on equal dots): order by (dot, -cell_id) so the
      // two sides of the KernelStateLimit gate assign identically —
      // an index built under the gate and appended past it (or vice
      // versa) must place an exact-tie vector in the same cell
      .agg(first(col("embedding")).as("embedding"),
        max_by(col("cell_id"),
          struct(col("dot"), (lit(0) - col("cell_id")).as("nc")))
          .as("cell_id"))
  }

  /** The kernel holds k·dim floats of model state per task; past this
    * (~16 MB — k ≈ 65k cells at dim 64) the centroid table stops being
    * task-local model state and the broadcast-join assignment is the
    * honest shape. */
  private val KernelStateLimitFloats = 4 * 1024 * 1024

  /** Test seam: the join assignment path regardless of k. */
  private[operators] def assignByJoinForTest(corpus: DataFrame,
      centroids: Array[Array[Float]]): DataFrame =
    assignByJoin(corpus, centroids)

  private[operators] def nearestCell(corpus: DataFrame,
      centroids: Array[Array[Float]]): DataFrame =
    if (centroids.length.toLong * centroids.head.length <=
        KernelStateLimitFloats)
      corpus.withColumn("cell_id", nearestCellExpr(centroids))
    else assignByJoin(corpus, centroids)

  def buildIvf(embeddings: DataFrame, k: Int, iters: Int): IvfIndex = {
    import embeddings.sparkSession.implicits._
    val corpus = embeddings.select(col("vec_id"), col("embedding")).persist()
    // deterministic seeded k-means++ over a hash-sampled candidate set —
    // order-independent, so a source-sorted corpus (first k vectors all
    // one cluster) seeds spread centroids instead of degenerate ones
    var centroids: Array[Array[Float]] = KmeansInit.seed(corpus, k)
    var it = 0
    while (it < iters) {
      // assign + per-dimension mean, all distributed; k·dim rows collect
      val assigned = nearestCell(corpus, centroids)
      val dims = assigned
        .select(col("cell_id"), posexplode(col("embedding")))
        .groupBy(col("cell_id"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .as[(Int, Int, Double)].collect()
      val next = centroids.map(_.clone())
      dims.foreach { case (cell, pos, m) => next(cell)(pos) = m.toFloat }
      centroids = next
      it += 1
    }
    val index = nearestCell(corpus, centroids)
    corpus.unpersist()
    IvfIndex(index, centroids)
  }

  /** Materialize the index with assignments PARTITIONED BY cell_id — the
    * layout the scaladoc's scale contract promises: a probe of `nprobe`
    * cells is a partition-pruned scan reading only those cells' files
    * (planning-time pruning for literal probes, dynamic partition
    * pruning for the broadcast probe join), i.e. `nprobe/k` of the
    * corpus bytes. Centroids (model state) land as one small parquet
    * alongside. */
  def writeIvf(index: IvfIndex, dir: String): Unit = {
    index.assignments.write.mode("overwrite")
      .partitionBy("cell_id").parquet(s"$dir/assignments")
    val spark = index.assignments.sparkSession
    import spark.implicits._
    index.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Incremental maintenance: assign NEW vectors with the index's
    * FROZEN centroids (retraining would orphan every existing
    * assignment — the production contract is model-freeze + periodic
    * full rebuild) and append them to the cell-partitioned layout.
    * Append-mode parquet adds files inside each cell partition, so
    * probes keep partition-pruning and existing files are untouched —
    * the same grow-in-place story as the incremental dedup registry.
    * Identical to having assigned those vectors at build time with the
    * same model (AnnSpec pins the equivalence). */
  def appendToIvf(spark: org.apache.spark.sql.SparkSession, dir: String,
      newVectors: DataFrame): Unit = {
    val idx = loadIvf(spark, dir)
    // layout guard: an IVF+PQ assignments dir carries codes, not
    // embeddings — appending embedding-shaped rows there would mix
    // schemas silently (see Pq.appendToIvfPq for the mirror check)
    require(idx.assignments.columns.contains("embedding") &&
      !idx.assignments.columns.contains("codes"),
      s"$dir/assignments is not a plain IVF layout — use appendToIvfPq")
    requireNoRotation(spark, dir)
    nearestCell(newVectors.select(col("vec_id"), col("embedding")),
      idx.centroids)
      .write.mode("append").partitionBy("cell_id")
      .parquet(s"$dir/assignments")
  }

  /** Shared append guard: an OPQ index dir (writeOpq/writeOpqIvfPq =
    * the plain layout + `rotation/`) satisfies the column checks, but
    * its cells/codes live in the ROTATED basis — a plain append would
    * assign and encode new vectors unrotated, silently degrading
    * recall. Probe the dir's own filesystem (remote dirs included). */
  private[operators] def requireNoRotation(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/rotation")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(p),
      s"$dir is an OPQ index (has rotation/) — its vectors are stored " +
        "in the rotated basis; use an OPQ-aware append, not a plain one")
  }

  def loadIvf(spark: org.apache.spark.sql.SparkSession, dir: String): IvfIndex = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell_id").select("centroid")
      .as[Seq[Float]].collect().map(_.toArray)
    IvfIndex(spark.read.parquet(s"$dir/assignments"), centroids)
  }

  /** Top-k per query vector, probing the nprobe nearest cells. `queries`
    * is (q_id, qvec); small enough to broadcast. */
  def search(index: IvfIndex, queries: DataFrame, topK: Int, nprobe: Int)
      : DataFrame = {
    // query → probed cells, from model state (k dots per query, driver)
    val probes = queries.select(col("q_id"), col("qvec"),
      explode(probeCellsExpr(index.centroids, nprobe)).as("cell_id"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    index.assignments
      .join(broadcast(probes), Seq("cell_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(Vectors.dot(col("embedding"), col("qvec")), 6).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select("q_id", "rnk", "vec_id", "cos")
      .orderBy("q_id", "rnk")
  }

  /** Metadata-FILTERED IVF search: the predicate's id set semi-joins
    * the assignments BEFORE scoring, so the probe scan reads only
    * eligible vectors — pre-filtering, never post- (the
    * [[FilteredSearch]] contract; this is FAISS' IDSelector /
    * filtered-IVF shape). Exact at nprobe = kCells on the eligible
    * subset (FilteredSearchSpec pins ≡ [[FilteredSearch
    * .exactFiltered]] bit-for-bit); under partial probes, widen nprobe
    * as selectivity drops — expected eligible candidates per query are
    * (nprobe/kCells)·|eligible|. At 100 TB the semi join runs on the
    * partition-pruned probe scan ([[writeIvf]]'s cell layout), and a
    * predicate on a real column pushes into the parquet scan before
    * the join. */
  def searchFiltered(index: IvfIndex, queries: DataFrame,
      eligible: DataFrame, topK: Int, nprobe: Int): DataFrame = {
    val data = index.assignments
      .join(eligible.select(col("vec_id")), Seq("vec_id"), "left_semi")
    search(IvfIndex(data, index.centroids), queries, topK, nprobe)
  }

  private def probeCellsExpr(
      centroids: Array[Array[Float]], nprobe: Int): Column = {
    // rank cells by dot(qvec, centroid); take the nprobe best
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(Vectors.dot(col("qvec"), typedLit(c.toSeq)).as("dot"),
        lit(i).as("cell"))
    }
    slice(reverse(array_sort(array(scored.toIndexedSeq: _*))), 1, nprobe)
      .getField("cell")
  }
}
