package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for approximate nearest neighbor — the
  * memory-bound scale path for embedding search, after Jégou et al. 2011
  * ("Product quantization for nearest neighbor search", IEEE TPAMI 33(1)).
  *
  * The embedding is split into `m` subspaces; each subspace gets its own
  * k-means codebook of `k` codewords, and a vector is stored as the m
  * codeword ids of its nearest codewords — m small ints instead of
  * dim floats (64-dim float32 at m=8: 256 bytes → 8 bytes, 32×). Search
  * uses asymmetric distance computation (ADC): the query stays exact, a
  * per-query m×k table of subspace dot products is computed ONCE from
  * model state, and each corpus vector's score is m table lookups — no
  * float math against the corpus at all.
  *
  * Spark shape:
  *  - training reuses the IVF discipline ([[Ann.buildIvf]]): deterministic
  *    seeded k-means++ init ([[KmeansInit]], sliced per subspace), distributed
  *    Lloyd steps (assign via inline argmin expression, per-dimension
  *    means via explode → groupBy), only the m×k×(dim/m) codebook — model
  *    state — ever reaches the driver;
  *  - encoding is MAP-ONLY: the m argmin expressions are evaluated
  *    directly on the embedding column inside whole-stage codegen, no
  *    explode/shuffle of the corpus;
  *  - ADC is map-only too: the per-query tables (m×k doubles) ride a
  *    broadcast join, scoring is an `aggregate` of m element_at lookups;
  *    per-query top-k via window over the partial-aggregated scores.
  *
  * At 100 TB the codes table IS the index: 8 bytes/vector means a
  * billion-vector corpus scans from ~8 GB instead of ~256 GB — the scan
  * stays executor-memory-resident where raw embeddings would spill.
  * Like IVF's inline assignment, the argmin expression is right for
  * small m·k (codegen stays compact); past a few hundred codewords the
  * join-based assignment shape is the escape hatch (Ann.assignByJoin).
  */
object Pq {

  /** Trained codebooks, [m][k][dim/m] — model state. */
  final case class PqModel(m: Int, k: Int, sub: Int,
      codebooks: Array[Array[Array[Float]]])

  /** [m][k][sub] row-major flat model state for the codegen kernel. */
  private def flatCb(model: PqModel): Array[Float] =
    model.codebooks.flatten.flatten

  private def codesCol(model: PqModel): Column =
    graft.functions.QuantExpressions.pqCodes(col("embedding"),
      flatCb(model), model.m, model.k, model.sub)

  /** Train per-subspace codebooks with `iters` joint Lloyd steps: all m
    * subspaces train in the SAME distributed pass (subspace id is just
    * another group key), so the iteration count — not m — bounds the
    * number of Spark jobs. Assignment runs through the codegen'd
    * [[graft.functions.PqCodes]] kernel (the HOF-lambda form was
    * interpreted per element — 5.5k vec/s in the ProfileAnn sweep;
    * the expanded-expression form made Catalyst analysis the cost). */
  def train(embeddings: DataFrame, m: Int, k: Int, iters: Int): PqModel = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val corpus = embeddings.select(col("vec_id"), col("embedding")).persist()
    val dim = corpus.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    // ONE hash-sampled candidate pass seeds all m subspace codebooks via
    // driver-side k-means++ (per-subspace seed offset keeps the m RNG
    // streams independent) — order-independent, so a source-sorted
    // corpus no longer collapses the initial codebooks into one cluster
    val cand = KmeansInit.sample(corpus, math.max(k * 8, 64))
    require(cand.length >= k,
      s"PQ needs at least k=$k vectors to seed codebooks, corpus has " +
        s"${cand.length}")
    var cb: Array[Array[Array[Float]]] = Array.tabulate(m) { mi =>
      val subCand = cand.map(_.slice(mi * sub, (mi + 1) * sub))
      KmeansInit.localRefine(subCand,
        KmeansInit.plusPlus(subCand, k, seed = 42L + mi), iters = 10)
    }
    var it = 0
    while (it < iters) {
      val model = PqModel(m, k, sub, cb)
      // per-dimension means keyed by (subspace, assigned code, dim-in-
      // subspace): m·k·sub aggregate rows collect — model state
      // codes are computed in a Project BELOW the Generate: as a sibling
      // of posexplode they would sit in the Project above it and the
      // encode kernel would re-run once per exploded element — dim
      // redundant kernel runs per vector per iteration
      val dims = corpus
        .select(col("embedding"), codesCol(model).as("codes"))
        .select(posexplode(col("embedding")), col("codes"))
        .select(expr(s"pos div $sub").cast("int").as("msub"),
          element_at(col("codes"), expr(s"cast((pos div $sub) + 1 as int)"))
            .as("code"),
          pmod(col("pos"), lit(sub)).as("p"), col("col"))
        .groupBy(col("msub"), col("code"), col("p"))
        .agg(avg(col("col")).as("mval"))
        .as[(Int, Int, Int, Double)].collect()
      val next = cb.map(_.map(_.clone()))
      dims.foreach { case (mi, ci, pos, v) => next(mi)(ci)(pos) = v.toFloat }
      cb = next
      it += 1
    }
    corpus.unpersist()
    PqModel(m, k, sub, cb)
  }

  /** Encode the corpus to (vec_id, codes ARRAY<INT> of length m) —
    * map-only, ONE codegen'd kernel node per row. */
  def encode(embeddings: DataFrame, model: PqModel): DataFrame =
    embeddings.select(col("vec_id"), codesCol(model).as("codes"))

  /** Per-query ADC lookup tables (m×k subspace dot products) computed
    * from model state on the driver — the same model-state contract as
    * Ann.search's probe selection. Broadcast-sized by construction. */
  private def adcTableDf(model: PqModel, queries: DataFrame): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qs = queries.select(col("q_id"), col("qvec"))
      .as[(Long, Seq[Float])].collect()
    val tables: Seq[(Long, Seq[Seq[Double]])] = qs.toSeq.map { case (qid, qv) =>
      val tbl = (0 until model.m).map { mi =>
        val qsub = qv.slice(mi * model.sub, (mi + 1) * model.sub)
        (0 until model.k).map { j =>
          val cw = model.codebooks(mi)(j)
          var s = 0.0
          var i = 0
          while (i < model.sub) { s += qsub(i).toDouble * cw(i); i += 1 }
          s
        }
      }
      (qid, tbl.map(_.toSeq))
    }
    tables.toDF("q_id", "tbl")
  }

  // codegen'd kernel — the aggregate(sequence(...)) HOF form was
  // interpreted per element (QuantExpressions.AdcScore scaladoc)
  private def adcCol: Column =
    graft.functions.QuantExpressions.adcScore(col("codes"), col("tbl"))

  private def adcWindow = Window.partitionBy(col("q_id"))
    .orderBy(col("adc").desc, col("vec_id").asc)

  /** ADC top-k: per-query m×k dot-product tables from model state, then
    * each corpus vector scores as m table lookups. */
  def search(codes: DataFrame, model: PqModel, queries: DataFrame,
      topK: Int): DataFrame =
    codes.join(broadcast(adcTableDf(model, queries)))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adc", adcCol)
      .withColumn("rnk", row_number().over(adcWindow))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("vec_id"),
        round(col("adc"), 6).as("adc"))
      .orderBy("q_id", "rnk")

  /** Materialize the index: the m-byte codes table (the thing a 100 TB
    * deployment scans) plus the codebooks — model state — as one small
    * parquet alongside, mirroring [[Ann.writeIvf]]'s layout contract. */
  def writePq(model: PqModel, codes: DataFrame, dir: String): Unit = {
    codes.write.mode("overwrite").parquet(s"$dir/codes")
    val spark = codes.sparkSession
    import spark.implicits._
    model.codebooks.zipWithIndex.flatMap { case (cb, mi) =>
      cb.zipWithIndex.map { case (cw, ki) => (mi, ki, cw.toSeq) }
    }.toSeq.toDF("msub", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
  }

  def loadPq(spark: org.apache.spark.sql.SparkSession, dir: String)
      : (PqModel, DataFrame) = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$dir/codebooks")
      .as[(Int, Int, Seq[Float])].collect()
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val cb = Array.ofDim[Array[Float]](m, k)
    rows.foreach { case (mi, ki, cw) => cb(mi)(ki) = cw.toArray }
    val model = PqModel(m, k, cb(0)(0).length, cb)
    (model, spark.read.parquet(s"$dir/codes"))
  }

  /** IVF+PQ — the composed production index (the FAISS IVFPQ
    * architecture): a coarse quantizer buckets the corpus into cells
    * (partition-pruned probes, Ann) and each vector is stored as its
    * m-byte PQ code. A search touches nprobe/k of the corpus AND reads
    * only codes while doing it; full-precision embeddings are fetched
    * solely for the exact re-rank of the shortlist. This is the shape
    * that holds at 100 TB: the per-query scan is
    * (nprobe/k)·n·m bytes — at n=10⁹, k=4096, nprobe=64, m=16 that is
    * ~250 MB of codes per query, partition-pruned to the probed cells'
    * files, vs 256 GB of raw embeddings for a flat scan. */
  final case class IvfPqIndex(
      assignments: DataFrame,             // (vec_id, cell_id, codes)
      centroids: Array[Array[Float]],     // coarse model state, k×dim
      model: PqModel)                     // fine model state

  /** Materialize the composed index in one layout: cell-partitioned
    * (vec_id, codes) assignments — a probe is a partition-pruned scan of
    * the probed cells' code files, the production 100 TB read path —
    * plus both model-state tables (coarse centroids, PQ codebooks) as
    * small parquet alongside. */
  def writeIvfPq(index: IvfPqIndex, dir: String): Unit = {
    index.assignments.write.mode("overwrite")
      .partitionBy("cell_id").parquet(s"$dir/assignments")
    val spark = index.assignments.sparkSession
    import spark.implicits._
    index.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    index.model.codebooks.zipWithIndex.flatMap { case (cb, mi) =>
      cb.zipWithIndex.map { case (cw, ki) => (mi, ki, cw.toSeq) }
    }.toSeq.toDF("msub", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
  }

  def loadIvfPq(spark: org.apache.spark.sql.SparkSession, dir: String)
      : IvfPqIndex = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell_id").select("centroid")
      .as[Seq[Float]].collect().map(_.toArray)
    val rows = spark.read.parquet(s"$dir/codebooks")
      .as[(Int, Int, Seq[Float])].collect()
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val cb = Array.ofDim[Array[Float]](m, k)
    rows.foreach { case (mi, ki, cw) => cb(mi)(ki) = cw.toArray }
    IvfPqIndex(spark.read.parquet(s"$dir/assignments"), centroids,
      PqModel(m, k, cb(0)(0).length, cb))
  }

  /** Incremental maintenance for the composed index: frozen coarse
    * centroids pick the cell, frozen codebooks encode the codes, and
    * the new (vec_id, cell_id, codes) rows append into the
    * cell-partitioned layout — probes keep pruning, existing files
    * untouched ([[Ann.appendToIvf]]'s contract; PqSpec pins
    * append ≡ assigned-at-build-time). */
  def appendToIvfPq(spark: org.apache.spark.sql.SparkSession, dir: String,
      newVectors: DataFrame): Unit = {
    val idx = loadIvfPq(spark, dir)
    // layout guard: appending IVF-shaped rows into an IVFPQ assignments
    // dir (or vice versa) would silently mix schemas — later searches
    // read null codes instead of failing here
    require(idx.assignments.columns.contains("codes"),
      s"$dir/assignments is not an IVF+PQ layout (no codes column) — " +
        "use appendToIvf")
    Ann.requireNoRotation(spark, dir)
    // cell assignment through Ann's gated path: same kernel-vs-join
    // switch AND same tie-break as build time, so append ≡
    // assigned-at-build-time holds at every k
    Ann.nearestCell(newVectors.select(col("vec_id"), col("embedding")),
      idx.centroids)
      .select(col("vec_id"), col("cell_id"),
        codesCol(idx.model).as("codes"))
      .write.mode("append").partitionBy("cell_id")
      .parquet(s"$dir/assignments")
  }

  def buildIvfPq(embeddings: DataFrame, kCells: Int, m: Int, k: Int,
      iters: Int): IvfPqIndex = {
    val ivf = Ann.buildIvf(embeddings, kCells, iters)
    val model = train(embeddings, m, k, iters)
    val assignments = ivf.assignments
      .select(col("vec_id"), col("cell_id"), codesCol(model).as("codes"))
    IvfPqIndex(assignments, ivf.centroids, model)
  }

  /** Probe the nprobe nearest cells, ADC-score ONLY their codes, exact
    * re-rank the shortlist against `corpus` (vec_id, embedding). */
  def searchIvfPq(index: IvfPqIndex, queries: DataFrame, corpus: DataFrame,
      topK: Int, nprobe: Int, shortlist: Int): DataFrame =
    rerank(searchIvfPqShortlist(index, queries, nprobe, shortlist),
      corpus, queries, topK)

  /** The probe + ADC stage alone: (q_id, vec_id) shortlist. Shared
    * with [[Opq.searchIvfPq]], whose re-rank runs in a different basis
    * than its probes. */
  private[operators] def searchIvfPqShortlist(index: IvfPqIndex,
      queries: DataFrame, nprobe: Int, shortlist: Int): DataFrame = {
    val probes = queries.select(col("q_id"),
      explode(graft.functions.QuantExpressions.nearestCells(col("qvec"),
        index.centroids.flatten, index.centroids.length,
        index.centroids.head.length, nprobe)).as("cell_id"))
    index.assignments
      .join(broadcast(probes), Seq("cell_id"))
      .join(broadcast(adcTableDf(index.model, queries)), Seq("q_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adc", adcCol)
      .withColumn("rnk", row_number().over(adcWindow))
      .filter(col("rnk") <= shortlist)
      .select(col("q_id"), col("vec_id"))
  }

  /** Exact re-rank of a (q_id, vec_id) shortlist: broadcast semi-join
    * fetch (the corpus never shuffles), codegen'd dot, windowed top-k. */
  private[operators] def rerank(short: DataFrame, corpus: DataFrame,
      queries: DataFrame, topK: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    corpus.select(col("vec_id"), col("embedding"))
      .join(broadcast(short), Seq("vec_id"))
      .join(broadcast(queries), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        graft.functions.Vectors.dot(col("embedding"), col("qvec")).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("vec_id"),
        round(col("cos"), 6).as("cos"))
      .orderBy("q_id", "rnk")
  }

  /** Production search shape: ADC prunes the corpus to a `shortlist` per
    * query (scanning only the m-byte codes), then ONLY the shortlisted
    * vectors' full embeddings are fetched and re-ranked with the exact
    * codegen'd dot product. At 100 TB this is the whole point of PQ: the
    * full-precision corpus is touched for shortlist×queries rows — a
    * point-lookup-sized fetch join — while the scan runs over 8-byte
    * codes. Recall is set by the shortlist depth, not by quantization
    * error (PqSpec measures both stages). */
  def searchRerank(codes: DataFrame, model: PqModel, corpus: DataFrame,
      queries: DataFrame, topK: Int, shortlist: Int): DataFrame =
    rerank(search(codes, model, queries, shortlist)
      .select(col("q_id"), col("vec_id")), corpus, queries, topK)
}
