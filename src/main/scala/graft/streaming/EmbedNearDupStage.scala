package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{QuantExpressions, Vectors}

/** Streaming EMBEDDING-SPACE near-duplicate filter — batch SemDeDup
  * ([[graft.operators.SemDedup]]) as a continuous foreachBatch operator,
  * under the same claim-registry/watermark contract as the MinHash
  * [[NearDupStage]] (whose scaladoc carries the full rationale for the
  * registry shape, epoch-overwrite idempotence and horizon tracking).
  *
  * The bucket key is the IVF CELL of the document's embedding (the
  * coarse quantizer is model state trained offline — `CliMain index
  * --kind ivf` / [[graft.operators.Ann.buildIvf]] on a sample — and
  * broadcast inside the codegen'd NearestCells kernel), multi-probed
  * exactly as in SemDedup so cluster-boundary pairs still collide. A
  * cell claim alone is NOT a drop: unlike MinHash bands, where a shared
  * bucket IS the near-dup signal, a shared cell only makes a pair a
  * CANDIDATE — every candidate is verified with the exact codegen'd
  * cosine against the claimed embedding before the doc drops, so
  * precision is 1.0 by construction and the recall dials are the ones
  * SemDedup already measures (cells per corpus, probes).
  *
  *  per epoch (all distributed joins, nothing collected):
  *   1. probe-cell assignment for incoming docs (map-only kernel);
  *   2. cross-batch: cells ⋈ registry claims (epoch < N, ts ≥ horizon)
  *      on cell_id, exact-cosine verify ≥ tau — matching docs drop;
  *   3. in-batch: cell self-join among the remaining docs, verify, the
  *      greedy-by-id rule (a doc drops iff a lower-id verified neighbor
  *      exists — SemDedup's keep/drop decision);
  *   4. survivors claim (cell_id, doc_id, embedding, ts) under epoch=N
  *      with mode=overwrite (replay-idempotent).
  *
  * Registry volume: one row per survivor per probe carrying the
  * embedding (the verify needs it) — dim·4 bytes/row instead of the
  * band stage's 8. The same horizon reads + [[compact]] bound it; the
  * cross-batch join hash-shuffles both sides on cell_id (cell sizes are
  * capped by the coarse model's k scaling with corpus size, SemDedup's
  * contract, so no cell's claims outgrow a shuffle partition).
  */
final case class EmbedNearDupStage(
    registryDir: String,
    watermarkMs: Long,
    centroids: Array[Array[Float]],
    tau: Double,
    probes: Int = 2,
    compactEvery: Int = 64) {

  require(centroids.nonEmpty, "embed near-dup needs a trained coarse model")

  private def probeCells = QuantExpressions.nearestCells(col("embedding"),
    centroids.flatten, centroids.length, centroids.head.length, probes)

  /** Near-dup survivors of one micro-batch (needs doc_id, ts, embedding;
    * passes all columns through). */
  def process(batch: DataFrame, epochId: Long): DataFrame = {
    val spark = batch.sparkSession
    val fs = new Path(registryDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // probe assignment once; reused by collide + claim below
    val cellsDf = batch
      .select(col("doc_id"), col("ts"), col("embedding"),
        explode(probeCells).as("cell_id"))
      .localCheckpoint()

    // monotone horizon — the NearDupStage watermark contract verbatim
    val batchMax = cellsDf.agg(max(col("ts").cast("long") * 1000L)).head()
    val horizon0 = ClaimRegistry.readHorizon(fs, registryDir)
    val horizon =
      if (batchMax.isNullAt(0)) horizon0
      else math.max(horizon0, batchMax.getLong(0) - watermarkMs)

    // cross-batch: claims are CANDIDATES, the exact dot is the decision.
    // SHUFFLE_HASH pinned — both sides carry embedding arrays, and AQE's
    // compressed-size estimate mis-promotes array frames to broadcast
    // (the SetSimJoin lesson)
    val crossBatch =
      if (!ClaimRegistry.exists(fs, registryDir))
        cellsDf.select(col("doc_id")).limit(0)
      else cellsDf
        .hint("shuffle_hash")
        .join(spark.read.parquet(registryDir)
            .filter(col("epoch") < epochId &&
              col("ts").cast("long") * 1000L >= horizon)
            .select(col("cell_id"), col("embedding").as("remb")),
          Seq("cell_id"))
        .filter(Vectors.dot(col("embedding"), col("remb")) >= tau)
        .select("doc_id")

    // in-batch: SemDedup's greedy-by-id over verified cell pairs, among
    // docs the registry didn't already drop (cross-dropped docs claim
    // nothing, so they must not suppress in-batch docs either)
    val fresh = cellsDf.select("doc_id", "cell_id", "embedding")
      .join(crossBatch, Seq("doc_id"), "left_anti")
    val inBatch = fresh
      .select(col("cell_id"), col("doc_id").as("id_a"),
        col("embedding").as("va"))
      .hint("shuffle_hash")
      .join(fresh.select(col("cell_id"), col("doc_id").as("id_b"),
        col("embedding").as("vb")), Seq("cell_id"))
      .filter(col("id_a") < col("id_b") &&
        Vectors.dot(col("va"), col("vb")) >= tau)
      .select(col("id_b").as("doc_id"))

    // pinned once — three consumers (survivor filter, claim anti-join,
    // the caller's sink)
    val dropped = crossBatch.union(inBatch).distinct().localCheckpoint()
    val survivors = batch.join(dropped, Seq("doc_id"), "left_anti")

    cellsDf.join(dropped, Seq("doc_id"), "left_anti")
      .select(col("cell_id"), col("doc_id"), col("embedding"), col("ts"))
      .write.mode("overwrite").parquet(s"$registryDir/epoch=$epochId")
    ClaimRegistry.writeHorizon(fs, registryDir, horizon)
    if (compactEvery > 0 && epochId > 0 && epochId % compactEvery == 0)
      compact(spark)
    survivors
  }

  /** Registry maintenance — shared fold-and-expire
    * ([[ClaimRegistry.compact]]). */
  def compact(spark: org.apache.spark.sql.SparkSession): Unit =
    ClaimRegistry.compact(spark, registryDir,
      keep = Seq("cell_id", "doc_id", "embedding", "ts"))
}
