package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Streaming MinHash/LSH near-duplicate filter — the batch LSH stage
  * (q_minhash_neardup) as a continuous foreachBatch operator.
  *
  * Why not a keyed stateful operator: a document survives iff NONE of its
  * `bands` LSH buckets is already claimed — a cross-key decision (8 bucket
  * keys vote on one doc), which per-key `transformWithState` /
  * `dropDuplicatesWithinWatermark` cannot express. The industry-standard
  * shape is an external bucket REGISTRY; here it is a parquet claim table
  * the micro-batch joins against:
  *
  *  per epoch (all distributed joins, nothing collected):
  *   1. signature + band hashes for incoming docs (map-only);
  *   2. cross-batch collisions: bands ⋈ registry claims newer than the
  *      horizon (event-time watermark analogue) — matching docs drop;
  *   3. in-batch collisions: earliest doc_id per bucket wins (self-join);
  *   4. SURVIVORS' bands appended to the registry under `epoch=N`
  *      (mode=overwrite ⇒ an epoch REPLAY after a crash rewrites its own
  *      claims deterministically — same exactly-once staging idea as
  *      RangeSink); dropped docs claim nothing, matching the batch
  *      keep-first semantics.
  *
  * State is bounded two ways: READS filter claims to `ts ≥ horizon`
  * (horizon = max event time seen − watermark, tracked monotonically in a
  * one-line file next to the registry), and [[compact]] rewrites the
  * registry dropping sub-horizon claims — run it on whatever cadence disk
  * growth warrants, like any parquet-table maintenance job. Duplicate
  * claims after a crash/compact race are harmless: claims form a SET and
  * collision-checking is existence, not counting.
  */
final case class NearDupStage(
    registryDir: String,
    watermarkMs: Long,
    nPerm: Int = 32,
    bands: Int = 8) {

  private val rows = nPerm / bands
  require(rows * bands == nPerm, s"bands must divide nPerm: $nPerm/$bands")

  private def bandHashes = expr(
    s"""transform(sequence(0, ${bands - 1}),
       |  b -> xxhash64(slice(sig, int(b) * $rows + 1, $rows)))""".stripMargin)

  private def registryPath(epochId: Long) = s"$registryDir/epoch=$epochId"
  private def horizonFile = new Path(s"$registryDir/_horizon")

  private def readHorizon(fs: org.apache.hadoop.fs.FileSystem): Long =
    if (!fs.exists(horizonFile)) Long.MinValue
    else {
      val in = fs.open(horizonFile)
      try new String(in.readAllBytes()).trim.toLong finally in.close()
    }

  private def writeHorizon(fs: org.apache.hadoop.fs.FileSystem, h: Long): Unit = {
    val out = fs.create(horizonFile, true)
    try out.write(h.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Near-dup survivors of one micro-batch (needs doc_id, ts, text;
    * passes all columns through). */
  def process(batch: DataFrame, epochId: Long): DataFrame = {
    val spark = batch.sparkSession
    val fs = new Path(registryDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // monotone horizon: max event time ever seen − watermark (the
    // streaming watermark analogue, kept outside the engine because the
    // stage runs inside foreachBatch)
    val batchMax = batch.agg(max(col("ts").cast("long") * 1000L)).head()
    val horizon0 = readHorizon(fs)
    val horizon =
      if (batchMax.isNullAt(0)) horizon0
      else math.max(horizon0, batchMax.getLong(0) - watermarkMs)

    val bandsDf = batch
      .select(col("doc_id"), col("ts"),
        TextFunctions.minhashSig(
          TextFunctions.shingles3(col("text")), nPerm).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), col("ts"), posexplode(bandHashes))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
      .localCheckpoint() // signatures once; reused by 3 consumers below

    // prior-epoch claims only: the CURRENT epoch's dir may exist from a
    // crashed attempt of this very batch — reading it would make every
    // doc collide with itself on replay
    val priorEpochs =
      if (!fs.exists(new Path(registryDir))) Seq.empty
      else fs.listStatus(new Path(registryDir)).toSeq
        .map(_.getPath.getName).filter(_.startsWith("epoch="))
        .map(_.stripPrefix("epoch=").toLong).filter(_ < epochId)
        .map(e => registryPath(e))
    val crossBatch =
      if (priorEpochs.isEmpty) spark.emptyDataFrame.select(
        lit(0L).as("doc_id")).limit(0)
      else bandsDf.join(
          spark.read.parquet(priorEpochs: _*)
            .filter(col("ts").cast("long") * 1000L >= horizon)
            .select(col("band"), col("band_hash")),
          Seq("band", "band_hash"))
        .select("doc_id")

    // in-batch: earliest doc_id claims the bucket, later ones drop
    val inBatch = bandsDf.as("a")
      .join(bandsDf.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") > col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id"))

    val dropped = crossBatch.union(inBatch).distinct()
    val survivors = batch.join(dropped, Seq("doc_id"), "left_anti")

    // survivors claim their buckets, epoch-idempotently
    bandsDf.join(dropped, Seq("doc_id"), "left_anti")
      .select(col("band"), col("band_hash"), col("ts"))
      .write.mode("overwrite").parquet(registryPath(epochId))
    writeHorizon(fs, horizon)
    survivors
  }

  /** Registry maintenance: rewrite claims, dropping everything below the
    * current horizon. Safe to run between batches; replayed epochs
    * re-create their dirs deterministically, and re-surfacing an
    * already-compacted claim only re-drops what was already a dup. */
  def compact(spark: org.apache.spark.sql.SparkSession): Unit = {
    val fs = new Path(registryDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(registryDir))) return
    val horizon = readHorizon(fs)
    val epochs = fs.listStatus(new Path(registryDir)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("epoch="))
      .map(_.stripPrefix("epoch=").toLong)
    if (epochs.isEmpty) return
    val live = spark.read
      .parquet(epochs.map(registryPath): _*)
      .filter(col("ts").cast("long") * 1000L >= horizon)
    // compacted claims land under epoch=-1: below every real Spark epoch,
    // so prior-epoch reads always include them and no replayed epoch's
    // mode=overwrite can ever wipe them
    val tmp = s"$registryDir/.compact-tmp"
    live.write.mode("overwrite").parquet(tmp)
    epochs.foreach(e => fs.delete(new Path(registryPath(e)), true))
    fs.rename(new Path(tmp), new Path(registryPath(-1L)))
  }
}
