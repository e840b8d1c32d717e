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
    bands: Int = 8,
    compactEvery: Int = 64) {

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
    // doc collide with itself on replay. One partition-discovery read of
    // the registry ROOT (epoch=N is a partition column; `_horizon` and
    // `.compact-tmp` are ignored by discovery) with `epoch < current` as
    // a planning-time partition-pruning predicate — NOT an explicit path
    // list, which would grow per batch and make the per-batch listing
    // O(epochs) after a day of 1-second triggers
    val registryExists = fs.exists(new Path(registryDir)) &&
      fs.listStatus(new Path(registryDir))
        .exists(_.getPath.getName.startsWith("epoch="))
    val crossBatch =
      if (!registryExists) spark.emptyDataFrame.select(
        lit(0L).as("doc_id")).limit(0)
      else bandsDf.join(
          spark.read.parquet(registryDir)
            .filter(col("epoch") < epochId &&
              col("ts").cast("long") * 1000L >= horizon)
            .select(col("band"), col("band_hash")),
          Seq("band", "band_hash"))
        .select("doc_id")

    // in-batch: earliest doc_id claims the bucket, later ones drop.
    // Docs already dropped by a cross-batch registry collision claim
    // nothing, so they must not suppress other in-batch docs either —
    // anti-join them out BEFORE the self-join. Within the batch itself
    // collisions remain transitive/cluster-style (A<B<C with A–B and
    // B–C sharing buckets drops both B and C), matching the batch
    // q_minhash_neardup operator's min-per-bucket semantics.
    val freshBands = bandsDf.join(crossBatch.distinct(), Seq("doc_id"), "left_anti")
    val inBatch = freshBands.as("a")
      .join(freshBands.as("b"),
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
    // embedded maintenance: every compactEvery epochs, fold the epoch
    // dirs into one and drop expired claims — bounds both the listing
    // and disk growth without an external job. The returned survivors
    // are LAZY and their plan reads the registry files compaction is
    // about to delete — pin them first or the caller's sink write
    // evaluates against vanished inputs.
    if (compactEvery > 0 && epochId > 0 && epochId % compactEvery == 0) {
      val pinned = survivors.localCheckpoint()
      compact(spark)
      pinned
    } else survivors
  }

  /** Registry maintenance: fold every epoch dir EXCEPT the newest into
    * a fresh negative base epoch, dropping sub-horizon claims. The
    * newest epoch is left alone because it is the only one a crash can
    * replay (micro-batch N+1 starts only after N's commit): folding its
    * claims into the base and then replaying it would make the whole
    * batch collide with itself. Negative epochs sort below every real
    * Spark epoch, so prior-epoch reads always include the base and no
    * replayed epoch's mode=overwrite can wipe it.
    *
    * Crash safety: the compacted data is PROMOTED (renamed into a
    * visible epoch dir, rename checked) before any folded source epoch
    * is deleted. A crash between the promote and the deletes leaves the
    * same claims present twice — harmless, claims form a set — and the
    * next compaction folds the leftovers. Each compaction picks a base
    * epoch strictly below every existing one (first -1, then -2, …) so
    * the promote never has to overwrite the previous base in place. */
  def compact(spark: org.apache.spark.sql.SparkSession): Unit = {
    val fs = new Path(registryDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(registryDir))) return
    val horizon = readHorizon(fs)
    val epochs = fs.listStatus(new Path(registryDir)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("epoch="))
      .map(_.stripPrefix("epoch=").toLong)
    if (epochs.size < 2) return // nothing foldable below the newest
    val newest = epochs.max
    val base = math.min(epochs.min, 0L) - 1L
    val live = spark.read.parquet(registryDir)
      .filter(col("epoch") < newest &&
        col("ts").cast("long") * 1000L >= horizon)
      .select(col("band"), col("band_hash"), col("ts"))
    val tmp = s"$registryDir/.compact-tmp"
    live.write.mode("overwrite").parquet(tmp)
    // promote first, delete second: claims may never transit through a
    // state where only the dot-prefixed (discovery-invisible) tmp dir
    // holds them
    if (!fs.rename(new Path(tmp), new Path(registryPath(base))) ||
        !fs.exists(new Path(registryPath(base))))
      throw new java.io.IOException(
        s"compact: failed to promote $tmp to ${registryPath(base)}")
    epochs.filter(_ < newest)
      .foreach(e => fs.delete(new Path(registryPath(e)), true))
    // the shared FileStatusCache still lists the deleted epoch dirs —
    // without this, the next batch's registry read hits FILE_NOT_EXIST
    spark.catalog.refreshByPath(registryDir)
  }
}
