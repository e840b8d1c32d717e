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
  *   3. in-batch collisions: earliest doc_id per bucket wins
  *      (partial-aggregated groupBy-min + join-back);
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
    compactEvery: Int = 64,
    claimShards: Int = 0) {

  // banding math (validation included) shared with the batch family —
  // graft.operators.Lsh is the one place the slice indexing lives
  private def bandHashes = graft.operators.Lsh.bandHashesExpr(nPerm, bands)
  bandHashes // validate (nPerm, bands) at construction, not first batch

  private def registryPath(epochId: Long) = s"$registryDir/epoch=$epochId"

  // dev knob: -Dgraft.neardup.profile=true (or the env var) prints
  // per-phase wall times
  private val profile = java.lang.Boolean.getBoolean("graft.neardup.profile") ||
    sys.env.get("GRAFT_NEARDUP_PROFILE").exists(_.nonEmpty)
  private def timed[T](name: String, epochId: Long)(body: => T): T =
    if (!profile) body
    else {
      val t0 = System.nanoTime()
      val r = body
      println(f"[neardup] epoch=$epochId $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

  /** Near-dup survivors of one micro-batch (needs doc_id, ts, text;
    * passes all columns through). */
  def process(batch: DataFrame, epochId: Long): DataFrame = {
    val (survivors, writeClaims, finish) = plan(batch, epochId)
    writeClaims()
    finish()
    survivors
  }

  /** [[process]] with the caller's sink write OVERLAPPED with the claim
    * write: the two are independent Spark jobs over the pinned dropped
    * set, so running them concurrently hides the shorter one entirely —
    * micro-batch pipelining without weakening exactly-once (both must
    * complete before this returns, i.e. before the engine commits the
    * epoch; a failure of either fails the batch and the replay rewrites
    * both idempotently). */
  def processWith(batch: DataFrame, epochId: Long)
                 (sink: DataFrame => Unit): Unit = {
    val (survivors, writeClaims, finish) = plan(batch, epochId)
    import scala.concurrent.{Await, Future, TimeoutException}
    import scala.concurrent.duration._
    // dedicated daemon pool, NOT ExecutionContext.global: several
    // concurrent streaming queries in one JVM would otherwise tie up the
    // small shared pool with blocking parquet writes
    implicit val ec: scala.concurrent.ExecutionContext = NearDupStage.claimEc
    // the claim write runs under its own job group so a stream stop /
    // task interrupt can CANCEL it — it runs on a thread outside the
    // engine's job group, so query.stop() alone would leave it writing
    // registryPath(epochId) while the restarted stream's replay
    // overwrites the same directory
    val spark = batch.sparkSession
    val groupId = s"graft-neardup-claims-$epochId"
    val claims = Future {
      spark.sparkContext.setJobGroup(groupId,
        s"near-dup claim write epoch=$epochId", interruptOnCancel = true)
      try writeClaims() finally spark.sparkContext.clearJobGroup()
    }
    def awaitClaims(primary: Option[Throwable]): Unit = {
      // a sink killed by interrupt means the whole batch is being torn
      // down — cancel the claim job rather than letting it finish
      if (primary.exists(_.isInstanceOf[InterruptedException]))
        spark.sparkContext.cancelJobGroup(groupId)
      // bounded, not Inf: a claim job stalled after a sink failure (e.g.
      // a hung store) must not wedge the epoch forever — cancel its job
      // group on expiry and surface the timeout
      try Await.result(claims, NearDupStage.claimTimeout) catch {
        case ie: InterruptedException =>
          // the foreachBatch thread is being killed: cancel the claim
          // job and wait for it to actually stop before letting the
          // engine proceed to a replay
          spark.sparkContext.cancelJobGroup(groupId)
          try Await.ready(claims, Duration.Inf) catch { case _: Throwable => () }
          throw ie
        case te: TimeoutException =>
          spark.sparkContext.cancelJobGroup(groupId)
          try Await.ready(claims, 30.seconds) catch { case _: Throwable => () }
          if (primary.isEmpty) throw te
        case e: Throwable if primary.isEmpty => throw e
        case _: Throwable => // the sink failure is the primary error
      }
    }
    // if the sink fails, STILL await the in-flight claim job before
    // propagating: a streaming retry re-runs this epoch, and its
    // mode=overwrite claim write must not race a dangling first attempt
    val sinkErr = try { sink(survivors); None } catch {
      case e: Throwable => Some(e)
    }
    awaitClaims(sinkErr)
    sinkErr.foreach(throw _)
    finish()
  }

  /** Builds the per-epoch plan: (lazy survivors, claim-write action,
    * horizon/compaction finalizer). Callers run the actions; [[process]]
    * sequences them, [[processWith]] overlaps the claim write with the
    * caller's sink. */
  private def plan(batch: DataFrame, epochId: Long)
      : (DataFrame, () => Unit, () => Unit) = {
    val spark = batch.sparkSession
    val fs = new Path(registryDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    val bandsRaw = batch
      .select(col("doc_id"), col("ts"),
        TextFunctions.minhashSig3(col("text"), nPerm).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), col("ts"), posexplode(bandHashes))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
    val bandsDf = timed("signature", epochId) {
      bandsRaw.localCheckpoint() // signatures once; reused by 3 consumers below
    }

    // monotone horizon: max event time ever seen − watermark (the
    // streaming watermark analogue, kept outside the engine because the
    // stage runs inside foreachBatch). Aggregated over the CHECKPOINTED
    // bands (an in-memory scan) rather than a second pass over the source
    // batch; null-text docs carry no claims, so their timestamps don't
    // advance the horizon — the registry only ever needs to cover docs
    // that can collide.
    val batchMax = timed("horizon", epochId) {
      bandsDf.agg(max(col("ts").cast("long") * 1000L)).head()
    }
    val horizon0 = ClaimRegistry.readHorizon(fs, registryDir)
    val horizon =
      if (batchMax.isNullAt(0)) horizon0
      else math.max(horizon0, batchMax.getLong(0) - watermarkMs)

    // prior-epoch claims only: the CURRENT epoch's dir may exist from a
    // crashed attempt of this very batch — reading it would make every
    // doc collide with itself on replay. One partition-discovery read of
    // the registry ROOT (epoch=N is a partition column; `_horizon` and
    // `.compact-tmp` are ignored by discovery) with `epoch < current` as
    // a planning-time partition-pruning predicate — NOT an explicit path
    // list, which would grow per batch and make the per-batch listing
    // O(epochs) after a day of 1-second triggers
    val registryExists = ClaimRegistry.exists(fs, registryDir)
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
    // anti-join them out BEFORE the bucket grouping. Within the batch
    // itself collisions remain transitive/cluster-style (A<B<C with A–B
    // and B–C sharing buckets drops both B and C), matching the batch
    // q_minhash_neardup operator's min-per-bucket semantics.
    //
    // "Shares a bucket with a smaller doc_id" ⟺ "bucket min < doc_id",
    // so a window min per (band, band_hash) replaces the self-join this
    // stage used to run: one shuffle, output linear in the band rows —
    // where the join materialized O(k²) rows per k-doc bucket, exactly
    // the hot-bucket blowup a duplicate storm (the workload this stage
    // exists for) feeds.
    // ts projected out before the bucket shuffle — the winner decision
    // needs only (doc_id, band, band_hash); claims re-read ts from the
    // checkpoint. groupBy-min + join-back rather than a window: the
    // partial (map-side) aggregate shrinks the shuffle to distinct
    // buckets and skips the window's per-partition sort, and AQE
    // broadcasts the winner table back when it's small (falling back to
    // a shuffled join when a huge trigger makes it big).
    val freshBands = bandsDf.select("doc_id", "band", "band_hash")
      .join(crossBatch, Seq("doc_id"), "left_anti")
    val winners = freshBands
      .groupBy("band", "band_hash").agg(min(col("doc_id")).as("winner"))
    val inBatch = freshBands
      .join(winners, Seq("band", "band_hash"))
      .filter(col("doc_id") > col("winner"))
      .select(col("doc_id"))

    // the dropped doc_id set is tiny relative to the batch and has THREE
    // consumers below (survivor filter, claim anti-join, caller's sink
    // write); pin it once so the registry join + bucket window don't
    // re-evaluate per consumer
    val dropped = timed("collide", epochId) {
      crossBatch.union(inBatch).distinct().localCheckpoint()
    }
    val survivors = batch.join(dropped, Seq("doc_id"), "left_anti")

    // survivors claim their buckets, epoch-idempotently. claimShards > 0
    // caps the files per epoch via a (claim-sized, tiny) repartition
    // shuffle — NOT coalesce, which would propagate upstream and collapse
    // the anti-join stage itself to claimShards tasks. Off by default:
    // compaction already bounds the registry's file count over a long
    // stream, and the extra stage costs more than small files do until
    // trigger volumes get large.
    val writeClaims = () => timed("claim", epochId) {
      val claims = bandsDf.join(dropped, Seq("doc_id"), "left_anti")
        .select(col("band"), col("band_hash"), col("ts"))
      (if (claimShards > 0) claims.repartition(claimShards) else claims)
        .write.mode("overwrite").parquet(registryPath(epochId))
    }
    // embedded maintenance: every compactEvery epochs, fold the epoch
    // dirs into one and drop expired claims — bounds both the listing
    // and disk growth without an external job. The returned survivors
    // are lazy but safe across it: their plan filters `batch` against
    // the CHECKPOINTED dropped set, so nothing downstream reads the
    // registry files compaction deletes.
    val finish = () => {
      ClaimRegistry.writeHorizon(fs, registryDir, horizon)
      if (compactEvery > 0 && epochId > 0 && epochId % compactEvery == 0)
        compact(spark)
    }
    (survivors, writeClaims, finish)
  }

  /** Registry maintenance — fold-and-expire, delegated to the shared
    * [[ClaimRegistry.compact]] (promote-before-delete, newest epoch left
    * unfolded for replay safety; full rationale on that method). */
  def compact(spark: org.apache.spark.sql.SparkSession): Unit =
    ClaimRegistry.compact(spark, registryDir,
      keep = Seq("band", "band_hash", "ts"))
}

object NearDupStage {
  /** How long [[NearDupStage.processWith]] waits for an overlapped claim
    * write before cancelling its job group — generous (a claim write is a
    * small parquet job), but finite so a hung store can't wedge the epoch
    * forever. Override with -Dgraft.neardup.claimTimeoutSec. */
  private[streaming] val claimTimeout: scala.concurrent.duration.Duration =
    scala.concurrent.duration.Duration(
      java.lang.Long.getLong("graft.neardup.claimTimeoutSec", 600L),
      java.util.concurrent.TimeUnit.SECONDS)

  /** Dedicated daemon pool for overlapped claim writes: one blocking
    * write per active streaming query, so a cached pool stays at the
    * number of concurrent queries and idle threads die off. */
  private[streaming] lazy val claimEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-neardup-claim")
        t.setDaemon(true)
        t
      }))
}
