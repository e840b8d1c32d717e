package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.TableLog
import graft.operators.Upsert

/** Continuous EXACTLY-ONCE maintenance of a landed SCD1 DIMENSION
  * table — the keyed-MERGE sibling of [[RollupPipeline]] (which
  * maintains an aggregate rollup): micro-batches of change rows flow
  * through [[Upsert.mergeShared]] (copy-on-write at file granularity,
  * untouched files carried by reference), land via
  * [[TableLog.commit]] (the delta-record rename is the atomic point),
  * and the commit's action records the batch id (`upsert-batch-<id>`).
  *
  * Unlike the rollup increment, an SCD1 merge is REPLAY-IDEMPOTENT
  * (UpsertSpec pins that re-applying a change set reproduces the
  * table bit-for-bit), so the batch-id guard here prevents wasted
  * maintenance passes and spurious versions on recovery replays
  * rather than wrong answers — but expectedHead still matters for
  * CORRECTNESS: it pins each commit to the head the merge read, so a
  * concurrent maintenance writer (optimize, manual upsert) turns into
  * a detected conflict instead of a lost update; the failed batch
  * then replays against the new head.
  *
  * Batch contract: a micro-batch may carry several change rows per
  * key only when `versionCol` names a winner ([[Upsert.resolve]]
  * fails loudly otherwise); tombstone deletes ride `tombstoneCol`.
  * Last-writer-wins ACROSS batches is commit order — give the
  * version column a monotone event version when replays must also be
  * order-stable. An add-column evolved feed widens the table
  * (mergeShared's r16 contract); the stream's schema is fixed at
  * start, so evolution happens between restarts. */
object UpsertPipeline {

  private[streaming] def batchAction(batchId: Long): String =
    s"upsert-batch-$batchId"

  /** Apply one micro-batch exactly once. Factored from [[start]] so
    * the spec can drive crash points directly; `crashBeforeCommit`
    * simulates dying after the merge staged its output but before
    * the record rename. */
  private[streaming] def applyBatch(spark: SparkSession,
      batch: DataFrame, tableDir: String, keys: Seq[String],
      versionCol: Option[String], tombstoneCol: Option[String],
      batchId: Long, crashBeforeCommit: Boolean = false): Boolean = {
    // actions-only probe — one line per retained record, never a
    // file list (the RollupPipeline r16 discipline)
    val done = TableLog.actions(spark, tableDir)
      .exists(_._2 == batchAction(batchId))
    if (done || batch.isEmpty) return false
    val head = TableLog.head(spark, tableDir).getOrElse(
      sys.error(s"$tableDir has no log — init the dimension table first"))
    val staging = s"$tableDir/_staging-upsert-$batchId-${
      java.util.UUID.randomUUID()}"
    batch.write.parquet(s"$staging/changes")
    // the merge reads the CURRENT snapshot's files via the manifest;
    // untouched files CARRY into the next record by reference — a
    // quiet dimension file is written once and shared by every
    // subsequent snapshot until a batch touches one of its keys
    // the log's per-file key stats bound the probe to the files this
    // batch's keys can live in (r18) — a narrow streamed batch on a
    // wide clustered dimension probes a handful of files, not the
    // key column of every snapshot file
    val probe = TableLog.statsCandidates(spark, tableDir, keys.head,
      batch.select(keys.head))
    val (_, untouched) = Upsert.mergeShared(spark,
      TableLog.snapshotFiles(spark, tableDir), s"$staging/changes",
      s"$staging/out", keys, versionCol, tombstoneCol,
      probeFiles = Some(probe))
    if (crashBeforeCommit) sys.error("injected crash before commit")
    TableLog.commit(spark, tableDir, s"$staging/out",
      action = batchAction(batchId), expectedHead = Some(head),
      carry = untouched)
    // keep any Bloom sidecars on the table FRESH behind the commit:
    // the incremental refresh re-aggregates only this batch's new
    // files (no-op without indexes; a crash here leaves the sidecar
    // trailing, which r17 lookups tolerate losslessly)
    graft.ingest.FileSkipIndex.refreshAll(spark, tableDir)
    // commit moved the data files out; drop the staging shell (a
    // CRASHED batch's staging is left behind deliberately —
    // replayable evidence, swept by TableLog.expire once it ages past
    // the in-flight window)
    val p = new org.apache.hadoop.fs.Path(staging)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    true
  }

  def start(changes: DataFrame, tableDir: String, checkpoint: String,
      keys: Seq[String], versionCol: Option[String] = None,
      tombstoneCol: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, batch, tableDir, keys,
          versionCol, tombstoneCol, batchId)
        ()
      }
      .start()
}
