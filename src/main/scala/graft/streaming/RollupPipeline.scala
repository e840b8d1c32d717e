package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.TableLog
import graft.operators.{IncrementalAgg, Skew}

/** Continuous EXACTLY-ONCE maintenance of a landed rollup table — the
  * lakehouse loop's streaming tier, tying three pieces together:
  * micro-batches flow through [[IncrementalAgg.increment]] (merge cost
  * tracks touched files), land via [[TableLog.commit]] (the manifest
  * rename is the atomic point), and the commit's ACTION RECORDS THE
  * BATCH ID — which is what makes replay safe.
  *
  * The double-count problem: aggregate increments are not idempotent
  * (applying a batch twice adds it twice), and Structured Streaming
  * re-runs the last uncommitted batch after a crash — the classic
  * failure is a rollup that silently inflates on every recovery. The
  * fix is the transactional-sink pattern (Delta's txn appId/version):
  * each commit's action string is `rollup-batch-<id>`; on entry the
  * batch checks the table's RETAINED HISTORY for its own id and
  * SKIPS if present. The check and the publish are the same
  * manifest sequence (TableLog's rename protocol), so a batch lands
  * exactly once no matter how often the engine replays it — pinned in
  * RollupPipelineSpec by replaying a batch through a fresh query with
  * the same checkpoint AND by crashing between increment and commit.
  *
  * expectedHead pins each commit to the head the increment read —
  * a concurrent maintenance writer (optimize, manual upsert) turns
  * into a detected conflict instead of a lost update; the batch then
  * fails and replays against the new head, which the batch-id guard
  * makes safe. History must retain the replayable window — enforced
  * by TableLog.expire itself since r16: it refuses to drop the most
  * recent `*-batch-*` record unless told the pipeline is quiesced. */
object RollupPipeline {

  private[streaming] def batchAction(batchId: Long): String =
    s"rollup-batch-$batchId"

  /** Apply one micro-batch exactly once. Factored from [[start]] so
    * the spec can drive crash points directly; `crashBeforeCommit`
    * simulates dying after the increment staged its output but before
    * the manifest rename. */
  private[streaming] def applyBatch(spark: SparkSession, batch: DataFrame,
      tableDir: String, keys: Seq[String],
      aggs: Seq[(String, Skew.ReAgg)], batchId: Long,
      crashBeforeCommit: Boolean = false): Boolean = {
    // actions-only probe: one line per retained record, never a file
    // list — at millions of table files the old history() probe read
    // O(window × table) manifest metadata per micro-batch
    val done = TableLog.actions(spark, tableDir)
      .exists(_._2 == batchAction(batchId))
    if (done || batch.isEmpty) return false
    val head = TableLog.head(spark, tableDir).getOrElse(
      sys.error(s"$tableDir has no log — init the rollup table first"))
    val staging = s"$tableDir/_staging-batch-$batchId-${
      java.util.UUID.randomUUID()}"
    val deltaDir = s"$staging/delta"
    batch.write.parquet(deltaDir)
    // increment reads the CURRENT snapshot's files via the manifest —
    // not the directory, which also holds older versions' files — and
    // the untouched files CARRY into the next manifest by reference
    // (zero-copy: a quiet key's file is written once and shared by
    // every subsequent snapshot until a batch touches it)
    val (_, untouched) = IncrementalAgg.incrementShared(spark,
      TableLog.snapshotFiles(spark, tableDir), deltaDir,
      s"$staging/out", keys, aggs)
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
    // CRASHED batch's staging is left behind deliberately — replayable
    // evidence, swept by TableLog.expire like other unreferenced debris)
    val p = new org.apache.hadoop.fs.Path(staging)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    true
  }

  def start(events: DataFrame, tableDir: String, checkpoint: String,
      keys: Seq[String], aggs: Seq[(String, Skew.ReAgg)],
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, batch, tableDir, keys, aggs,
          batchId)
        ()
      }
      .start()
}
