package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.TableLog
import graft.operators.Upsert

/** Continuous EXACTLY-ONCE maintenance of a landed SCD2 DIMENSION
  * table — completing the streaming-maintenance matrix
  * ([[RollupPipeline]] = aggregate rollups, [[UpsertPipeline]] = SCD1
  * current-state, this = Type-2 history): micro-batches of RAW EVENTS
  * flow through [[Upsert.mergeScd2Shared]] (closes each affected
  * key's open version at the batch's first new timestamp, appends the
  * batch's chained versions; closed-history files never rewrite) and
  * land via [[TableLog.commit]] as `scd2-batch-<id>` actions.
  *
  * The batch-id guard matters MORE here than for SCD1: the Type-2
  * merge is append-only in event time and FAILS LOUDLY on a replayed
  * batch (re-applying it would reach into landed history — mergeScd2's
  * order-final contract), so without the guard an engine replay after
  * a post-commit crash would wedge the stream on a permanent error.
  * With it, the replayed batch finds its id in the retained actions
  * and no-ops — the loud guard stays for genuine history rewrites.
  *
  * Batch contract (the [[graft.streaming.Scd2Stats]] order-final
  * discipline, enforced by the merge): every change row's timestamp
  * must be strictly after the landed open version's `valid_from` for
  * its key — feed the stream in event-time order (a watermarked,
  * ordered source; batch boundaries are free, ordering within a key
  * is not). expectedHead pins each commit to the head the merge read,
  * so concurrent maintenance writers become detected conflicts. */
object Scd2Pipeline {

  private[streaming] def batchAction(batchId: Long): String =
    s"scd2-batch-$batchId"

  /** Apply one micro-batch exactly once. Factored from [[start]] so
    * the spec can drive crash points directly. */
  private[streaming] def applyBatch(spark: SparkSession,
      batch: DataFrame, tableDir: String, keys: Seq[String],
      tsCol: String = "ts", seqCol: String = "event_id",
      batchId: Long, crashBeforeCommit: Boolean = false): Boolean = {
    val done = TableLog.actions(spark, tableDir)
      .exists(_._2 == batchAction(batchId))
    if (done || batch.isEmpty) return false
    val head = TableLog.head(spark, tableDir).getOrElse(
      sys.error(s"$tableDir has no log — init the dimension table first"))
    val staging = s"$tableDir/_staging-scd2-$batchId-${
      java.util.UUID.randomUUID()}"
    batch.write.parquet(s"$staging/changes")
    val (_, untouched) = Upsert.mergeScd2Shared(spark,
      TableLog.snapshotFiles(spark, tableDir), s"$staging/changes",
      s"$staging/out", keys, tsCol, seqCol)
    if (crashBeforeCommit) sys.error("injected crash before commit")
    TableLog.commit(spark, tableDir, s"$staging/out",
      action = batchAction(batchId), expectedHead = Some(head),
      carry = untouched)
    // keep any Bloom sidecars on the table FRESH behind the commit:
    // the incremental refresh re-aggregates only this batch's new
    // files (no-op without indexes; a crash here leaves the sidecar
    // trailing, which r17 lookups tolerate losslessly)
    graft.ingest.FileSkipIndex.refreshAll(spark, tableDir)
    val p = new org.apache.hadoop.fs.Path(staging)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    true
  }

  def start(events: DataFrame, tableDir: String, checkpoint: String,
      keys: Seq[String], tsCol: String = "ts",
      seqCol: String = "event_id",
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, batch, tableDir, keys, tsCol,
          seqCol, batchId)
        ()
      }
      .start()
}
