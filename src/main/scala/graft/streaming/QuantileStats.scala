package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming windowed quantiles — the continuous form of
  * `q_quantile_sketch`'s DDSketch machinery
  * ([[graft.operators.Sketch.ddSketch]]): per tumbling hour, the
  * occupied (bucket, count) histogram of the positive `value` column,
  * emitted ONCE when the watermark passes the window end. Feed the
  * rows to [[graft.operators.Sketch.ddQuantiles]] (per window, or
  * bucket-summed across windows for any coarser range) and the answer
  * is the batch sketch's, exactly.
  *
  * The thirteenth batch↔stream pair, and the ORDER-INSENSITIVE member
  * of the fold family: DDSketch's buckets have fixed log-scaled
  * boundaries, so the fold is bucketwise ADDITION — commutative and
  * associative — and unlike the order-final folds (sessions, SCD2,
  * EWMA…) the state needs NO pending (ts, id) slice at all: arrival
  * order inside the watermark lag cannot change a histogram. What
  * remains order-sensitive is only FINALITY — a window's rows stop
  * arriving once wm ≥ window end (every future arrival satisfies
  * ts > wm) — so emission waits for the watermark and the state
  * tombstones at emit. Bucketing runs MAP-SIDE with the batch
  * kernel's own Catalyst expression (`ceil(log(γ, value))` — shared
  * via [[bucketed]], not re-derived in Scala), so streamed rows are
  * bit-equal to [[batchKernel]]'s by construction of the plan, not by
  * luck of two log implementations agreeing.
  *
  * Retained state: one (buckets[], counts[]) pair per OPEN window —
  * ≤ ⌈log_γ(max/min)⌉ entries (~2.3k at α = 1% over a 10²⁰ dynamic
  * range) regardless of row count, gone the moment the window seals.
  * Explicit late-drop (a late row belongs to an already-emitted
  * histogram), −∞ watermark floor until observed, flush timer parked
  * on the window end so a quiet window still seals. QuantileStatsSpec
  * pins streamed ≡ batch kernel under shuffled cross-batch arrival,
  * late-drop, and the timer flush, plus cross-window bucket sums ≡
  * the global batch sketch; StreamingGcSpec drives a 10-year hourly
  * stream proving per-window tombstoning. */
object QuantileStats {

  /** (window start epoch-micros, DDSketch bucket, count) — one sealed
    * histogram row, identical to the batch kernel's. */
  type BucketRow = (Long, Long, Long)

  private[streaming] val WinUs = 3600L * 1000000L
  private[streaming] val Alpha = 0.01

  /** Occupied buckets of ONE open window, parallel-array encoded
    * (bucket ids sorted ascending — emission order is part of the
    * bit-equality contract). */
  case class QState(buckets: Array[Long], counts: Array[Long])

  /** The shared bucketing projection: positive values →
    * (win_start_us, bucket). The SAME Catalyst expression feeds the
    * batch kernel and the stream transform — the pair's bit-equality
    * rests on this being one plan fragment, not two log()
    * implementations. */
  private[streaming] def bucketed(events: DataFrame): DataFrame = {
    val gamma = (1 + Alpha) / (1 - Alpha)
    events
      .filter(col("value").cast("double") > 0d)
      .select(col("ts"),
        expr(s"(unix_micros(ts) DIV $WinUs) * $WinUs").as("win_start_us"),
        ceil(log(gamma, col("value").cast("double")))
          .cast("long").as("bucket"))
  }

  /** Batch reference: the per-hour DDSketch histograms a backfill job
    * would compute — the frame the streamed rows must equal. */
  def batchKernel(events: DataFrame): DataFrame =
    bucketed(events)
      .groupBy("win_start_us", "bucket")
      .agg(count(lit(1)).as("c"))

  def transform(events: DataFrame, watermark: String)
      : Dataset[BucketRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    bucketed(events.withWatermark("ts", watermark))
      .as[(Timestamp, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[QState, BucketRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (winStart, rows, state: GroupState[QState]) =>
          val wmUs = AttributionStats.wmFloorUs(
            state.getCurrentWatermarkMs())
          // EXPLICIT late-drop: a row at or below the watermark could
          // belong to a window whose histogram already emitted (state
          // gone — re-folding it would resurrect a partial duplicate)
          val add = rows.filter(r =>
              AttributionStats.micros(r._1) > wmUs)
            .map(_._3).toArray
          val prev = state.getOption.getOrElse(
            QState(Array.emptyLongArray, Array.emptyLongArray))
          if (add.isEmpty && state.getOption.isEmpty) Iterator.empty
          else {
            val (next, out) = fold(prev, add, winStart, wmUs)
            next match {
              case Some(st) =>
                state.update(st)
                // flush timer on the window end: a window nobody
                // writes to again must still seal; raw wm lower bound
                state.setTimeoutTimestamp(math.max(
                  (winStart + WinUs) / 1000L + 1,
                  state.getCurrentWatermarkMs() + 1))
              case None => state.remove() // sealed: tombstone
            }
            out.iterator
          }
      }
  }

  /** Pure fold: bucketwise addition of this batch's bucket ids, then
    * emit-and-tombstone iff the watermark passed the window end (no
    * admissible arrival can land in it again). Pure → unit-tested and
    * GC-driven directly. */
  private[streaming] def fold(st: QState, add: Array[Long],
      winStart: Long, wmUs: Long)
      : (Option[QState], List[BucketRow]) = {
    val m = scala.collection.mutable.TreeMap.empty[Long, Long]
    st.buckets.indices.foreach(i => m.update(st.buckets(i), st.counts(i)))
    add.foreach(b => m.update(b, m.getOrElse(b, 0L) + 1L))
    if (wmUs >= winStart + WinUs)
      (None, m.iterator.map { case (b, c) => (winStart, b, c) }.toList)
    else
      (Some(QState(m.keysIterator.toArray, m.valuesIterator.toArray)),
        Nil)
  }

  def start(events: DataFrame, root: String, checkpoint: String,
      watermark: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    transform(events, watermark)
      .toDF("win_start_us", "bucket", "c")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", root)
      .outputMode("append")
      .start()
}
