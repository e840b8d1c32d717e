package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming sequential funnel — the continuous form of
  * [[graft.queries.Behavior]]'s `q_funnel`: per user, the first-touch
  * step cascade (step j's first qualifying event strictly after step
  * j−1's, within the step window Δ), emitted EXACTLY ONCE per user when
  * the funnel outcome is sealed.
  *
  * Why `flatMapGroupsWithState` and not a windowed aggregate: the
  * cascade is ORDER-SENSITIVE across event types — a step-2 event
  * qualifies only relative to the FINAL step-1 minimum, which later
  * (non-late) arrivals can still lower, retroactively re-qualifying an
  * event that was useless when it arrived. No built-in aggregate holds
  * that revision window; a per-user buffer does, and the funnel's own
  * geometry bounds it.
  *
  * Sealing contract (the correctness core): once the first step-1
  * event is at t1, NO event with ts > t1 + (k−1)·Δ can change the
  * outcome — t1 can only decrease (shrinking every window), and step
  * k's window ends at most (k−1)·Δ after t1. So the state times out at
  * event-time t1 + (k−1)·Δ: when the watermark passes it, every event
  * that could still arrive is provably irrelevant, and the outcome is
  * final under the same watermark contract as any streaming aggregate.
  * Users with no step-1 event GC at maxTs + (k−1)·Δ without emitting
  * (a step-1 event arriving after that point has ts past the watermark,
  * hence past every buffered timestamp — nothing buffered qualifies).
  *
  * State bound: buffered events are TRIMMED to ts ≤ t1 + (k−1)·Δ (they
  * can never qualify beyond the horizon), so per-user state is the
  * funnel-horizon slice of that user's step-typed events — bounded by
  * the funnel's span, not the stream's. Each entry packs into one long
  * (ts·8 | stepIdx).
  *
  * FunnelStatsSpec pins streamed outcomes ≡ the batch window-cascade
  * on the same events bit-for-bit, under adversarially SHUFFLED
  * arrival order, cross-batch state carry, late-drop, and the no-step1
  * GC path. */
object FunnelStats {

  /** (user_id, stage reached ∈ [1, steps], t_first = step-1 ts,
    * t_last = reached-stage ts). Users who never reach step 1 emit
    * nothing — the batch funnel counts them in no step either. */
  type Outcome = (Long, Int, Timestamp, Timestamp)

  def transform(events: DataFrame, steps: Seq[String], watermark: String,
      stepWindow: String): Dataset[Outcome] = {
    require(steps.size >= 2 && steps.size <= 8,
      s"funnel needs 2..8 steps: $steps")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val deltaMs = windowMillis(stepWindow)
    val horizonMs = deltaMs * (steps.size - 1)
    val nSteps = steps.size
    events
      .withWatermark("ts", watermark)
      .filter(col("event_type").isin(steps: _*))
      .select(col("ts"), col("user_id"), col("event_type"))
      .as[(Timestamp, Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Array[Long], Outcome](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[Array[Long]]) =>
          if (state.hasTimedOut) {
            val buf = state.get
            state.remove()
            seal(user, buf, nSteps, deltaMs)
          } else {
            val prev = state.getOption.getOrElse(Array.emptyLongArray)
            // EXPLICIT late-drop (r14): a late STEP-1 event arriving
            // after its user's funnel sealed (state removed) would
            // otherwise re-create state with t1 below the watermark
            // and emit a DUPLICATE outcome at the next seal; the
            // no-step-1 trim inside updateBuffer only covers the
            // other steps. Floored so pre-epoch events are not
            // dropped by the wm = 0 initialization (ADVICE r13).
            val wmF = AttributionStats.wmFloorMs(
              state.getCurrentWatermarkMs())
            val grown = prev ++ rows.filter(_._1.getTime > wmF)
              .map { case (t, _, e) => t.getTime * 8L + stepIdx(e) }
            val (kept, sealAt) = updateBuffer(grown, horizonMs, wmF)
            if (kept.isEmpty) {
              // every buffered event is provably dead — drop the state
              // entirely instead of parking an empty buffer on a timer
              if (state.exists) state.remove()
            } else {
              state.update(kept)
              // the timeout must sit past the current watermark; if the
              // horizon already passed (one replayed batch covering it
              // all), the earliest legal timeout fires next batch
              state.setTimeoutTimestamp(
                math.max(sealAt, state.getCurrentWatermarkMs() + 1))
            }
            Iterator.empty
          }
      }
  }

  /** Trim the grown buffer to what can still affect the outcome and
    * compute the seal point. With a step-1 event at t1: keep ts ≤ t1 +
    * horizon (t1 only decreases, so nothing trimmed can re-qualify),
    * seal at t1 + horizon. WITHOUT one: any event can only qualify
    * behind a FUTURE step-1 whose ts must exceed the watermark, so
    * everything at or below it is dead weight — this is what bounds
    * the state of a user who views forever but never signs up to the
    * watermark lag, not the stream length. Pure → unit-tested
    * directly (FunnelStatsSpec). */
  private[streaming] def updateBuffer(grown: Array[Long], horizonMs: Long,
      watermarkMs: Long): (Array[Long], Long) = {
    var t1 = Long.MaxValue
    grown.foreach { p =>
      if ((p & 7L) == 0L && (p >>> 3) < t1) t1 = p >>> 3
    }
    if (t1 != Long.MaxValue)
      (grown.filter(p => (p >>> 3) <= t1 + horizonMs), t1 + horizonMs)
    else {
      val kept = grown.filter(p => (p >>> 3) > watermarkMs)
      if (kept.isEmpty) (kept, Long.MinValue)
      else (kept, kept.map(_ >>> 3).max + horizonMs)
    }
  }

  /** Replay the cascade over the buffered slice: t_j = min ts of a
    * step-j event in (t_{j−1}, t_{j−1}+Δ]. One sorted pass. */
  private def seal(user: Long, buf: Array[Long], nSteps: Int,
      deltaMs: Long): Iterator[Outcome] = {
    val stepTs = Array.fill(nSteps)(Long.MaxValue)
    buf.foreach { p =>
      if ((p & 7L) == 0L && (p >>> 3) < stepTs(0)) stepTs(0) = p >>> 3
    }
    if (stepTs(0) == Long.MaxValue) return Iterator.empty
    var j = 1
    while (j < nSteps && stepTs(j - 1) != Long.MaxValue) {
      val lo = stepTs(j - 1)
      buf.foreach { p =>
        val ts = p >>> 3
        if ((p & 7L) == j && ts > lo && ts <= lo + deltaMs &&
          ts < stepTs(j)) stepTs(j) = ts
      }
      j += 1
    }
    val stage = stepTs.count(_ != Long.MaxValue)
    Iterator.single((user, stage, new Timestamp(stepTs(0)),
      new Timestamp(stepTs(stage - 1))))
  }

  def start(events: DataFrame, root: String, checkpoint: String,
      steps: Seq[String], watermark: String = "10 minutes",
      stepWindow: String = "7 days",
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    transform(events, steps, watermark, stepWindow)
      .toDF("user_id", "stage", "t_first", "t_last")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", root)
      .outputMode("append")
      .start()

  private def windowMillis(len: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String
        .fromString(len))
    require(iv.months == 0, s"step window must be sub-month: $len")
    iv.days * 86400000L + iv.microseconds / 1000L
  }
}
