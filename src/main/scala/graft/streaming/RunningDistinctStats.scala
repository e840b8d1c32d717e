package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming running-distinct — the continuous form of
  * [[graft.queries.Behavior]]'s `q_running_distinct`: the moment a
  * user's FIRST-seen day becomes order-final, one mergeable
  * (epoch_day, +1) delta lands irreversibly. Summed per day downstream
  * (parquet sums, a follow-on aggregation, or the batch rollup at read
  * time) the deltas are exactly the batch kernel's per-day new-user
  * counts, and their running sum is the cumulative distinct-user
  * curve — count(DISTINCT) OVER (ORDER BY day) without the
  * corpus-sized distinct state ever existing on either side.
  *
  * Finality: a user's candidate first timestamp m only DECREASES with
  * new arrivals, and every future arrival satisfies ts > watermark —
  * so once the watermark reaches m, no arrival can precede it and
  * day(m) is the user's first day, forever. Retained state is the
  * semantics' minimum: one "seen" bit per emitted user (the fact the
  * count must never re-count), plus a single pending candidate
  * timestamp while the first sighting is still inside the watermark
  * lag. No arrays, no per-day maps — O(1) per user with no growth
  * path at all, the tightest state in the fold family.
  *
  * The [[TransitionStats]] order-final delta discipline: explicit
  * late-drop (a late row could belong to a first-day already
  * emitted), −∞ watermark floor until observed (ADVICE r13), and a
  * flush timer parked on the pending candidate so a user whose only
  * event sits inside the lag still emits once the watermark passes it.
  * RunningDistinctSpec pins summed streamed deltas ≡ the batch kernel
  * under shuffled cross-batch arrival, late-drop, and timer flush;
  * StreamingGcSpec drives a 10-year stream proving the one-bit state
  * story. */
object RunningDistinctStats {

  /** (epoch_day of a user's order-final first sighting, +1) — a
    * mergeable new-user delta. */
  type Delta = (Long, Long)

  private val DayUs = 86400000000L

  /** seen: this user's first day was emitted (final, never re-count);
    * pendUs: candidate first timestamp in epoch micros, Long.MaxValue
    * when none pending. */
  case class SeenState(seen: Boolean, pendUs: Long)

  def transform(events: DataFrame, watermark: String): Dataset[Delta] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("user_id"))
      .as[(Timestamp, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[SeenState, Delta](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state: GroupState[SeenState]) =>
          val wmUs = AttributionStats.wmFloorUs(
            state.getCurrentWatermarkMs())
          val prev = state.getOption.getOrElse(
            SeenState(seen = false, pendUs = Long.MaxValue))
          if (prev.seen) {
            // one bit, forever: later events cannot change a final
            // first day — drop them without touching the state store
            Iterator.empty
          } else {
            // EXPLICIT late-drop: flatMapGroupsWithState does not
            // filter late rows — one at or below the watermark could
            // precede an already-final first day elsewhere in the plan
            val minAdd = rows.map(r => AttributionStats.micros(r._1))
              .filter(_ > wmUs)
              .foldLeft(Long.MaxValue)(math.min)
            val (next, out) = fold(prev, minAdd, wmUs)
            if (next != prev) state.update(next)
            if (!next.seen && next.pendUs != Long.MaxValue)
              // flush timer: a quiet user's candidate would otherwise
              // only finalize at their NEXT event; raw watermark lower
              // bound (the floored −∞ underflows the timer contract)
              state.setTimeoutTimestamp(math.max(
                Math.floorDiv(next.pendUs, 1000L) + 1,
                state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Pure fold: merge the batch's min arrival (Long.MaxValue = none)
    * into the candidate, emit the first-day delta iff the watermark
    * has passed the candidate (no future arrival can precede it —
    * arrivals satisfy ts > watermark ≥ candidate). Pure →
    * unit-tested and GC-driven directly. */
  private[streaming] def fold(st: SeenState, minAdd: Long, upTo: Long)
      : (SeenState, Option[Delta]) = {
    if (st.seen) (st, None)
    else {
      val cand = math.min(st.pendUs, minAdd)
      if (cand == Long.MaxValue) (st, None)
      else if (cand <= upTo)
        (SeenState(seen = true, pendUs = Long.MaxValue),
          Some((Math.floorDiv(cand, DayUs), 1L)))
      else (SeenState(seen = false, pendUs = cand), None)
    }
  }

  def start(events: DataFrame, root: String, checkpoint: String,
      watermark: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    transform(events, watermark)
      .toDF("day", "new_users")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", root)
      .outputMode("append")
      .start()
}
