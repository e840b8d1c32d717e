package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming cohort retention — the continuous form of
  * [[graft.queries.Behavior]]'s `q_retention_cohort`: each user's
  * FIRST event week is their cohort; every (user, active week) emits
  * exactly one (cohort_week, week_no) delta the moment it becomes
  * order-final. Counting deltas by (cohort_week, week_no) downstream
  * reproduces the batch retention triangle exactly (each delta IS one
  * distinct user-week).
  *
  * The [[TransitionStats]] order-final fold, with a cohort twist that
  * makes it correct on an unbounded stream: once ANY event folds (its
  * ts is at or below the watermark), no admissible future event can
  * precede it — late rows are dropped, on-time rows sit above the
  * watermark — so the first folded event's week IS the user's final
  * cohort, never revised. Retained state is the cohort week + the
  * LAST emitted week_no — O(1) per user regardless of stream lifetime
  * (r14; the emitted-week_nos SET it replaces grew with the calendar
  * span): events fold in (ts, event_id) order and the late-drop keeps
  * cross-fold order too (folded ≤ watermark < pending), so week
  * numbers arrive NON-DECREASING and "already emitted" is exactly
  * "≤ lastWn" — plus the watermark-lag pending slice.
  * StreamingGcSpec pins the bound over a 10-year synthetic stream.
  *
  * Weeks are ISO Monday-start on UTC epoch days — bit-compatible with
  * `date_trunc('week')` in the UTC-pinned session and in DuckDB, so
  * RetentionStatsSpec can pin streamed deltas ≡ the batch query.
  * Both fMGWS disciplines (ADVICE.md): explicit late-drop, flush timer
  * parked on the oldest pending ts. */
object RetentionStats {

  /** One order-final (user, active-week) observation:
    * (user_id, cohort week start in epoch days, week offset). */
  type Delta = (Long, Long, Long)

  /** cohortDays: epoch-day Monday of the user's first folded week
    * (MinValue before any fold); lastWn: largest week_no emitted so
    * far (−1 before any — week numbers are non-decreasing, see above);
    * pend*: parallel arrays of not-yet-order-final events. */
  case class RetState(cohortDays: Long, lastWn: Long,
      pendUs: Array[Long], pendId: Array[Long])

  /** Monday-start week (epoch days) of an epoch-micros instant —
    * epoch day 0 (1970-01-01) was a Thursday, hence the +3. */
  private[streaming] def weekStartDays(us: Long): Long = {
    val days = Math.floorDiv(us, 86400000000L)
    days - Math.floorMod(days + 3, 7)
  }

  def transform(events: DataFrame, watermark: String): Dataset[Delta] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("user_id"), col("event_id"))
      .as[(Timestamp, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[RetState, Delta](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[RetState]) =>
          val wmUs = AttributionStats.wmFloorUs(
            state.getCurrentWatermarkMs())
          val prev = state.getOption.getOrElse(RetState(Long.MinValue,
            -1L, Array.emptyLongArray, Array.emptyLongArray))
          // EXPLICIT late-drop (fMGWS admits late rows): one at or
          // below the watermark could otherwise precede the folded
          // first event and rewrite the cohort
          val add = rows.map(r => (AttributionStats.micros(r._1), r._3))
            .filter(_._1 > wmUs).toArray
          if (add.isEmpty && state.getOption.isEmpty) Iterator.empty
          else {
            val grown = prev.copy(
              pendUs = prev.pendUs ++ add.map(_._1),
              pendId = prev.pendId ++ add.map(_._2))
            val (folded, out) = fold(grown, wmUs)
            state.update(folded)
            if (folded.pendUs.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                folded.pendUs.min / 1000, state.getCurrentWatermarkMs() + 1))
            out.iterator.map { case (cw, wn) => (user, cw, wn) }
          }
      }
  }

  /** Fold every pending event with ts ≤ `upTo` in (ts, event_id)
    * order: the first fold fixes the cohort; each NEW active week
    * emits one (cohort_days, week_no). The fold walks timestamps in
    * non-decreasing order, so a week is new exactly when its number
    * exceeds the last emitted one — O(1) dedup state. Pure →
    * unit-tested directly. */
  private[streaming] def fold(st: RetState, upTo: Long)
      : (RetState, List[(Long, Long)]) = {
    val idx = st.pendUs.indices.filter(i => st.pendUs(i) <= upTo)
    if (idx.isEmpty) return (st, Nil)
    val ordered = idx.sortBy(i => (st.pendUs(i), st.pendId(i)))
    var cohort = st.cohortDays
    var lastWn = st.lastWn
    val out = List.newBuilder[(Long, Long)]
    ordered.foreach { i =>
      val ws = weekStartDays(st.pendUs(i))
      if (cohort == Long.MinValue) cohort = ws
      val wn = (ws - cohort) / 7
      if (wn > lastWn) {
        lastWn = wn
        out += ((cohort, wn))
      }
    }
    val rest = st.pendUs.indices.filterNot(i => st.pendUs(i) <= upTo)
    (st.copy(
      cohortDays = cohort, lastWn = lastWn,
      pendUs = rest.iterator.map(st.pendUs).toArray,
      pendId = rest.iterator.map(st.pendId).toArray),
      out.result())
  }

  def start(events: DataFrame, root: String, checkpoint: String,
      watermark: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    transform(events, watermark)
      .toDF("user_id", "cohort_days", "week_no")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", root)
      .outputMode("append")
      .start()
}
