package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming gap-based sessionization — the continuous form of
  * [[graft.queries.Behavior]]'s `q_sessionize`: a user's session
  * emits (user_id, session_idx, n_events, duration_sec) the moment it
  * is PROVABLY closed — either a later order-final event broke the
  * 30-minute gap, or the watermark itself passed last-event + gap
  * (any future arrival satisfies ts > wm ≥ last + gap, so it must
  * break). Session ids are the batch kernel's 1-based running break
  * count, durations whole seconds from exact epoch-micro BIGINTs —
  * emitted rows are bit-equal to the batch kernel's rows for every
  * closed session.
  *
  * The [[TransitionStats]] order-final fold: retained state is ONE
  * open session (idx, start, last, n — four longs) plus the
  * watermark-lag pending slice, O(1) per user forever. Explicit
  * late-drop (a late row could extend or split an already-emitted
  * session), −∞ watermark floor until observed, flush timer parked on
  * min(oldest pending, open-session close time) so quiet users'
  * sessions close without another event. SessionStatsSpec pins
  * streamed ≡ the batch kernel under shuffled arrival, same-ts
  * tie-breaks, cross-batch session stitching, and the timer close;
  * StreamingGcSpec drives an endless-activity user. */
object SessionStats {

  /** (user_id, session_idx, n_events, duration_sec) — one CLOSED
    * session, identical to the batch kernel's row. */
  type Sess = (Long, Long, Long, Long)

  private[streaming] val GapUs = 1800L * 1000000L

  /** idx: current session ordinal (0 = none opened yet); startUs/
    * lastUs/n: the open session (n = 0 ⇒ no open session); pend*:
    * not-yet-order-final events. */
  case class SessState(idx: Long, startUs: Long, lastUs: Long, n: Long,
      pendUs: Array[Long], pendId: Array[Long])

  def transform(events: DataFrame, watermark: String): Dataset[Sess] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("user_id"), col("event_id"))
      .as[(Timestamp, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[SessState, Sess](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[SessState]) =>
          val wmUs = AttributionStats.wmFloorUs(
            state.getCurrentWatermarkMs())
          val prev = state.getOption.getOrElse(SessState(0L, 0L,
            Long.MinValue, 0L, Array.emptyLongArray, Array.emptyLongArray))
          // EXPLICIT late-drop: a row at or below the watermark could
          // extend or split a session already emitted
          val add = rows
            .map(r => (AttributionStats.micros(r._1), r._3))
            .filter(_._1 > wmUs).toArray
          if (add.isEmpty && state.getOption.isEmpty) Iterator.empty
          else {
            val grown = prev.copy(
              pendUs = prev.pendUs ++ add.map(_._1),
              pendId = prev.pendId ++ add.map(_._2))
            val (folded, out) = fold(grown, wmUs)
            state.update(folded)
            // flush timer: the earlier of the oldest pending event and
            // the open session's close time — whichever the watermark
            // reaches first finalizes something; raw wm lower bound
            val closes =
              (if (folded.pendUs.nonEmpty) Seq(folded.pendUs.min / 1000L)
               else Nil) ++
              (if (folded.n > 0)
                Seq((folded.lastUs + GapUs) / 1000L + 1) else Nil)
            if (closes.nonEmpty)
              state.setTimeoutTimestamp(math.max(closes.min,
                state.getCurrentWatermarkMs() + 1))
            out.iterator.map { case (i, n, dur) => (user, i, n, dur) }
          }
      }
  }

  /** Fold every pending event with ts ≤ `upTo` in (ts, event_id)
    * order: a gap > 30 min closes the open session and opens the
    * next; afterwards, close the open session outright if the
    * watermark has passed its close time (no admissible arrival can
    * extend it). Pure → unit-tested and GC-driven directly. */
  private[streaming] def fold(st: SessState, upTo: Long)
      : (SessState, List[(Long, Long, Long)]) = {
    val idx = st.pendUs.indices.filter(i => st.pendUs(i) <= upTo)
    val out = List.newBuilder[(Long, Long, Long)]
    var (sIdx, start, last, n) = (st.idx, st.startUs, st.lastUs, st.n)
    idx.sortBy(i => (st.pendUs(i), st.pendId(i))).foreach { i =>
      val us = st.pendUs(i)
      if (n == 0L) { sIdx += 1; start = us; last = us; n = 1 }
      else if (us - last > GapUs) {
        out += ((sIdx, n, (last - start) / 1000000L))
        sIdx += 1; start = us; last = us; n = 1
      } else { last = us; n += 1 }
    }
    // watermark-closure: upTo ≥ last + gap ⇒ any future ts > upTo
    // breaks, so the open session is final even with no successor
    if (n > 0 && upTo >= last + GapUs) {
      out += ((sIdx, n, (last - start) / 1000000L))
      n = 0
    }
    val rest = st.pendUs.indices.filterNot(i => st.pendUs(i) <= upTo)
    (st.copy(idx = sIdx, startUs = start, lastUs = last, n = n,
      pendUs = rest.iterator.map(st.pendUs).toArray,
      pendId = rest.iterator.map(st.pendId).toArray),
      out.result())
  }

  def start(events: DataFrame, root: String, checkpoint: String,
      watermark: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    transform(events, watermark)
      .toDF("user_id", "session_idx", "n_events", "duration_sec")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", root)
      .outputMode("append")
      .start()
}
