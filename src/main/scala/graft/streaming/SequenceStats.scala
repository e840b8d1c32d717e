package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming sequence-pattern matching — the continuous form of
  * [[graft.queries.Behavior]]'s `q_sequence_pattern`: per user and
  * SESSION (events separated by ≤ `sessionGap`), which substring
  * patterns the (ts, event_id)-ordered event-initial string contains,
  * emitted once per session when it is provably closed.
  *
  * The state discipline that makes this hold on an unbounded stream
  * (where the batch query's per-user collect_list cannot): events are
  * buffered only until the watermark passes them. A buffered prefix at
  * or below the watermark is ORDER-FINAL — `withWatermark` drops any
  * later arrival at or below it, so no event can ever insert into that
  * prefix — and folds irreversibly into the match state: the pattern
  * flags (a bitmask) plus the last maxLen−1 folded initials (any
  * occurrence spanning a fold boundary fits inside tail ++ chunk, any
  * occurrence inside an older fold was detected then). Folded events
  * are DROPPED. Per-user state is therefore
  * O(watermark-lag events + maxLen), bounded by the stream's disorder,
  * not its length — the [[FunnelStats]] horizon-trim idea, sharpened:
  * sequence containment is a left fold, so the horizon is the
  * watermark itself.
  *
  * Sessionization happens INSIDE the fold: the order-final slice
  * segments at event-time gaps > sessionGap, and order-finality makes
  * each gap final (every future event has ts above the watermark,
  * hence above both sides of the gap), so earlier segments close —
  * and emit — the moment the fold sees them, no matter how the
  * watermark lagged while they were buffered. Two bursts a day apart
  * arriving before any watermark movement still split. The event-time
  * timeout at lastSeenTs + gap handles the final session of a user who
  * simply stops. SequenceStatsSpec pins streamed ≡ batch whole-string
  * containment (single-session corpora) and the multi-session split
  * bit-for-bit under shuffled cross-batch arrival.
  */
object SequenceStats {

  /** (user_id, matched-pattern bitmask (bit i = patterns(i)),
    * n_events in the session, ts of the session's last event). */
  type Outcome = (Long, Int, Long, Timestamp)

  /** tail: last maxLen−1 folded initials of the OPEN session; flags:
    * its matched bitmask; n: its folded count; lastFoldTs: its last
    * folded event ts (MinValue before anything folds); lastTs: max
    * event ts SEEN incl. pending (the timeout anchor); pend*: parallel
    * arrays of not-yet-order-final events. */
  case class SeqState(tail: String, flags: Int, n: Long,
      lastFoldTs: Long, lastTs: Long,
      pendTs: Array[Long], pendId: Array[Long], pendCh: String)

  def transform(events: DataFrame, patterns: Seq[String],
      watermark: String, sessionGap: String): Dataset[Outcome] = {
    require(patterns.nonEmpty && patterns.size <= 32,
      s"1..32 patterns (bitmask-encoded): $patterns")
    require(patterns.forall(_.nonEmpty), "empty pattern")
    val spark = events.sparkSession
    import spark.implicits._
    val pats = patterns.toArray
    val keep = pats.map(_.length).max - 1
    val gapMs = windowMillis(sessionGap)
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("user_id"), col("event_id"),
        substring(col("event_type"), 1, 1).as("ch"))
      .as[(Timestamp, Long, Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[SeqState, Outcome](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[SeqState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            // timeout fires once the watermark passes lastTs + gap, so
            // every pending event is ≤ lastTs ≤ watermark — fold the
            // stragglers (which may themselves split sessions), then
            // the remaining open session is final too
            val (fin, closed) = fold(st, Long.MaxValue, pats, keep,
              gapMs)
            val all =
              if (fin.n > 0) closed :+ ((fin.flags, fin.n, fin.lastFoldTs))
              else closed
            all.iterator.map { case (f, cnt, tl) =>
              (user, f, cnt, new Timestamp(tl))
            }
          } else {
            val prev = state.getOption.getOrElse(
              SeqState("", 0, 0L, Long.MinValue, Long.MinValue,
                Array.emptyLongArray, Array.emptyLongArray, ""))
            // EXPLICIT late-drop: flatMapGroupsWithState does not
            // filter late rows (unlike aggregations) — a row at or
            // below the watermark would insert into an order-final,
            // possibly already-emitted session and rewrite history
            // (or resurrect a removed state as a spurious session)
            val add = rows
              .filter(_._1.getTime > AttributionStats.wmFloorMs(
                state.getCurrentWatermarkMs()))
              .toArray
            if (add.isEmpty && state.getOption.isEmpty) Iterator.empty
            else {
            val grown = prev.copy(
              lastTs = math.max(prev.lastTs,
                if (add.isEmpty) Long.MinValue else add.map(_._1.getTime).max),
              pendTs = prev.pendTs ++ add.map(_._1.getTime),
              pendId = prev.pendId ++ add.map(_._3),
              pendCh = prev.pendCh + add.map(_._4).mkString)
            val (folded, closed) = fold(grown,
              AttributionStats.wmFloorMs(state.getCurrentWatermarkMs()),
              pats, keep, gapMs)
            state.update(folded)
            state.setTimeoutTimestamp(math.max(folded.lastTs + gapMs,
              state.getCurrentWatermarkMs() + 1))
            closed.iterator.map { case (f, cnt, tl) =>
              (user, f, cnt, new Timestamp(tl))
            }
            }
          }
      }
  }

  /** Fold every pending event with ts ≤ `upTo` into the open session:
    * sort the order-final slice by (ts, event_id), SEGMENT it at
    * event-time gaps > gapMs (each gap is final — no future event can
    * land inside it), close-and-collect every segment but the last,
    * scan tail ++ chunk for each still-unmatched pattern, keep the new
    * maxLen−1 tail. Returns (state with the open session, closed
    * sessions as (flags, n, lastEventTs) in order). Pure → unit-tested
    * directly. */
  private[streaming] def fold(st: SeqState, upTo: Long,
      pats: Array[String], keep: Int, gapMs: Long)
      : (SeqState, List[(Int, Long, Long)]) = {
    val idx = st.pendTs.indices.filter(i => st.pendTs(i) <= upTo)
    if (idx.isEmpty) return (st, Nil)
    val ordered = idx.sortBy(i => (st.pendTs(i), st.pendId(i)))
    var tail = st.tail
    var flags = st.flags
    var n = st.n
    var lastTs = st.lastFoldTs
    val closed = List.newBuilder[(Int, Long, Long)]
    val seg = new StringBuilder
    var segN = 0L
    def flushSeg(): Unit = if (segN > 0) {
      val hay = tail + seg.result()
      var p = 0
      while (p < pats.length) {
        if ((flags & (1 << p)) == 0 && hay.contains(pats(p)))
          flags |= 1 << p
        p += 1
      }
      tail = hay.takeRight(keep)
      n += segN
      seg.clear()
      segN = 0
    }
    ordered.foreach { i =>
      val ts = st.pendTs(i)
      if (lastTs != Long.MinValue && ts - lastTs > gapMs) {
        flushSeg()
        closed += ((flags, n, lastTs))
        tail = ""; flags = 0; n = 0
      }
      seg.append(st.pendCh.charAt(i))
      segN += 1
      lastTs = ts
    }
    flushSeg()
    val rest = st.pendTs.indices.filterNot(i => st.pendTs(i) <= upTo)
    (st.copy(
      tail = tail, flags = flags, n = n, lastFoldTs = lastTs,
      pendTs = rest.iterator.map(st.pendTs).toArray,
      pendId = rest.iterator.map(st.pendId).toArray,
      pendCh = rest.iterator.map(st.pendCh.charAt).mkString),
      closed.result())
  }

  private def windowMillis(len: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String
        .fromString(len))
    require(iv.months == 0, s"session gap must be sub-month: $len")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  def start(events: DataFrame, root: String, checkpoint: String,
      patterns: Seq[String], watermark: String = "10 minutes",
      sessionGap: String = "30 days",
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    transform(events, patterns, watermark, sessionGap)
      .toDF("user_id", "flags", "n_events", "t_last")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", root)
      .outputMode("append")
      .start()
}
