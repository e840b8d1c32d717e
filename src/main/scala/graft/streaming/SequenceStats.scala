package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming sequence-pattern matching — the continuous form of
  * [[graft.queries.Behavior]]'s `q_sequence_pattern`: per user, which
  * substring patterns the (ts, event_id)-ordered event-initial string
  * contains, emitted once per session when the watermark seals it.
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
  * Sealing: a session closes when the watermark passes
  * lastEventTs + gap; everything pending is then ≤ lastEventTs ≤
  * watermark, hence folded, and the flags are final. A user active
  * again later starts a fresh session (new state). With gap wider than
  * the corpus span, one session = the batch query's whole-string
  * semantics — SequenceStatsSpec pins streamed ≡ batch bit-for-bit
  * under adversarially shuffled cross-batch arrival.
  */
object SequenceStats {

  /** (user_id, matched-pattern bitmask (bit i = patterns(i)),
    * n_events folded, t_last). */
  type Outcome = (Long, Int, Long, Timestamp)

  /** tail: last maxLen−1 folded initials; flags: matched bitmask;
    * lastTs: max event ts seen (the seal anchor); n: folded count;
    * pend*: parallel arrays of not-yet-order-final events. */
  case class SeqState(tail: String, flags: Int, lastTs: Long, n: Long,
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
            // pending events all sit ≤ lastTs ≤ watermark at timeout —
            // fold the stragglers, then emit the sealed flags
            val fin = fold(st, Long.MaxValue, pats, keep)
            Iterator.single((user, fin.flags, fin.n,
              new Timestamp(fin.lastTs)))
          } else {
            val prev = state.getOption.getOrElse(
              SeqState("", 0, Long.MinValue, 0L,
                Array.emptyLongArray, Array.emptyLongArray, ""))
            val add = rows.toArray
            val grown = prev.copy(
              lastTs = math.max(prev.lastTs,
                if (add.isEmpty) Long.MinValue else add.map(_._1.getTime).max),
              pendTs = prev.pendTs ++ add.map(_._1.getTime),
              pendId = prev.pendId ++ add.map(_._3),
              pendCh = prev.pendCh + add.map(_._4).mkString)
            val folded = fold(grown, state.getCurrentWatermarkMs(), pats,
              keep)
            state.update(folded)
            state.setTimeoutTimestamp(math.max(folded.lastTs + gapMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Fold every pending event with ts ≤ `upTo` into (tail, flags):
    * sort the order-final slice by (ts, event_id), scan tail ++ chunk
    * for each still-unmatched pattern, keep the new maxLen−1 tail.
    * Pure → unit-tested directly. */
  private[streaming] def fold(st: SeqState, upTo: Long,
      pats: Array[String], keep: Int): SeqState = {
    val idx = st.pendTs.indices.filter(i => st.pendTs(i) <= upTo)
    if (idx.isEmpty) return st
    val ordered = idx.sortBy(i => (st.pendTs(i), st.pendId(i)))
    val chunk = ordered.iterator.map(st.pendCh.charAt).mkString
    val hay = st.tail + chunk
    var flags = st.flags
    var p = 0
    while (p < pats.length) {
      if ((flags & (1 << p)) == 0 && hay.contains(pats(p)))
        flags |= 1 << p
      p += 1
    }
    val rest = st.pendTs.indices.filterNot(i => st.pendTs(i) <= upTo)
    st.copy(
      tail = hay.takeRight(keep),
      flags = flags,
      n = st.n + idx.size,
      pendTs = rest.iterator.map(st.pendTs).toArray,
      pendId = rest.iterator.map(st.pendId).toArray,
      pendCh = rest.iterator.map(st.pendCh.charAt).mkString)
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
