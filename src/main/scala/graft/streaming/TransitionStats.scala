package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming Markov transition counts — the continuous form of
  * [[graft.queries.Behavior]]'s `q_event_transitions`: per user,
  * consecutive event-type pairs in (ts, event_id) order, emitted as
  * mergeable COUNT DELTAS the moment they become order-final
  * (summable downstream by (from_type, to_type) — parquet sums, a
  * follow-on streaming aggregation, or the batch matrix query at
  * read time).
  *
  * The [[SequenceStats]] order-final fold, specialized: events buffer
  * only until the watermark passes them; the prefix at or below the
  * watermark is final (no later arrival can insert into it), so its
  * adjacent pairs — including the pair spanning the previous fold's
  * LAST type — are final too and fold irreversibly into emitted
  * deltas. Unlike the sequence sessions there is no gap semantics (the
  * batch matrix counts a transition across any silence), so retained
  * state is ONE event type + the watermark-lag pending slice: O(1) per
  * user plus stream disorder, forever — the exact state the semantics
  * require, no more. TransitionStatsSpec pins summed streamed deltas ≡
  * the batch matrix counts under shuffled cross-batch arrival and
  * same-ts event_id tie-breaks. */
object TransitionStats {

  /** (from_type, to_type, n) — a mergeable count delta. */
  type Delta = (String, String, Long)

  /** lastType: final type of the folded prefix ("" before any fold);
    * pend*: parallel arrays of not-yet-order-final events. */
  case class TransState(lastType: String,
      pendTs: Array[Long], pendId: Array[Long], pendTy: Array[String])

  def transform(events: DataFrame, watermark: String): Dataset[Delta] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("user_id"), col("event_id"),
        col("event_type"))
      .as[(Timestamp, Long, Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[TransState, Delta](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state: GroupState[TransState]) =>
          val wm = AttributionStats.wmFloorMs(
            state.getCurrentWatermarkMs())
          val prev = state.getOption.getOrElse(TransState("",
            Array.emptyLongArray, Array.emptyLongArray,
            Array.empty[String]))
          // EXPLICIT late-drop: flatMapGroupsWithState does NOT filter
          // late rows for you (unlike aggregations) — a row at or
          // below the watermark would insert into a prefix the fold
          // already declared final and rewrite emitted counts
          val add = rows.filter(_._1.getTime > wm).toArray
          if (add.isEmpty && state.getOption.isEmpty) Iterator.empty
          else {
            val grown = prev.copy(
              pendTs = prev.pendTs ++ add.map(_._1.getTime),
              pendId = prev.pendId ++ add.map(_._3),
              pendTy = prev.pendTy ++ add.map(_._4))
            val (folded, deltas) = fold(grown, wm)
            state.update(folded)
            // flush timer: without one, a quiet user's pending slice
            // would only fold at their NEXT event — park the timeout on
            // the oldest pending ts (always > wm) so the flush fires as
            // soon as the watermark passes it; no pending → no timer
            // (retained state is just lastType, the semantics' minimum)
            if (folded.pendTs.nonEmpty)
              // raw watermark here: the floored −∞ would underflow the
              // timer's must-be-past-the-watermark contract
              state.setTimeoutTimestamp(math.max(folded.pendTs.min,
                state.getCurrentWatermarkMs() + 1))
            deltas.iterator
          }
      }
  }

  /** Fold every pending event with ts ≤ `upTo`: sort the order-final
    * slice by (ts, event_id), count adjacent pairs (the first pairs
    * with the previous fold's lastType), keep the new lastType. Pure →
    * unit-tested directly. */
  private[streaming] def fold(st: TransState, upTo: Long)
      : (TransState, List[Delta]) = {
    val idx = st.pendTs.indices.filter(i => st.pendTs(i) <= upTo)
    if (idx.isEmpty) return (st, Nil)
    val ordered = idx.sortBy(i => (st.pendTs(i), st.pendId(i)))
    val counts = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), Long]
    var last = st.lastType
    ordered.foreach { i =>
      val ty = st.pendTy(i)
      if (last.nonEmpty) {
        val k = (last, ty)
        counts.update(k, counts.getOrElse(k, 0L) + 1L)
      }
      last = ty
    }
    val rest = st.pendTs.indices.filterNot(i => st.pendTs(i) <= upTo)
    (st.copy(
      lastType = last,
      pendTs = rest.iterator.map(st.pendTs).toArray,
      pendId = rest.iterator.map(st.pendId).toArray,
      pendTy = rest.iterator.map(st.pendTy).toArray),
      counts.iterator.map { case ((f, t), n) => (f, t, n) }.toList)
  }

  def start(events: DataFrame, root: String, checkpoint: String,
      watermark: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    transform(events, watermark)
      .toDF("from_type", "to_type", "n")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", root)
      .outputMode("append")
      .start()
}
