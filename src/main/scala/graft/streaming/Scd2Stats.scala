package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming Type-2 SCD — the continuous form of
  * [[graft.queries.Streaming]]'s `q_scd2`: each (user, type)
  * observation opens a dimension version; the moment the NEXT
  * observation of the same key becomes order-final, the previous
  * version's validity interval closes and emits irreversibly as
  * (user_id, event_type, event_id, valid_from, valid_to). The closed
  * rows are exactly the batch kernel's `valid_to IS NOT NULL` rows;
  * the one still-open version per key IS the retained state (the
  * "current" row a lakehouse MERGE would upsert), so downstream gets
  * an append-only closed-interval history — the shape the RangeSink's
  * landed tables feed.
  *
  * The [[AttributionStats]] order-final fold, keyed by the composite
  * (user_id, event_type): events buffer until the watermark passes
  * them; the prefix at or below the watermark is final, so "the next
  * observation" is final too and the interval it closes can never be
  * re-cut. Retained state is ONE open version (valid_from, event_id)
  * plus the watermark-lag pending slice — O(1) per key plus stream
  * disorder, independent of stream lifetime.
  *
  * Both fMGWS disciplines (ADVICE.md): late rows are dropped
  * EXPLICITLY (one below the watermark would insert an interval into
  * already-emitted history), and the flush timer parks on the oldest
  * pending ts so a quiet key's intervals close as soon as the
  * watermark passes them. Until a watermark has actually been
  * observed (`getCurrentWatermarkMs() == 0`, Spark's pre-first-batch
  * initialization) the late-drop treats the watermark as −∞ — a 0
  * would silently discard pre-1970 event times as "late"
  * (ADVICE r13). Event times fold in MICROSECONDS so the (ts,
  * event_id) order and the emitted epoch-micro bounds match the batch
  * kernel bit-for-bit. */
object Scd2Stats {

  /** One closed validity interval:
    * (user_id, event_type, event_id, valid_from, valid_to). */
  type Version = (Long, String, Long, Long, Long)

  /** openUs/openId: the key's current open version (valid_from epoch
    * micros, event id; openUs = MinValue before the first fold);
    * pend*: parallel arrays of not-yet-order-final observations. */
  case class Scd2State(openUs: Long, openId: Long,
      pendUs: Array[Long], pendId: Array[Long])

  def transform(events: DataFrame, watermark: String): Dataset[Version] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("user_id"), col("event_id"),
        col("event_type"))
      .as[(Timestamp, Long, Long, String)]
      .groupByKey(r => (r._2, r._4))
      .flatMapGroupsWithState[Scd2State, Version](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((user, ty), rows, state: GroupState[Scd2State]) =>
          val wmUs = AttributionStats.wmFloorUs(
            state.getCurrentWatermarkMs())
          val prev = state.getOption.getOrElse(Scd2State(Long.MinValue,
            0L, Array.emptyLongArray, Array.emptyLongArray))
          // EXPLICIT late-drop (fMGWS admits late rows): one at or
          // below the watermark would re-cut an interval the fold
          // already closed
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
            out.iterator.map { case (id, from, to) =>
              (user, ty, id, from, to)
            }
          }
      }
  }

  /** Fold every pending observation with ts ≤ `upTo` in (ts, event_id)
    * order: each one closes the open version (emitting
    * (event_id, valid_from, valid_to)) and becomes the new open
    * version. Pure → unit-tested directly. */
  private[streaming] def fold(st: Scd2State, upTo: Long)
      : (Scd2State, List[(Long, Long, Long)]) = {
    val idx = st.pendUs.indices.filter(i => st.pendUs(i) <= upTo)
    if (idx.isEmpty) return (st, Nil)
    val ordered = idx.sortBy(i => (st.pendUs(i), st.pendId(i)))
    var (oUs, oId) = (st.openUs, st.openId)
    val out = List.newBuilder[(Long, Long, Long)]
    ordered.foreach { i =>
      val (us, id) = (st.pendUs(i), st.pendId(i))
      if (oUs != Long.MinValue) out += ((oId, oUs, us))
      oUs = us; oId = id
    }
    val rest = st.pendUs.indices.filterNot(i => st.pendUs(i) <= upTo)
    (st.copy(
      openUs = oUs, openId = oId,
      pendUs = rest.iterator.map(st.pendUs).toArray,
      pendId = rest.iterator.map(st.pendId).toArray),
      out.result())
  }

  def start(events: DataFrame, root: String, checkpoint: String,
      watermark: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    transform(events, watermark)
      .toDF("user_id", "event_type", "event_id", "valid_from", "valid_to")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", root)
      .outputMode("append")
      .start()
}
