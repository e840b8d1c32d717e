package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming last-touch attribution — the continuous form of
  * [[graft.queries.Behavior]]'s `q_attribution`: each purchase emits
  * exactly one (user_id, touch_type, purchase_us) row crediting the
  * user's most recent PRIOR non-purchase event within the lookback,
  * else 'direct', the moment the purchase becomes order-final.
  * Downstream aggregation by touch_type reproduces the batch query's
  * (conversions, distinct users) exactly.
  *
  * The [[TransitionStats]] order-final fold, specialized: events
  * buffer only until the watermark passes them; the prefix at or below
  * the watermark is final, so each purchase's "last prior touch" is
  * final too and emits irreversibly. Retained state is ONE
  * (touch_type, touch_us) pair + the watermark-lag pending slice:
  * O(1) per user plus stream disorder — attribution is a left fold
  * whose carry is the last non-purchase seen.
  *
  * Both fMGWS disciplines (ADVICE.md): late rows are dropped
  * EXPLICITLY (fMGWS admits them; one would rewrite an already-
  * attributed purchase's touch), and the flush timer parks on the
  * oldest pending ts so a quiet user's final purchases attribute as
  * soon as the watermark passes them, not at their next event.
  *
  * Event times fold in MICROSECONDS (epoch micros from the NTZ
  * timestamp) so the lookback cut and the (ts, event_id) order match
  * the batch query's unix_micros arithmetic bit-for-bit — the
  * watermark is millisecond-valued, so order-finality at wm·1000 is
  * conservative by < 1 ms (a pending event inside that sliver just
  * folds on the next watermark movement; the re-parked timer
  * guarantees one). AttributionStatsSpec pins streamed rows ≡ the
  * batch query under shuffled cross-batch arrival, the 7-day boundary,
  * same-ts event_id tie-breaks, late-drop, and the timeout flush. */
object AttributionStats {

  /** One row per order-final purchase. */
  type Outcome = (Long, String, Long)

  /** touchUs: epoch micros of the last folded non-purchase
    * (Long.MinValue before any); touchTy: its type; pend*: parallel
    * arrays of not-yet-order-final events. */
  case class AttrState(touchUs: Long, touchTy: String,
      pendUs: Array[Long], pendId: Array[Long], pendTy: Array[String])

  private[streaming] def micros(ts: Timestamp): Long =
    // floorDiv, not /: getTime truncates toward zero on pre-1970
    // values while getNanos stays positive — plain division would
    // sign-flip the fractional second (−0.5 s → +0.5 s)
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000

  /** Watermark floor for fMGWS late-drops and folds, shared by every
    * order-final fold operator: Spark initializes the watermark to 0
    * before the first one is computed, and a literal 0 would silently
    * late-drop pre-1970 event times AND prematurely fold them as
    * order-final (ADVICE r13) — treat "no watermark yet" as −∞
    * (millisecond flavor; [[wmFloorUs]] is the micros one). A stream
    * of ONLY pre-epoch events buffers until a post-1970 event advances
    * the watermark — the conservative side of the ambiguity. Timers
    * must keep using the RAW getCurrentWatermarkMs() lower bound:
    * setTimeoutTimestamp rejects values at or below the real
    * watermark, floored or not. */
  private[streaming] def wmFloorMs(wmMs: Long): Long =
    if (wmMs == 0) Long.MinValue else wmMs

  /** [[wmFloorMs]] in epoch micros. */
  private[streaming] def wmFloorUs(wmMs: Long): Long =
    if (wmMs == 0) Long.MinValue else wmMs * 1000L

  def transform(events: DataFrame, watermark: String,
      lookbackUs: Long = 7L * 86400 * 1000000): Dataset[Outcome] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("user_id"), col("event_id"),
        col("event_type"))
      .as[(Timestamp, Long, Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[AttrState, Outcome](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[AttrState]) =>
          val wmUs = wmFloorUs(state.getCurrentWatermarkMs())
          val prev = state.getOption.getOrElse(AttrState(Long.MinValue,
            "", Array.emptyLongArray, Array.emptyLongArray,
            Array.empty[String]))
          // EXPLICIT late-drop (fMGWS does not filter late rows): a row
          // at or below the watermark would insert before purchases the
          // fold already attributed
          val add = rows.map(r => (micros(r._1), r._3, r._4))
            .filter(_._1 > wmUs).toArray
          if (add.isEmpty && state.getOption.isEmpty) Iterator.empty
          else {
            val grown = prev.copy(
              pendUs = prev.pendUs ++ add.map(_._1),
              pendId = prev.pendId ++ add.map(_._2),
              pendTy = prev.pendTy ++ add.map(_._3))
            val (folded, out) = fold(grown, wmUs, lookbackUs)
            state.update(folded)
            // flush timer on the oldest pending ts (ms-floored; always
            // re-parked > wm, so the sub-ms sliver self-resolves)
            if (folded.pendUs.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                folded.pendUs.min / 1000, state.getCurrentWatermarkMs() + 1))
            out.iterator.map { case (ty, us) => (user, ty, us) }
          }
      }
  }

  /** Fold every pending event with ts ≤ `upTo` in (ts, event_id)
    * order: purchases emit their attribution against the carry, other
    * types become the carry. Pure → unit-tested directly. */
  private[streaming] def fold(st: AttrState, upTo: Long, lookbackUs: Long)
      : (AttrState, List[(String, Long)]) = {
    val idx = st.pendUs.indices.filter(i => st.pendUs(i) <= upTo)
    if (idx.isEmpty) return (st, Nil)
    val ordered = idx.sortBy(i => (st.pendUs(i), st.pendId(i)))
    var (touchUs, touchTy) = (st.touchUs, st.touchTy)
    val out = List.newBuilder[(String, Long)]
    ordered.foreach { i =>
      val (us, ty) = (st.pendUs(i), st.pendTy(i))
      if (ty == "purchase") {
        val credited =
          if (touchUs != Long.MinValue && us - touchUs <= lookbackUs)
            touchTy
          else "direct"
        out += ((credited, us))
      } else { touchUs = us; touchTy = ty }
    }
    val rest = st.pendUs.indices.filterNot(i => st.pendUs(i) <= upTo)
    (st.copy(
      touchUs = touchUs, touchTy = touchTy,
      pendUs = rest.iterator.map(st.pendUs).toArray,
      pendId = rest.iterator.map(st.pendId).toArray,
      pendTy = rest.iterator.map(st.pendTy).toArray),
      out.result())
  }

  def start(events: DataFrame, root: String, checkpoint: String,
      watermark: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    transform(events, watermark)
      .toDF("user_id", "touch_type", "purchase_us")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", root)
      .outputMode("append")
      .start()
}
