package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming per-user EWMA (α = 1/2) of daily event counts — the
  * continuous form of [[graft.queries.Behavior]]'s `q_ewma`: the
  * moment a UTC day becomes order-final for a user (the watermark
  * passes the day's end, so no admissible event can land in it), the
  * day's count folds into the integer halving recurrence
  * e ← (e + x·1e6) DIV 2 (first day passes through — the batch
  * kernel's −1 seed) and one (user_id, day, x, n_days, ewma_u) row
  * emits irreversibly: the smoothed activity baseline, updated daily,
  * that the anomaly family consumes. A user's LAST emission always
  * equals the batch kernel over their order-final days.
  *
  * The [[AttributionStats]] order-final fold over DAY buckets instead
  * of raw events: retained state is the O(1) carry (ewma_u, n_days)
  * plus the pending not-yet-final (day, count) slice — bounded by the
  * watermark lag in DAYS (one or two entries in practice), independent
  * of stream lifetime; observed-days-only semantics match the batch
  * kernel (no zero-fill on gap days).
  *
  * Both fMGWS disciplines: EXPLICIT late-drop (a late event belongs to
  * a day the fold may already have consumed — admitting it would
  * re-cut emitted history; dropping it matches excluding it from the
  * batch input), and the flush timer parks on the oldest pending day's
  * END so a quiet user's trailing days fold as soon as the watermark
  * passes them. The late-drop treats the watermark as −∞ until one is
  * observed (ADVICE r13: wm = 0 before the first batch would discard
  * pre-epoch event times). Days are floorDiv epoch-days of the event's
  * epoch micros — bit-compatible with `date_trunc('day')` in the
  * UTC-pinned session on both engines. */
object EwmaStats {

  /** One order-final day: (user_id, epoch_day, x = events that day,
    * n_days so far, ewma_u after folding the day). */
  type DayRow = (Long, Long, Long, Long, Long)

  private val DayUs = 86400000000L

  /** ewmaU: the halving-fold carry (−1 = the batch kernel's seed
    * sentinel, counts ≥ 1 make every real value ≥ 1e6); nDays: days
    * folded; pendDay/pendCnt: parallel arrays of not-yet-final
    * (epoch_day, count). */
  case class EwmaState(ewmaU: Long, nDays: Long,
      pendDay: Array[Long], pendCnt: Array[Long])

  def transform(events: DataFrame, watermark: String): Dataset[DayRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("user_id"))
      .as[(Timestamp, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[EwmaState, DayRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[EwmaState]) =>
          val wmUs = AttributionStats.wmFloorUs(
            state.getCurrentWatermarkMs())
          val prev = state.getOption.getOrElse(EwmaState(-1L, 0L,
            Array.emptyLongArray, Array.emptyLongArray))
          // EXPLICIT late-drop: a row at or below the watermark could
          // belong to an already-folded day
          val addDays = rows.map(r => AttributionStats.micros(r._1))
            .filter(_ > wmUs)
            .map(us => Math.floorDiv(us, DayUs)).toArray
          if (addDays.isEmpty && state.getOption.isEmpty) Iterator.empty
          else {
            val merged = scala.collection.mutable.LongMap
              .from(prev.pendDay.zip(prev.pendCnt))
            addDays.foreach(d =>
              merged.update(d, merged.getOrElse(d, 0L) + 1L))
            val days = merged.keys.toArray.sorted
            val grown = prev.copy(
              pendDay = days, pendCnt = days.map(merged))
            val (folded, out) = fold(grown, wmUs)
            state.update(folded)
            if (folded.pendDay.nonEmpty)
              // earliest instant the fold can progress: the oldest
              // pending day's END (ms-floored; re-parked > wm so the
              // sub-ms sliver self-resolves)
              state.setTimeoutTimestamp(math.max(
                (folded.pendDay.min + 1) * (DayUs / 1000),
                state.getCurrentWatermarkMs() + 1))
            out.iterator.map { case (d, x, n, e) => (user, d, x, n, e) }
          }
      }
  }

  /** Fold every pending day whose END is at or below `upTo` (no
    * admissible event can land in it any more) in day order: each
    * emits (day, x, n_days, ewma_u). Pure → unit-tested directly. */
  private[streaming] def fold(st: EwmaState, upTo: Long)
      : (EwmaState, List[(Long, Long, Long, Long)]) = {
    val idx = st.pendDay.indices
      .filter(i => (st.pendDay(i) + 1) * DayUs <= upTo)
    if (idx.isEmpty) return (st, Nil)
    val ordered = idx.sortBy(st.pendDay)
    var (e, n) = (st.ewmaU, st.nDays)
    val out = List.newBuilder[(Long, Long, Long, Long)]
    ordered.foreach { i =>
      val x = st.pendCnt(i) * 1000000L
      e = if (e == -1L) x else (e + x) / 2
      n += 1
      out += ((st.pendDay(i), st.pendCnt(i), n, e))
    }
    val rest = st.pendDay.indices
      .filterNot(i => (st.pendDay(i) + 1) * DayUs <= upTo)
    (st.copy(
      ewmaU = e, nDays = n,
      pendDay = rest.iterator.map(st.pendDay).toArray,
      pendCnt = rest.iterator.map(st.pendCnt).toArray),
      out.result())
  }

  def start(events: DataFrame, root: String, checkpoint: String,
      watermark: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    transform(events, watermark)
      .toDF("user_id", "day", "x", "n_days", "ewma_u")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", root)
      .outputMode("append")
      .start()
}
