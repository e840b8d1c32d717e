package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming per-user rolling anomaly monitor — the continuous form of
  * [[graft.queries.Behavior]]'s `q_rolling_anomaly`: a user's day is
  * flagged when its event count x satisfies the integer z-inequality
  * (n·x−s)² > 4(n·q−s²) over the trailing ≤ 7 OBSERVED days (n ≥ 4),
  * emitted exactly once when the watermark seals the day.
  *
  * Why one stateful operator and not windowed-count → stateful:
  * `flatMapGroupsWithState` cannot follow a streaming aggregation, so
  * the daily count lives INSIDE the state: per user, a map of open
  * days (day → running count) plus a ring of the last 6 sealed
  * (day, x) pairs. A day seals when the event-time timeout fires past
  * its end — at that point the watermark guarantees its count is
  * final (later events for it would be late and dropped), the
  * anomaly test runs against the ring, and the day enters the ring.
  *
  * State bound: ≤ 6 sealed pairs + the open days inside the watermark
  * lag — a handful of longs per user, independent of stream length.
  * Sealed history is retained (not GC'd) deliberately: the batch
  * semantics window over OBSERVED days across arbitrary gaps, and
  * evicting the ring would silently change n for a returning user.
  *
  * AnomalyStatsSpec pins streamed flags ≡ the batch query's integer
  * inequality on the same events, across micro-batch splits and
  * out-of-order arrival within the watermark. */
object AnomalyStats {

  /** (user_id, day, x, n) for each flagged day. */
  type Flag = (Long, Timestamp, Long, Long)

  /** (open days as epochDay*2^32+count, sealed ring likewise, oldest
    * first). */
  private type S = (Array[Long], Array[Long])

  private val DayMs = 86400000L

  def transform(events: DataFrame, watermark: String): Dataset[Flag] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("user_id"))
      .as[(Timestamp, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[S, Flag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[S]) =>
          val (open0, sealed0) =
            state.getOption.getOrElse((Array.emptyLongArray, Array.emptyLongArray))
          val wm = AttributionStats.wmFloorMs(
            state.getCurrentWatermarkMs())
          // merge arriving events into the open-day counts — EXPLICIT
          // late-drop first (r14): a row at or below the watermark
          // belongs to a day the seal below may already have consumed;
          // admitting it would re-open and re-seal that day (duplicate
          // flag, partial count). The floor also keeps the seal from
          // treating pre-epoch days as final before any watermark
          // exists (ADVICE r13).
          val open = scala.collection.mutable.LongMap[Long]()
          open0.foreach(p => open(p >>> 32) = p & 0xffffffffL)
          rows.filter(_._1.getTime > wm).foreach { case (t, _) =>
            val day = Math.floorDiv(t.getTime, DayMs)
            open(day) = open.getOrElse(day, 0L) + 1L
          }
          // seal every open day whose end the watermark has passed, in
          // day order — the anomaly test sees days exactly as the
          // batch window does
          val (done, still) = open.toArray.sortBy(_._1)
            .partition { case (day, _) => (day + 1) * DayMs <= wm }
          var ring = sealed0
          val out = Seq.newBuilder[Flag]
          done.foreach { case (day, x) =>
            val frame = ring.map(_ & 0xffffffffL) :+ x
            val n = frame.length.toLong
            val s = frame.sum
            val q = frame.map(v => v * v).sum
            if (n >= 4 && (n * x - s) * (n * x - s) > 4 * (n * q - s * s))
              out += ((user, new Timestamp(day * DayMs), x, n))
            ring = (ring :+ (day << 32 | x)).takeRight(6)
          }
          if (still.isEmpty && ring.isEmpty) state.remove()
          else {
            state.update((still.map { case (d, c) => d << 32 | c }, ring))
            // wake when the earliest open day can seal; with no open
            // days the ring just waits for the user's next event
            if (still.nonEmpty)
              // raw watermark bound: the floored −∞ would underflow
              // the timer's must-be-past-the-watermark contract
              state.setTimeoutTimestamp(math.max(
                (still.head._1 + 1) * DayMs,
                state.getCurrentWatermarkMs() + 1))
          }
          out.result().iterator
      }
  }

  def start(events: DataFrame, root: String, checkpoint: String,
      watermark: String = "1 hour",
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    transform(events, watermark)
      .toDF("user_id", "day", "x", "n")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", root)
      .outputMode("append")
      .start()
}
