package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming per-user daily gap-fill with LOCF — the continuous form
  * of [[graft.queries.Behavior]]'s `q_gapfill_locf`: the moment a UTC
  * day becomes order-final for a user, one row per GRID day since the
  * user's previous emission lands irreversibly — silent days as
  * (n = 0, v_locf = carry), the observed day as (its count, its value
  * sum, which becomes the new carry). The emitted rows are exactly the
  * batch kernel's grid rows up to the last order-final observed day
  * (the batch grid ends at max(day), which streaming reaches once that
  * day is final) — the dense daily activity table dashboards and
  * silence-detection monitors consume without re-running a grid join.
  *
  * The [[EwmaStats]] day-bucketed order-final fold with a
  * LOCF-carry twist. Retained state is O(1) — the last emitted grid
  * day + the carry — plus the pending not-yet-final (day, count,
  * value-sum) slice bounded by watermark lag in days. A long silence
  * costs OUTPUT rows (as it does in batch — the grid is the product's
  * contract), never state.
  *
  * Determinism: a day's value sum accumulates in exact DECIMAL(12,4)
  * fixed point (value·1e4 as BIGINT) and converts to double ONCE at
  * emission — (exact long) / 1e4 is one correctly-rounded IEEE
  * division, the same nearest-double the batch kernel's
  * CAST(sum(DECIMAL) AS DOUBLE) produces, so streamed v_locf is
  * bit-equal to batch. Late rows drop explicitly (one could belong to
  * an already-emitted day); the watermark floors to −∞ until observed
  * (ADVICE r13); the flush timer parks on the oldest pending day's
  * end. */
object GapfillStats {

  /** One order-final grid day:
    * (user_id, epoch_day, n, v_locf — None until a value is seen). */
  type GridRow = (Long, Long, Long, Option[Double])

  private val DayUs = 86400000000L

  /** lastDay: last emitted grid day (MinValue before any); carryFp:
    * last non-null day value-sum in 1e-4 fixed point (valid iff
    * hasCarry); pend*: parallel arrays of not-yet-final days — count,
    * value-sum fixed point, and whether any non-null value was seen
    * (a day of all-null values contributes a null v, like the batch
    * SUM). */
  case class GapState(lastDay: Long, carryFp: Long, hasCarry: Boolean,
      pendDay: Array[Long], pendN: Array[Long], pendFp: Array[Long],
      pendHasV: Array[Boolean])

  def transform(events: DataFrame, watermark: String): Dataset[GridRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("user_id"),
        (col("value").cast("decimal(12,4)") * 10000).cast("long")
          .as("v_fp"))
      .as[(Timestamp, Long, Option[Long])]
      .groupByKey(_._2)
      .flatMapGroupsWithState[GapState, GridRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[GapState]) =>
          val wmUs = AttributionStats.wmFloorUs(
            state.getCurrentWatermarkMs())
          val prev = state.getOption.getOrElse(GapState(Long.MinValue,
            0L, hasCarry = false, Array.emptyLongArray,
            Array.emptyLongArray, Array.emptyLongArray,
            Array.empty[Boolean]))
          // EXPLICIT late-drop: a row at or below the watermark could
          // belong to a grid day already emitted
          val add = rows
            .map(r => (AttributionStats.micros(r._1), r._3))
            .filter(_._1 > wmUs)
            .map { case (us, v) => (Math.floorDiv(us, DayUs), v) }
            .toArray
          if (add.isEmpty && state.getOption.isEmpty) Iterator.empty
          else {
            val byDay = scala.collection.mutable.LongMap[(Long, Long,
              Boolean)]()
            prev.pendDay.indices.foreach(i => byDay(prev.pendDay(i)) =
              (prev.pendN(i), prev.pendFp(i), prev.pendHasV(i)))
            add.foreach { case (d, v) =>
              val (n0, f0, h0) = byDay.getOrElse(d, (0L, 0L, false))
              byDay(d) = (n0 + 1, f0 + v.getOrElse(0L), h0 || v.isDefined)
            }
            val days = byDay.keys.toArray.sorted
            val grown = prev.copy(
              pendDay = days, pendN = days.map(byDay(_)._1),
              pendFp = days.map(byDay(_)._2),
              pendHasV = days.map(byDay(_)._3))
            val (folded, out) = fold(grown, wmUs)
            state.update(folded)
            if (folded.pendDay.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                (folded.pendDay.min + 1) * (DayUs / 1000),
                state.getCurrentWatermarkMs() + 1))
            out.iterator.map { case (d, n, v) => (user, d, n, v) }
          }
      }
  }

  /** Fold every pending day whose END is at or below `upTo`, in day
    * order: backfill the grid from lastDay+1 with (0, carry), then the
    * observed day with its own count and value (the new carry when any
    * value was non-null). Pure → unit-tested directly. */
  private[streaming] def fold(st: GapState, upTo: Long)
      : (GapState, List[(Long, Long, Option[Double])]) = {
    val idx = st.pendDay.indices
      .filter(i => (st.pendDay(i) + 1) * DayUs <= upTo)
    if (idx.isEmpty) return (st, Nil)
    val ordered = idx.sortBy(st.pendDay)
    var (lastDay, carryFp, hasCarry) = (st.lastDay, st.carryFp,
      st.hasCarry)
    def carry: Option[Double] =
      if (hasCarry) Some(carryFp.toDouble / 1e4) else None
    val out = List.newBuilder[(Long, Long, Option[Double])]
    ordered.foreach { i =>
      val d = st.pendDay(i)
      if (lastDay != Long.MinValue) {
        var g = lastDay + 1
        while (g < d) { out += ((g, 0L, carry)); g += 1 }
      }
      if (st.pendHasV(i)) { carryFp = st.pendFp(i); hasCarry = true }
      out += ((d, st.pendN(i), carry))
      lastDay = d
    }
    val rest = st.pendDay.indices
      .filterNot(i => (st.pendDay(i) + 1) * DayUs <= upTo)
    (st.copy(
      lastDay = lastDay, carryFp = carryFp, hasCarry = hasCarry,
      pendDay = rest.iterator.map(st.pendDay).toArray,
      pendN = rest.iterator.map(st.pendN).toArray,
      pendFp = rest.iterator.map(st.pendFp).toArray,
      pendHasV = rest.iterator.map(st.pendHasV).toArray),
      out.result())
  }

  def start(events: DataFrame, root: String, checkpoint: String,
      watermark: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    transform(events, watermark)
      .toDF("user_id", "day", "n", "v_locf")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", root)
      .outputMode("append")
      .start()
}
