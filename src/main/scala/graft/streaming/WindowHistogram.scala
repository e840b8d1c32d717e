package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The ORDER-INSENSITIVE member of the fold family, factored once: a
  * per-tumbling-window histogram of pre-bucketed rows, emitted when the
  * watermark seals the window. [[QuantileStats]] (DDSketch buckets) and
  * [[HitterStats]] (count-min cells) are two map-side bucketing
  * projections over this ONE machine.
  *
  * Why it is its own family: the fold is bucketwise ADDITION —
  * commutative and associative — so unlike the order-final folds
  * (sessions, SCD2, EWMA…) the state needs NO pending (ts, id) slice:
  * arrival order inside the watermark lag cannot change a histogram.
  * The only order-sensitive fact is FINALITY — a window's rows stop
  * arriving once wm ≥ window end (every admissible future arrival has
  * ts > wm) — so emission waits for the watermark and the state
  * tombstones at emit. Bucketing must run MAP-SIDE through the batch
  * kernel's own Catalyst expression (callers share one `bucketed`
  * projection between batch and stream), making sealed windows
  * bit-equal to the batch frame by construction of the plan.
  *
  * Retained state: one sorted (buckets[], counts[]) pair per OPEN
  * window — bounded by the projection's bucket space (DDSketch: the
  * value column's dynamic range; CMS: d·w cells), never by row count —
  * gone the moment the window seals. Explicit late-drop (a late row
  * belongs to an already-emitted histogram), flush timer parked on the
  * window end so a quiet window still seals. */
object WindowHistogram {

  /** (window start epoch-micros, bucket, count) — one sealed histogram
    * row, identical to the caller's batch kernel row. */
  type BucketRow = (Long, Long, Long)

  /** Occupied buckets of ONE open window, parallel-array encoded
    * (bucket ids sorted ascending — emission order is part of the
    * bit-equality contract). */
  case class HState(buckets: Array[Long], counts: Array[Long])

  val empty: HState = HState(Array.emptyLongArray, Array.emptyLongArray)

  /** `bucketed` must carry (ts: timestamp, win_start_us: long,
    * bucket: long) produced by the SAME Catalyst projection the batch
    * kernel aggregates — and must already have the watermark set. */
  def transform(bucketed: DataFrame, winUs: Long): Dataset[BucketRow] = {
    val spark = bucketed.sparkSession
    import spark.implicits._
    bucketed
      .as[(Timestamp, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[HState, BucketRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (winStart, rows, state: GroupState[HState]) =>
          val wmUs = AttributionStats.wmFloorUs(
            state.getCurrentWatermarkMs())
          // EXPLICIT late-drop: a row at or below the watermark could
          // belong to a window whose histogram already emitted (state
          // gone — re-folding it would resurrect a partial duplicate)
          val add = rows.filter(r =>
              AttributionStats.micros(r._1) > wmUs)
            .map(_._3).toArray
          val prev = state.getOption.getOrElse(empty)
          if (add.isEmpty && state.getOption.isEmpty) Iterator.empty
          else {
            val (next, out) = fold(prev, add, winStart, winUs, wmUs)
            next match {
              case Some(st) =>
                state.update(st)
                // flush timer on the window end: a window nobody
                // writes to again must still seal; raw wm lower bound
                state.setTimeoutTimestamp(math.max(
                  (winStart + winUs) / 1000L + 1,
                  state.getCurrentWatermarkMs() + 1))
              case None => state.remove() // sealed: tombstone
            }
            out.iterator
          }
      }
  }

  /** Pure fold: bucketwise addition of this batch's bucket ids, then
    * emit-and-tombstone iff the watermark passed the window end (no
    * admissible arrival can land in it again). Pure → unit-tested and
    * GC-driven directly. */
  def fold(st: HState, add: Array[Long], winStart: Long, winUs: Long,
      wmUs: Long): (Option[HState], List[BucketRow]) = {
    val m = scala.collection.mutable.TreeMap.empty[Long, Long]
    st.buckets.indices.foreach(i => m.update(st.buckets(i), st.counts(i)))
    add.foreach(b => m.update(b, m.getOrElse(b, 0L) + 1L))
    if (wmUs >= winStart + winUs)
      (None, m.iterator.map { case (b, c) => (winStart, b, c) }.toList)
    else
      (Some(HState(m.keysIterator.toArray, m.valuesIterator.toArray)),
        Nil)
  }
}
