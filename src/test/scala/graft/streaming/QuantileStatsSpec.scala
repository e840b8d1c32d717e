package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming DDSketch histograms: sealed windows ≡ the batch kernel
  * bit-for-bit under shuffled cross-batch arrival, late-drop, and the
  * timer flush of a quiet window — and cross-window bucket sums ≡ the
  * GLOBAL batch sketch (the mergeability the operator exists for). */
class QuantileStatsSpec extends SparkSuite {

  private val WinUs = QuantileStats.WinUs

  test("fold: bucketwise addition, seal-and-tombstone at window end") {
    val none = QuantileStats.QState(
      Array.emptyLongArray, Array.emptyLongArray)
    // open window: additions accumulate, nothing emits
    val (st1, o1) = QuantileStats.fold(none, Array(3L, 5L, 3L), 0L, -1L)
    assert(o1.isEmpty && st1.isDefined)
    assert(st1.get.buckets.sameElements(Array(3L, 5L)) &&
      st1.get.counts.sameElements(Array(2L, 1L)))
    // order-insensitivity: the reversed arrival folds to the same state
    val (st1r, _) = QuantileStats.fold(none, Array(3L, 3L, 5L), 0L, -1L)
    assert(st1r.get.buckets.sameElements(st1.get.buckets) &&
      st1r.get.counts.sameElements(st1.get.counts))
    // watermark past the window end: emit sorted rows, tombstone
    val (st2, o2) = QuantileStats.fold(st1.get, Array(5L), 0L, WinUs)
    assert(st2.isEmpty, "sealed window must tombstone its state")
    assert(o2 == List((0L, 3L, 2L), (0L, 5L, 2L)), o2)
  }

  test("streamed sealed windows ≡ batch kernel; merged ≡ global sketch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // day-1 base, NOT epoch 0 (fMGWS pre-filters rows at or below the
    // watermark, which initializes to 0)
    def ts(minute: Int): Timestamp =
      new Timestamp(86400000L + minute * 60000L)

    val stream = MemoryStream[(Timestamp, Long, Double)]
    val events = stream.toDF().toDF("ts", "user_id", "value")
    val query = QuantileStats.transform(events, watermark = "5 minutes")
      .toDF("win_start_us", "bucket", "c")
      .writeStream.format("memory").queryName("quantile_stats")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()

    // hour 0 split across batches and arriving SHUFFLED (the
    // order-insensitivity the pair rests on); hour 1 sparse; zero and
    // negative values excluded by the log domain on both sides
    val batch1 = Seq((0, 12.31), (5, 0.0), (10, 900.0), (3, 12.31))
    // minutes 6..7 sit above batch1's watermark (10 − 5 = 5) — only
    // the deliberate late probe below is allowed to be late
    val batch2 = Seq((7, 1.63), (40, 12.31), (6, -4.0), (70, 55.5))
    val batch3 = Seq((75, 0.07), (80, 55.5))
    var n = 0L
    def add(b: Seq[(Int, Double)]): Unit = {
      stream.addData(b.map { case (m, v) => (ts(m), { n += 1; n }, v) }: _*)
      query.processAllAvailable()
    }
    add(batch1); add(batch2); add(batch3)
    // flusher: drags the watermark past both windows' ends — they seal;
    // the flusher's own window stays open and emits nothing
    add(Seq((10000, 1.0)))
    add(Seq((15, 12.31))) // late probe: lands in an emitted window
    query.stop()

    val got = spark.table("quantile_stats")
      .as[(Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq

    val orderFinal = (batch1 ++ batch2 ++ batch3).zipWithIndex
      .map { case ((m, v), i) => (ts(m), i.toLong, v) }
      .toDF("ts", "user_id", "value")
    val want = QuantileStats.batchKernel(orderFinal)
      .as[(Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(want.nonEmpty && got == want,
      s"streamed=${got.mkString(",")}\nbatch=${want.mkString(",")}")
    // two sealed windows, cross-batch accumulation really happened
    assert(got.map(_._1).distinct.size == 2)
    assert(got.map(_._3).sum == 8L, "8 positive order-final values")

    // mergeability: summing sealed windows per bucket ≡ the global
    // batch DDSketch of the same rows — the property that lets a
    // reader answer ANY coarser range from the per-hour rows
    val merged = got.groupBy(_._2).view
      .mapValues(_.map(_._3).sum).toMap
    val global = graft.operators.Sketch.ddSketch(
        orderFinal, "value", QuantileStats.Alpha)
      .as[(Long, Long)].collect().toMap
    assert(merged == global,
      s"merged=$merged\nglobal=$global")
  }
}
