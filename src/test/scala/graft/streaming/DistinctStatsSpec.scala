package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.operators.Sketch

/** Streaming KMV contract: each closed window's landed rows are
  * BIT-FOR-BIT the batch `Sketch.kmv` of that window's items (the
  * sketch is an exact set property, so stream/batch parity is an
  * identity, not a tolerance), emission is exactly-once at watermark
  * passage, late data drops, state stays ≤ k per window, and the
  * distinct readout is exact below k. */
class DistinctStatsSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("per-window rows equal the batch kmv bit-for-bit; late drops; " +
      "k bounds the output") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 64

    val stream = MemoryStream[(Timestamp, String)]
    val items = stream.toDF().toDF("ts", "item")
    val out = DistinctStats.transform(items, col("item"),
      watermark = "10 minutes", windowLen = "10 minutes", k = k)
      .toDF("win_start", "h")
    val query = out.writeStream
      .format("memory").queryName("distinct_stats")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    // window 1 [10:00,10:10): 300 distinct items (> k) with repeats,
    // fed across TWO micro-batches (state must carry between batches)
    val w1a = (0 until 200).map(i => (ts(i % 10), s"w1_$i"))
    val w1b = (100 until 300).map(i => (ts(i % 10), s"w1_$i"))
    stream.addData(w1a: _*)
    query.processAllAvailable()
    stream.addData(w1b: _*)
    query.processAllAvailable()
    // nothing emitted until the watermark closes the window
    assert(spark.table("distinct_stats").isEmpty)
    // window 2 [10:30,10:40): 40 distinct (< k) — also advances the
    // watermark to 10:30 − 10m = 10:20, closing window 1
    val w2 = (0 until 40).map(i => (ts(30 + i % 10), s"w2_$i"))
    stream.addData(w2: _*)
    query.processAllAvailable()
    // late row for the closed window 1 — must not change its sketch
    stream.addData((ts(5), "w1_LATE"))
    query.processAllAvailable()
    // advance the watermark past window 2's end
    stream.addData((ts(55), "w3_x"))
    query.processAllAvailable()
    query.stop()

    val landed = spark.table("distinct_stats")
      .select(col("win_start").cast("string"), col("h"))
      .as[(String, Long)].collect()

    // window 1: exactly the batch kmv of its 300 distinct items
    val batch1 = Sketch.kmv(
      (0 until 300).map(i => s"w1_$i").toDF("item"), "item", k)
      .as[Long].collect().toSeq.sorted
    val got1 = landed.filter(_._1 == "2024-01-01 10:00:00")
      .map(_._2).toSeq.sorted
    assert(got1 == batch1, "window 1 diverged from the batch sketch")
    assert(got1.size == k) // > k distincts -> exactly k rows

    // window 2: < k distincts -> the full distinct hash set
    val batch2 = Sketch.kmv(
      (0 until 40).map(i => s"w2_$i").toDF("item"), "item", k)
      .as[Long].collect().toSeq.sorted
    val got2 = landed.filter(_._1 == "2024-01-01 10:30:00")
      .map(_._2).toSeq.sorted
    assert(got2 == batch2, "window 2 diverged from the batch sketch")
    assert(got2.size == 40)

    // readout: exact below k, (k-1)/theta band above
    val est = DistinctStats.distinctByWindow(
      spark.table("distinct_stats"), k)
      .select(col("win_start").cast("string"), col("est"))
      .as[(String, Double)].collect().toMap
    assert(est("2024-01-01 10:30:00") == 40.0)
    val e1 = est("2024-01-01 10:00:00")
    assert(math.abs(e1 - 300) / 300.0 <= 3.0 / math.sqrt(k - 2.0),
      s"window-1 estimate $e1 outside the SE band around 300")
  }
}
