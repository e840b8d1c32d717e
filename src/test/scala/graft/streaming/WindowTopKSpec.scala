package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming windowed top-k contract: sealed counts + rank equal the
  * batch q_stream_topk core on the same (non-late) events, under
  * shuffled cross-batch arrival (a window's rows split across
  * micro-batches, out of event-time order), exactly-once emission at
  * seal, and late-row drop after seal. */
class WindowTopKSpec extends SparkSuite {

  private def ts(m: Int): Timestamp = // minute m past 10:00
    Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")

  /** Batch reference: the q_stream_topk core (rank per window on
    * (n desc, type asc)) over a plain DataFrame. */
  private def batchTopK(evs: Seq[(Timestamp, String)], k: Int)
      : Set[(String, String, Long, Int)] = {
    import spark.implicits._
    val counts = evs.toDF("ts", "event_type")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"))
    WindowTopK.rank(counts, k)
      .select(col("ws").cast("string"), col("event_type"), col("n"),
        col("rnk"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
  }

  test("streamed sealed counts + rank ≡ batch; shuffled arrival; late drop") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // two 10-min windows; [10:00) has view×3, click×2, error×2 (view
    // ranks 1, click/error tie on n=2 → type asc: click 2, error 3);
    // [10:10) has click×2, view×1
    val w0: Seq[(Timestamp, String)] = Seq(
      ts(1) -> "view", ts(2) -> "click", ts(3) -> "view",
      ts(4) -> "error", ts(8) -> "view", ts(9) -> "click",
      ts(5) -> "error")
    val w1: Seq[(Timestamp, String)] = Seq(
      ts(11) -> "click", ts(15) -> "click", ts(12) -> "view")

    val stream = MemoryStream[(Timestamp, String)]
    val counts = WindowTopK.counts(
      stream.toDF().toDF("ts", "event_type"),
      windowLen = "10 minutes", watermark = "5 minutes")
    val query = counts.writeStream
      .format("memory").queryName("wtopk")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    // shuffled cross-batch arrival: w0 rows interleaved with early w1
    // rows, out of event-time order within and across batches
    stream.addData(w0(4), w0(0), w1(2))
    query.processAllAvailable()
    stream.addData(w0(2), w0(6), w0(1), w0(3))
    query.processAllAvailable()
    stream.addData(w0(5), w1(0))
    query.processAllAvailable()
    // advance the watermark past 10:10 → w0 seals (emitted once)
    stream.addData(w1(1), ts(16) -> "view")
    query.processAllAvailable()
    // LATE row for sealed w0: must be dropped by the windowed agg
    // (the watermark lags one batch: this batch runs at 10:16 − 5m =
    // 10:11, which both drops the 10:03 row and seals w0)
    stream.addData(ts(3) -> "click")
    query.processAllAvailable()
    // advance past 10:20+wm → w1 seals (two batches: the first carries
    // the 10:40 event, the second runs AT the advanced watermark)
    stream.addData(ts(40) -> "view")
    query.processAllAvailable()
    stream.addData(ts(41) -> "view")
    query.processAllAvailable()
    query.stop()

    val sealedRanked = WindowTopK.rank(spark.table("wtopk"), 3)
      .select(col("ws").cast("string"), col("event_type"), col("n"),
        col("rnk"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet

    // batch reference over the SAME non-late events (w0 ++ w1 + the
    // watermark-advancers; the late click is excluded)
    val ref = batchTopK(
      w0 ++ w1 ++ Seq(ts(16) -> "view", ts(40) -> "view",
        ts(41) -> "view"), 3)
    // the last window (10:40) never seals — compare on sealed windows
    val sealedWs = sealedRanked.map(_._1)
    assert(sealedWs == Set("2024-01-01 10:00:00", "2024-01-01 10:10:00"))
    assert(sealedRanked == ref.filter(r => sealedWs.contains(r._1)),
      s"streamed $sealedRanked vs batch $ref")
    // tie-break pin: click and error both n=2 in w0 → click ranks 2
    assert(sealedRanked.contains(("2024-01-01 10:00:00", "view", 3L, 1)))
    assert(sealedRanked.contains(("2024-01-01 10:00:00", "click", 2L, 2)))
    assert(sealedRanked.contains(("2024-01-01 10:00:00", "error", 2L, 3)))
  }
}
