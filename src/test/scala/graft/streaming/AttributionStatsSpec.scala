package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming attribution: one emitted row per order-final purchase,
  * crediting the last prior non-purchase inside the lookback — equal
  * to the batch q_attribution rollup on the same (non-late) events,
  * under shuffled cross-batch arrival, a touch folding a batch before
  * its purchase (cross-fold carry), the inclusive lookback boundary,
  * same-ts event_id tie-breaks, late-drop, and the timeout flush for
  * quiet users. */
class AttributionStatsSpec extends SparkSuite {

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")

  private def us(m: Int): Long = ts(m).getTime * 1000L

  test("micros: exact epoch micros on both sides of 1970") {
    // epoch-ms constructor (TZ-independent, unlike Timestamp.valueOf);
    // setNanos refines the sub-second part
    def t(ms: Long, nanos: Int = -1): Timestamp = {
      val ts = new Timestamp(ms)
      if (nanos >= 0) ts.setNanos(nanos)
      ts
    }
    assert(AttributionStats.micros(t(1704103200000L, 123000)) ==
      1704103200000123L)
    assert(AttributionStats.micros(t(500L)) == 500000L)
    // pre-1970 fractional second: floorDiv keeps −0.5 s at −500000 µs
    // (plain / would sign-flip it to +500000)
    assert(AttributionStats.micros(t(-500L)) == -500000L)
    assert(AttributionStats.micros(t(-1000L, 1000)) == -1000000L + 1L)
  }

  test("fold: order, carry, boundary, same-ts tie-break, retention") {
    // lookback 10 minutes (600s) in micros
    val lb = 600L * 1000000
    val st0 = AttributionStats.AttrState(Long.MinValue, "",
      Array(us(5), us(1), us(3)), Array(1L, 2L, 3L),
      Array("purchase", "view", "purchase"))
    // fold to minute 3: view(1) → purchase(3) credits view;
    // purchase(5) stays pending
    val (st1, o1) = AttributionStats.fold(st0, us(3), lb)
    assert(o1 == List(("view", us(3))))
    assert(st1.touchTy == "view" && st1.pendTy.toSeq == Seq("purchase"))
    // cross-fold carry: the pending purchase credits the view folded
    // a round earlier
    val (st2, o2) = AttributionStats.fold(st1, Long.MaxValue, lb)
    assert(o2 == List(("view", us(5))))
    assert(st2.pendUs.isEmpty && st2.touchTy == "view")
    // boundary: touch EXACTLY lookback before the purchase counts;
    // one microsecond further is direct
    val (_, ob) = AttributionStats.fold(
      AttributionStats.AttrState(Long.MinValue, "",
        Array(us(0), us(0) + lb, us(0) + lb + 1),
        Array(1L, 2L, 3L), Array("click", "purchase", "purchase")),
      Long.MaxValue, lb)
    assert(ob == List(("click", us(0) + lb), ("direct", us(0) + lb + 1)))
    // same-ts tie-break: touch with the SMALLER event_id is prior
    val (_, ot) = AttributionStats.fold(
      AttributionStats.AttrState(Long.MinValue, "",
        Array(us(7), us(7)), Array(10L, 9L),
        Array("purchase", "error")),
      Long.MaxValue, lb)
    assert(ot == List(("error", us(7))), ot.toString)
    // purchase before any touch → direct
    val (_, od) = AttributionStats.fold(
      AttributionStats.AttrState(Long.MinValue, "",
        Array(us(2)), Array(1L), Array("purchase")),
      Long.MaxValue, lb)
    assert(od == List(("direct", us(2))))
  }

  test("streamed attributions ≡ batch rollup under shuffled arrival") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[(Timestamp, Long, Long, String)]
    val events = stream.toDF().toDF("ts", "user_id", "event_id",
      "event_type")
    val query = AttributionStats
      .transform(events, watermark = "5 minutes",
        lookbackUs = 30L * 60 * 1000000) // 30-minute lookback
      .toDF("user_id", "touch_type", "purchase_us")
      .writeStream.format("memory").queryName("attr_stats")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()

    // (user, event_id, type, minute)
    val batch1 = Seq(
      (1L, 10L, "click", 10), (1L, 11L, "purchase", 12),
      (2L, 21L, "purchase", 11), // u2's view arrives NEXT batch, earlier ts
      (3L, 31L, "view", 2))
    val batch2 = Seq(
      (2L, 20L, "view", 9),       // out-of-order: still above wm (7)
      (3L, 32L, "purchase", 40),  // 38 min after the view → direct
      (99L, 90L, "view", 60))     // watermark → 55
    // u1 buys again at 58: its minute-10 click is 48 min stale → direct;
    // u99's purchase right after its view
    val batch3 = Seq((1L, 12L, "purchase", 58), (99L, 91L, "purchase", 61))
    def add(b: Seq[(Long, Long, String, Int)]): Unit = {
      stream.addData(b.map { case (u, i, e, m) => (ts(m), u, i, e) }: _*)
      query.processAllAvailable()
    }
    add(batch1); add(batch2); add(batch3)
    add(Seq((99L, 92L, "view", 300))) // watermark 295: flushes all ≤ 295
    // late probe far below the watermark: must attribute nothing and
    // must NOT become a touch for anything already emitted
    add(Seq((1L, 13L, "view", 20)))
    query.stop()

    val got = spark.table("attr_stats")
      .selectExpr("user_id", "touch_type", "purchase_us")
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._3)).toSeq

    assert(got == Seq(
      (1L, "click", us(12)),   // within 30 min
      (1L, "direct", us(58)),  // stale click → direct
      (2L, "view", us(11)),    // out-of-order touch still credited
      (3L, "direct", us(40)),  // 38 min > lookback
      (99L, "view", us(61))    // quiet user flushed via the timer
    ), got.mkString(", "))
  }
}
