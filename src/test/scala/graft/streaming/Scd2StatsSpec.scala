package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming SCD2: closed validity intervals emitted the moment the
  * next (user, type) observation becomes order-final — equal to the
  * batch q_scd2 kernel's `valid_to IS NOT NULL` rows on the same
  * (non-late) events, under shuffled cross-batch arrival, a version
  * opened a batch before its closer (cross-fold carry), same-ts
  * event_id tie-breaks, late-drop, and the timeout flush for quiet
  * keys. The batch side runs the SAME factored kernel the declared
  * query uses, so the pair cannot drift. */
class Scd2StatsSpec extends SparkSuite {

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")

  private def us(m: Int): Long = ts(m).getTime * 1000L

  test("fold: order, carry, tie-break, open-version retention") {
    // three observations fold in ts order: first opens, second closes
    // first and opens, third closes second
    val st0 = Scd2Stats.Scd2State(Long.MinValue, 0L,
      Array(us(5), us(1), us(3)), Array(3L, 1L, 2L))
    val (st1, o1) = Scd2Stats.fold(st0, us(3))
    assert(o1 == List((1L, us(1), us(3))))
    assert(st1.openUs == us(3) && st1.openId == 2L)
    assert(st1.pendUs.toSeq == Seq(us(5)))
    // cross-fold carry: the pending event closes the version opened a
    // fold earlier
    val (st2, o2) = Scd2Stats.fold(st1, Long.MaxValue)
    assert(o2 == List((2L, us(3), us(5))))
    assert(st2.openUs == us(5) && st2.openId == 3L && st2.pendUs.isEmpty)
    // same-ts tie-break: smaller event_id is the earlier version — it
    // closes at the same instant (zero-width interval, the batch
    // kernel's lead() semantics exactly)
    val (_, ot) = Scd2Stats.fold(
      Scd2Stats.Scd2State(Long.MinValue, 0L,
        Array(us(7), us(7)), Array(10L, 9L)), Long.MaxValue)
    assert(ot == List((9L, us(7), us(7))))
    // nothing final → nothing emitted, nothing lost
    val (stN, oN) = Scd2Stats.fold(st0, Long.MinValue)
    assert(oN.isEmpty && stN.pendUs.length == 3)
  }

  test("streamed closed intervals ≡ batch q_scd2 kernel") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[(Timestamp, Long, Long, String)]
    val events = stream.toDF().toDF("ts", "user_id", "event_id",
      "event_type")
    val query = Scd2Stats.transform(events, watermark = "5 minutes")
      .toDF("user_id", "event_type", "event_id", "valid_from", "valid_to")
      .writeStream.format("memory").queryName("scd2_stats")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()

    // (user, event_id, type, minute) — u1 interleaves two types (each
    // its own dimension history); u2's opener arrives a batch AFTER a
    // later observation (shuffled arrival, still above the watermark);
    // u3 has a same-ts tie; u9 is the quiet key the timer must flush
    val batch1 = Seq(
      (1L, 10L, "view", 10), (1L, 11L, "click", 12),
      (2L, 21L, "view", 11),
      (3L, 31L, "view", 2), (3L, 30L, "view", 2)) // same-ts tie
    val batch2 = Seq(
      (2L, 20L, "view", 9),  // out-of-order opener: above wm (7)
      (1L, 12L, "view", 40), // closes u1's view@10
      (9L, 90L, "view", 60)) // watermark → 55
    val batch3 = Seq((1L, 13L, "view", 58), (9L, 91L, "view", 61))
    def add(b: Seq[(Long, Long, String, Int)]): Unit = {
      stream.addData(b.map { case (u, i, e, m) => (ts(m), u, i, e) }: _*)
      query.processAllAvailable()
    }
    add(batch1); add(batch2); add(batch3)
    add(Seq((9L, 92L, "view", 300))) // watermark 295: flushes all ≤ 295
    // late probe far below the watermark: must neither emit nor re-cut
    // already-closed history
    add(Seq((1L, 14L, "view", 20)))
    query.stop()

    val got = spark.table("scd2_stats")
      .selectExpr("user_id", "event_type", "event_id", "valid_from",
        "valid_to")
      .as[(Long, String, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2, r._4, r._3)).toSeq

    // batch kernel over the ORDER-FINAL events: the late probe (below
    // the watermark) and the minute-300 flusher (above it — the stream
    // cannot have closed an interval with a not-yet-final closer) are
    // both excluded; closed rows only — the open version per key is
    // state, not output
    val orderFinal = (batch1 ++ batch2 ++ batch3)
      .map { case (u, i, e, m) => (ts(m), u, i, e) }
      .toDF("ts", "user_id", "event_id", "event_type")
    val want = graft.queries.Streaming.scd2(orderFinal)
      .filter("valid_to IS NOT NULL")
      .selectExpr("user_id", "event_type", "event_id", "valid_from",
        "valid_to")
      .as[(Long, String, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2, r._4, r._3)).toSeq

    assert(want.nonEmpty && got == want,
      s"streamed=${got.mkString(",")}\nbatch=${want.mkString(",")}")
    // the quiet key's timer flush actually happened: u9's 60→61
    // interval is present even though no u9 event followed in-batch
    assert(got.exists(r => r._1 == 9L && r._3 == 90L && r._5 == us(61)))
  }
}
