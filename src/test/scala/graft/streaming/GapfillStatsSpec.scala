package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming LOCF gap-fill: one row per order-final grid day — equal
  * to the batch q_gapfill_locf kernel on the same order-final events,
  * run through the SAME factored code, under cross-batch same-day
  * merging, multi-day silences (grid backfill with the carried value),
  * all-null value days, late-drop, and the quiet-user timer flush. */
class GapfillStatsSpec extends SparkSuite {

  private def ts(d: Int, h: Int): Timestamp =
    new Timestamp((19723L + d) * 86400000L + h * 3600000L)

  test("fold: backfill, carry, own-day value, all-null day, finality") {
    val DayUs = 86400000000L
    // observed days 3 and 7 (gap 4..6), values 2.5 and 1.25
    val st0 = GapfillStats.GapState(Long.MinValue, 0L, hasCarry = false,
      Array(3L, 7L), Array(2L, 1L), Array(25000L, 12500L),
      Array(true, true))
    // wm inside day 7: only day 3 final — no backfill before the first
    // observed day, own value becomes the carry
    val (st1, o1) = GapfillStats.fold(st0, 7L * DayUs)
    assert(o1 == List((3L, 2L, Some(2.5))))
    assert(st1.lastDay == 3L && st1.carryFp == 25000L && st1.hasCarry)
    // day 7 folds: gap days 4..6 backfill with the 2.5 carry, then
    // day 7 with its own 1.25
    val (st2, o2) = GapfillStats.fold(st1, Long.MaxValue)
    assert(o2 == List((4L, 0L, Some(2.5)), (5L, 0L, Some(2.5)),
      (6L, 0L, Some(2.5)), (7L, 1L, Some(1.25))))
    assert(st2.lastDay == 7L && st2.carryFp == 12500L)
    // an all-null-value day keeps the previous carry (batch SUM = NULL
    // → last(ignoreNulls) carries), and a pre-carry user emits None
    val (_, oN) = GapfillStats.fold(
      GapfillStats.GapState(Long.MinValue, 0L, hasCarry = false,
        Array(1L, 2L), Array(1L, 1L), Array(0L, 30000L),
        Array(false, true)), Long.MaxValue)
    assert(oN == List((1L, 1L, None), (2L, 1L, Some(3.0))))
  }

  test("streamed grid ≡ batch kernel on order-final days") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[(Timestamp, Long, Long, Option[Double])]
    val events = stream.toDF().toDF("ts", "user_id", "event_id", "value")
    val query = GapfillStats.transform(events, watermark = "2 hours")
      .toDF("user_id", "day", "n", "v_locf")
      .writeStream.format("memory").queryName("gapfill_stats")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()

    // (user, day, hour, value): u1 splits day 0 across batches then
    // goes silent through day 4; u2 opens with an all-null day; u9 is
    // the quiet user the timer must flush
    val batch1 = Seq((1L, 0, 3, Some(1.5)), (2L, 0, 4, None),
      (9L, 0, 2, Some(7.25)))
    val batch2 = Seq((1L, 0, 7, Some(2.0)), (2L, 1, 1, Some(4.5)))
    val batch3 = Seq((1L, 5, 6, Some(0.125)), (2L, 3, 2, None))
    var id = 100L
    def add(b: Seq[(Long, Int, Int, Option[Double])]): Unit = {
      stream.addData(b.map { case (u, d, h, v) =>
        id += 1; (ts(d, h), u, id, v) }: _*)
      query.processAllAvailable()
    }
    add(batch1); add(batch2); add(batch3)
    add(Seq((42L, 9, 0, Some(1.0)))) // flusher: finalizes days ≤ 7
    add(Seq((1L, 0, 6, Some(9.9)))) // late probe: day 0 already emitted
    query.stop()

    val got = spark.table("gapfill_stats")
      .selectExpr("user_id", "day", "n", "v_locf")
      .as[(Long, Long, Long, Option[Double])].collect()
      .sortBy(r => (r._1, r._2)).toSeq

    id = 100L
    val orderFinal = (batch1 ++ batch2 ++ batch3)
      .map { case (u, d, h, v) => id += 1; (ts(d, h), u, id, v) }
      .toDF("ts", "user_id", "event_id", "value")
    val want = graft.queries.Behavior.gapfillLocf(orderFinal)
      .selectExpr("user_id", "unix_date(day)", "n", "v_locf")
      .as[(Long, Long, Long, Option[Double])].collect()
      .sortBy(r => (r._1, r._2)).toSeq

    assert(want.nonEmpty && got == want,
      s"streamed=${got.mkString(",")}\nbatch=${want.mkString(",")}")
    // the silence really backfilled: u1 has five grid days 0..5, the
    // middle four carrying day 0's 3.5 sum with n = 0
    val u1 = got.filter(_._1 == 1L)
    assert(u1.map(_._2 - 19723L) == Seq(0L, 1L, 2L, 3L, 4L, 5L))
    assert(u1.tail.init.forall(r => r._3 == 0L && r._4 == Some(3.5)))
    // u2's all-null opener emitted None, then the carry took over
    assert(got.filter(_._1 == 2L).map(_._4) ==
      Seq(None, Some(4.5), Some(4.5), Some(4.5)))
  }
}
