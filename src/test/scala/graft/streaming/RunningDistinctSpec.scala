package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming running-distinct: one (day, +1) delta per user at the
  * moment their first-seen day becomes order-final — summed per day ≡
  * the batch q_running_distinct kernel on the same order-final events,
  * under shuffled cross-batch arrival, cross-batch candidate lowering
  * (a user's earliest event arriving AFTER a later one), late-drop,
  * and the quiet-user timer flush. */
class RunningDistinctSpec extends SparkSuite {

  private def ts(d: Int, h: Int): Timestamp =
    new Timestamp((19723L + d) * 86400000L + h * 3600000L)

  test("fold: candidate lowering, finality, one-bit terminal state") {
    val DayUs = 86400000000L
    val none = RunningDistinctStats.SeenState(seen = false, Long.MaxValue)
    // candidate arrives inside the lag: retained, nothing emitted
    val (st1, o1) = RunningDistinctStats.fold(none, 5L * DayUs + 7L, 0L)
    assert(o1.isEmpty && !st1.seen && st1.pendUs == 5L * DayUs + 7L)
    // a later batch brings an EARLIER (non-late) event: candidate drops
    val (st2, o2) = RunningDistinctStats.fold(st1, 3L * DayUs + 1L, 0L)
    assert(o2.isEmpty && st2.pendUs == 3L * DayUs + 1L)
    // watermark passes the candidate: the first-day delta, exactly once
    val (st3, o3) = RunningDistinctStats.fold(st2, Long.MaxValue,
      3L * DayUs + 1L)
    assert(o3 == Some((3L, 1L)) && st3.seen)
    // terminal: more events (any ts) change nothing, emit nothing
    val (st4, o4) = RunningDistinctStats.fold(st3, 1L, Long.MaxValue)
    assert(o4.isEmpty && st4 == st3)
    // no candidate, no watermark: inert
    assert(RunningDistinctStats.fold(none, Long.MaxValue, 0L) ==
      (none, None))
  }

  test("streamed deltas summed per day ≡ batch kernel") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[(Timestamp, Long)]
    val events = stream.toDF().toDF("ts", "user_id")
    val query = RunningDistinctStats.transform(events, watermark = "2 days")
      .toDF("day", "new_users")
      .writeStream.format("memory").queryName("running_distinct")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()

    // u1/u2 open day 0; u9 opens day 2 and drags the watermark; u3's
    // first arrival (day 4) is beaten by a later-arriving day-2 event
    val batch1 = Seq((1L, 0, 5), (2L, 0, 6), (9L, 2, 1))
    val batch2 = Seq((3L, 4, 1), (1L, 1, 0)) // u1 repeat: no re-count
    val batch3 = Seq((3L, 2, 6)) // lowers u3's candidate to day 2
    def add(b: Seq[(Long, Int, Int)]): Unit = {
      stream.addData(b.map { case (u, d, h) => (ts(d, h), u) }: _*)
      query.processAllAvailable()
    }
    add(batch1); add(batch2); add(batch3)
    add(Seq((42L, 20, 0))) // flusher: finalizes every pending candidate
    add(Seq((7L, 1, 0)))   // late probe: a NEW user below the watermark
    query.stop()

    val got = spark.table("running_distinct")
      .groupBy("day").agg(org.apache.spark.sql.functions.sum("new_users")
        .as("new_users"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

    val orderFinal = (batch1 ++ batch2 ++ batch3)
      .map { case (u, d, h) => (ts(d, h), u) }
      .toDF("ts", "user_id")
    val want = graft.queries.Behavior.runningDistinct(orderFinal)
      .selectExpr("unix_date(day)", "new_users")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

    assert(want.nonEmpty && got == want,
      s"streamed=${got.mkString(",")}\nbatch=${want.mkString(",")}")
    // the cross-batch lowering really landed: u3 counts on day 2, so
    // day 2 carries two new users (u9 + u3) and day 4 carries none
    assert(got.toMap == Map(19723L -> 2L, 19725L -> 2L))
    // and the cumulative curve (computed from the summed deltas, the
    // read-time contract) matches the batch cum_users column
    val cum = got.scanLeft(0L)(_ + _._2).tail
    val wantCum = graft.queries.Behavior.runningDistinct(orderFinal)
      .selectExpr("cum_users").as[Long].collect().toSeq
    assert(cum == wantCum)
  }
}
