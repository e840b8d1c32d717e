package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming retention deltas: counted by (cohort_week, week_no) they
  * equal the batch q_retention_cohort triangle on the same (non-late)
  * events — under shuffled cross-batch arrival, an out-of-order first
  * event arriving after a later one (cohort still correct while both
  * are pending), exactly-once per (user, week), late-drop, and the
  * timeout flush for quiet users. */
class RetentionStatsSpec extends SparkSuite {

  // Mon 2024-01-01 12:00 (an ISO week start) + d days — epoch
  // arithmetic, so d can run past January
  private val base = Timestamp.valueOf("2024-01-01 12:00:00").getTime
  private def ts(d: Int): Timestamp = new Timestamp(base + d * 86400000L)

  test("weekStartDays: Monday-start weeks on both sides of the epoch") {
    def us(days: Long): Long = days * 86400000000L
    // 2024-01-01 (epoch day 19723) is a Monday
    assert(RetentionStats.weekStartDays(us(19723)) == 19723L)
    assert(RetentionStats.weekStartDays(us(19723) + 1) == 19723L)
    assert(RetentionStats.weekStartDays(us(19729)) == 19723L) // Sunday
    assert(RetentionStats.weekStartDays(us(19730)) == 19730L) // next Mon
    // epoch day 0 = Thursday 1970-01-01 → its week began Mon, day −3
    assert(RetentionStats.weekStartDays(0L) == -3L)
    assert(RetentionStats.weekStartDays(-1L) == -3L) // Wed 1969-12-31
  }

  test("fold: cohort from first event, one delta per (user, week)") {
    def us(d: Int): Long = AttributionStats.micros(ts(d))
    // pending out of order: day 8 (week 1) arrives before day 0
    val st0 = RetentionStats.RetState(Long.MinValue,
      -1L, Array(us(8), us(0), us(1)), Array(1L, 2L, 3L))
    val (st1, d1) = RetentionStats.fold(st0, us(8))
    // cohort = week of day 0 (the EARLIEST pending, not first-arrived);
    // day 1 shares week 0 with it — one delta each for weeks 0 and 1
    val mon = RetentionStats.weekStartDays(us(0))
    assert(d1 == List((mon, 0L), (mon, 1L)), d1.toString)
    assert(st1.cohortDays == mon && st1.pendUs.isEmpty)
    // a later fold in week 1 adds nothing; week 3 adds one
    val st2 = st1.copy(pendUs = Array(us(9), us(22)), pendId = Array(4L, 5L))
    val (st3, d2) = RetentionStats.fold(st2, Long.MaxValue)
    assert(d2 == List((mon, 3L)), d2.toString)
    assert(st3.lastWn == 3L)
  }

  test("counted streamed deltas ≡ batch retention under shuffled arrival") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[(Timestamp, Long, Long)]
    val events = stream.toDF().toDF("ts", "user_id", "event_id")
    // 8-day watermark: room for u3's week-0 first event to arrive a
    // batch AFTER its week-1 event without being late
    val query = RetentionStats.transform(events, watermark = "8 days")
      .toDF("user_id", "cohort_days", "week_no")
      .writeStream.format("memory").queryName("ret_stats")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()

    // (user, event_id, day): u1 cohort wk0 active wk0/1/3; u2 cohort
    // wk1; u3's week-1 event arrives BEFORE its week-0 first event
    val batch1 = Seq((1L, 10L, 1), (3L, 30L, 9))  // wm after: day 1
    val batch2 = Seq((3L, 31L, 2),                 // u3's true cohort: wk0
      (1L, 11L, 2), (1L, 12L, 8), (2L, 20L, 8))
    val batch3 = Seq((1L, 13L, 22), (99L, 90L, 40)) // u1 wk3; wm → d32
    def add(b: Seq[(Long, Long, Int)]): Unit = {
      stream.addData(b.map { case (u, i, d) => (ts(d), u, i) }: _*)
      query.processAllAvailable()
    }
    add(batch1); add(batch2); add(batch3)
    add(Seq((99L, 91L, 41))); add(Seq((99L, 92L, 42))) // fire flush timers
    // late probe (day 1, far below the watermark): must not create a
    // delta or rewrite anyone's cohort
    add(Seq((2L, 21L, 1)))
    query.stop()

    val got = spark.table("ret_stats")
      .groupBy(col("cohort_days"), col("week_no"))
      .agg(count(lit(1)).as("users"))
      .as[(Long, Long, Long)].collect().toSet

    // batch reference over everything that folds by the end (final
    // watermark = day 42 − 8d = day 34 ⇒ every u1/u2/u3 event; u99's
    // day-40+ advancers stay pending and emit nothing) — late probe
    // excluded
    val all = (batch1 ++ batch2 ++ batch3.take(1))
      .map { case (u, _, d) => (u, d) }
    val mon = (d: Int) => RetentionStats.weekStartDays(
      AttributionStats.micros(ts(d)))
    val want = all.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val cohort = mon(rows.map(_._2).min)
      rows.map(r => (cohort, (mon(r._2) - cohort) / 7)).distinct
    }.groupBy(identity).map { case (k, g) => (k._1, k._2, g.size.toLong) }
      .toSet
    assert(got == want, s"streamed $got\nvs batch $want")
    // the interesting rows, explicitly: u1+u3 share cohort wk0 (u3's
    // out-of-order first event still decided its cohort)
    val wk0 = mon(1)
    assert(got.contains((wk0, 0L, 2L)), "u1+u3 in cohort wk0 week 0")
    assert(got.contains((wk0, 1L, 2L)), "u1+u3 active in week 1")
    assert(got.contains((wk0, 3L, 1L)), "u1 alone returns in week 3")
    assert(got.contains((mon(8), 0L, 1L)), "u2 cohorts alone in wk1")
  }
}
