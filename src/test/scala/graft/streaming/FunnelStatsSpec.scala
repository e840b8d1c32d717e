package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming funnel contract: per-user outcomes equal the batch
  * cascade on the same (non-late) events — under adversarially
  * SHUFFLED arrival (a step-1 event arriving AFTER its dependent
  * step-2 event, in a later micro-batch, with an EARLIER timestamp:
  * the t1-revision case that makes the buffered design necessary),
  * cross-batch state carry, exactly-once emission at seal, late-drop
  * after seal, and silent GC of users who never reach step 1. */
class FunnelStatsSpec extends SparkSuite {

  private val steps = Seq("signup", "view", "click", "purchase")

  private def ts(m: Int): Timestamp = // minute m past 10:00
    Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")

  /** Local single-threaded cascade reference — q_funnel's semantics
    * (first qualifying event strictly after the previous step, within
    * Δ = 7 minutes). */
  private def reference(evs: Seq[(Long, String, Int)])
      : Map[Long, (Int, Int, Int)] =
    evs.groupBy(_._1).flatMap { case (u, rows) =>
      val byStep = steps.map(s => rows.filter(_._2 == s).map(_._3).sorted)
      if (byStep.head.isEmpty) None
      else {
        val t = Array.fill(steps.size)(Int.MaxValue)
        t(0) = byStep.head.min
        var j = 1
        while (j < steps.size && t(j - 1) != Int.MaxValue) {
          byStep(j).find(m => m > t(j - 1) && m <= t(j - 1) + 7)
            .foreach(m => t(j) = m)
          j += 1
        }
        val stage = t.count(_ != Int.MaxValue)
        Some(u -> ((stage, t(0), t(stage - 1))))
      }
    }

  test("buffer update: horizon trim with t1, watermark trim without") {
    def pack(tsMs: Long, step: Int): Long = tsMs * 8L + step
    val horizon = 100L
    // with a step-1 at 50: keep ≤ 150, seal at 150
    val (k1, s1) = FunnelStats.updateBuffer(
      Array(pack(50, 0), pack(120, 1), pack(151, 2), pack(150, 3)),
      horizon, watermarkMs = 0L)
    assert(k1.toSeq == Seq(pack(50, 0), pack(120, 1), pack(150, 3)))
    assert(s1 == 150L)
    // without one: everything ≤ watermark is dead (a future step-1
    // must sit above it), the rest seals at maxTs + horizon
    val (k2, s2) = FunnelStats.updateBuffer(
      Array(pack(30, 1), pack(70, 2), pack(90, 1)), horizon,
      watermarkMs = 70L)
    assert(k2.toSeq == Seq(pack(90, 1)))
    assert(s2 == 190L)
    // fully dead buffer → empty, caller drops the state
    val (k3, s3) = FunnelStats.updateBuffer(
      Array(pack(30, 1), pack(40, 2)), horizon, watermarkMs = 99L)
    assert(k3.isEmpty && s3 == Long.MinValue)
  }

  test("streamed outcomes ≡ batch cascade; revision, late-drop, GC") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[(Timestamp, Long, String)]
    val events = stream.toDF().toDF("ts", "user_id", "event_type")
    val query = FunnelStats.transform(events, steps,
        watermark = "5 minutes", stepWindow = "7 minutes")
      .toDF("user_id", "stage", "t_first", "t_last")
      .writeStream.format("memory").queryName("funnel_stats")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()

    // (user, type, minute) — the BehaviorSpec cases in minutes
    val batch1 = Seq(
      (1L, "signup", 0), (1L, "view", 2), (1L, "click", 4),
      (1L, "purchase", 6),
      (2L, "view", 0), (2L, "signup", 1), // view precedes signup
      (3L, "signup", 0), // its out-of-window view comes in batch 2
      (5L, "signup", 0), (5L, "view", 0), // same-instant: excluded
      (6L, "view", 0), (6L, "click", 2), (6L, "purchase", 4), // no signup
      (7L, "view", 5), // arrives BEFORE its signup (next batch, ts 2)
      (9L, "signup", 0),
      (10L, "signup", 0))
    // batch 2: the t1 revision (u7 signup ts 2 < u7 view ts 5, still
    // above the watermark 10:01), u3's window miss, u5's boundary hit,
    // u9's beyond-horizon click (trim target)
    val batch2 = Seq(
      (7L, "signup", 2),
      (3L, "view", 8), // > t1 + 7
      (5L, "view", 7), // exactly t1 + 7: counts
      (9L, "click", 30)) // past t1 + 21 horizon AND wrong step order
    stream.addData(batch1.map { case (u, e, m) => (ts(m), u, e) }: _*)
    query.processAllAvailable()
    assert(spark.table("funnel_stats").isEmpty,
      "nothing may emit before the watermark passes a seal point")
    stream.addData(batch2.map { case (u, e, m) => (ts(m), u, e) }: _*)
    query.processAllAvailable()
    // sentinel advances the watermark past every seal point (max t1 =
    // 10:02 + 21 min; GC point 10:06 + 21) — fires all timeouts
    stream.addData((ts(90), 99L, "view"))
    query.processAllAvailable()
    // a late step-2 event for the SEALED u10 funnel: must change nothing
    stream.addData((ts(3), 10L, "view"))
    query.processAllAvailable()
    // a late STEP-1 event for the sealed u10: before the r14 explicit
    // late-drop this re-created state (updateBuffer's no-step1 trim
    // does not cover a late signup) and emitted a DUPLICATE outcome at
    // the next seal
    stream.addData((ts(2), 10L, "signup"))
    query.processAllAvailable()
    stream.addData((ts(150), 99L, "view"))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("funnel_stats")
      .selectExpr("user_id", "stage", "cast(t_first as string)",
        "cast(t_last as string)")
      .as[(Long, Int, String, String)].collect()
    assert(rows.length == rows.map(_._1).distinct.length,
      s"a user emitted twice: ${rows.mkString(",")}")
    val got = rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    val want = reference(
      (batch1 ++ batch2).map { case (u, e, m) => (u, e, m) })
      .map { case (u, (st, tf, tl)) =>
        u -> ((st, ts(tf).toString.stripSuffix(".0"),
          ts(tl).toString.stripSuffix(".0")))
      }
    assert(got == want,
      s"streamed $got\nvs batch reference $want")
    // the interesting rows, explicitly: revision worked, boundary
    // counted, GC emitted nothing, late view never resurrected u10
    assert(got(7L)._1 == 2, "t1 revision lost the dependent view")
    assert(got(5L)._1 == 2, "the exactly-+7min view must count")
    assert(got(1L) == ((4, ts(0).toString.stripSuffix(".0"),
      ts(6).toString.stripSuffix(".0"))))
    assert(got(10L)._1 == 1, "late data changed a sealed funnel")
    assert(!got.contains(6L) && !got.contains(99L),
      "users without step 1 must GC silently")
    assert(got.size == 7)
  }
}
