package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming transition deltas: summed by (from, to) they equal the
  * batch Markov matrix counts on the same (non-late) events — under
  * shuffled cross-batch arrival, a transition SPANNING a fold boundary
  * (its left event folded a batch earlier), same-ts event_id
  * tie-breaks, and late-drop. */
class TransitionStatsSpec extends SparkSuite {

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")

  test("fold: (ts, event_id) order, cross-fold pair, retention") {
    val st0 = TransitionStats.TransState("",
      Array(5L, 1L, 3L), Array(1L, 2L, 1L),
      Array("purchase", "signup", "view"))
    // fold to ts 3: signup(1) → view(3); purchase(5) stays pending
    val (st1, d1) = TransitionStats.fold(st0, 3L)
    assert(d1 == List(("signup", "view", 1L)))
    assert(st1.lastType == "view" && st1.pendTy.toSeq == Seq("purchase"))
    // final fold: the cross-fold pair view → purchase
    val (st2, d2) = TransitionStats.fold(st1, Long.MaxValue)
    assert(d2 == List(("view", "purchase", 1L)))
    assert(st2.lastType == "purchase" && st2.pendTs.isEmpty)
    // same-ts tie-break by event_id: id 9 ("signup") before id 10
    val (_, dTie) = TransitionStats.fold(
      TransitionStats.TransState("",
        Array(7L, 7L), Array(10L, 9L), Array("view", "signup")),
      Long.MaxValue)
    assert(dTie == List(("signup", "view", 1L)), dTie.toString)
  }

  test("summed streamed deltas ≡ batch matrix under shuffled arrival") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[(Timestamp, Long, Long, String)]
    val events = stream.toDF().toDF("ts", "user_id", "event_id",
      "event_type")
    val query = TransitionStats.transform(events, watermark = "5 minutes")
      .toDF("from_type", "to_type", "n")
      .writeStream.format("memory").queryName("trans_stats")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()

    // (user, event_id, type, minute)
    val batch1 = Seq(
      (1L, 10L, "signup", 10), (1L, 11L, "view", 11),
      (2L, 21L, "view", 10), (2L, 22L, "click", 12),
      (5L, 53L, "view", 8), (5L, 52L, "signup", 8)) // same-ts: id order
    // watermark after b1 = 12 − 5 = minute 7
    val batch2 = Seq(
      (1L, 12L, "purchase", 12), // extends u1 above the watermark (7)
      (2L, 20L, "signup", 9),    // EARLIER ts than u2's buffered view
      (99L, 90L, "view", 60))    // watermark → 55
    // u1's minute-58 event pairs with its minute-12 purchase, which
    // folds a batch earlier (cross-fold pair); u2/u5 flush via their
    // pending-ts timers, not via new events of their own
    val batch3 = Seq((1L, 13L, "error", 58), (99L, 91L, "view", 120))
    def add(b: Seq[(Long, Long, String, Int)]): Unit = {
      stream.addData(b.map { case (u, i, e, m) => (ts(m), u, i, e) }: _*)
      query.processAllAvailable()
    }
    add(batch1); add(batch2); add(batch3)
    add(Seq((99L, 92L, "view", 300))) // watermark 295: folds all ≤ 295
    // a late event (far below the watermark) must change nothing
    add(Seq((1L, 14L, "view", 20)))
    query.stop()

    val got = spark.table("trans_stats")
      .selectExpr("from_type", "to_type", "n")
      .as[(String, String, Long)].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum).toMap

    // batch reference: per user, adjacent pairs in (ts, event_id)
    // order over every event that FOLDS by the end (ts ≤ the final
    // watermark 295 — u99's minute-300 event stays pending, so its
    // 120→300 pair is not yet emitted); the late probe is excluded by
    // construction
    val all = (batch1 ++ batch2 ++ batch3 ++ Seq((99L, 92L, "view", 300)))
      .filter(_._4 <= 295)
    val want = all.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._2))
      ordered.zip(ordered.drop(1)).map { case (a, b) => (a._3, b._3) }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want, s"streamed $got\nvs batch $want")
    // the interesting pairs, explicitly
    assert(got(("signup", "view")) == 3L,
      "u2's out-of-order signup and u5's tie-break must both count")
    assert(got(("purchase", "error")) == 1L, "cross-fold pair lost")
    assert(got(("view", "view")) == 1L,
      "quiet u99's pending slice must flush via its timer (60->120)")
    assert(!got.contains(("view", "signup")),
      "arrival order leaked into the matrix (u2/u5 would produce it)")
    assert(!got.contains(("error", "view")),
      "the late probe rewrote a final prefix")
  }
}
