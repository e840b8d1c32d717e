package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming sequence patterns: per-user flags equal the batch
  * whole-string containment on the same (non-late) events — under
  * shuffled cross-batch arrival (an earlier-ts event in a later
  * batch), a pattern SPANNING a fold boundary (its prefix folded into
  * the tail a batch before its suffix arrives), same-ts event_id
  * tie-breaks, straggler folding at seal, and late-drop after the
  * watermark. */
class SequenceStatsSpec extends SparkSuite {

  private val patterns = Seq("sp", "vvv", "ee")

  private def ts(m: Int): Timestamp = // minute m past 10:00
    Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")

  test("fold: (ts, event_id) order, boundary-spanning match, retention") {
    val st0 = SequenceStats.SeqState("", 0, 5L, 0L,
      Array(5L, 1L, 3L), Array(1L, 2L, 1L), "psv")
    val pats = Array("vp", "ss")
    // fold up to ts 3: s(1) then v(3) fold — "sv"; p(5) stays pending
    val st1 = SequenceStats.fold(st0, 3L, pats, keep = 1)
    assert(st1.tail == "v" && st1.flags == 0 && st1.n == 2)
    assert(st1.pendTs.toSeq == Seq(5L) && st1.pendCh == "p")
    // final fold: hay = tail "v" + "p" — "vp" spans the boundary
    val st2 = SequenceStats.fold(st1, Long.MaxValue, pats, keep = 1)
    assert(st2.flags == 1 && st2.n == 3 && st2.pendTs.isEmpty)
    // same ts, event_id tie-break: (7,id9,'s') before (7,id10,'s')
    val tie = SequenceStats.fold(
      SequenceStats.SeqState("", 0, 7L, 0L,
        Array(7L, 7L), Array(10L, 9L), "xs"),
      Long.MaxValue, Array("sx"), keep = 1)
    assert(tie.flags == 1, "event_id tie-break lost")
  }

  test("streamed flags ≡ batch containment; shuffle, span, late-drop") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[(Timestamp, Long, Long, String)]
    val events = stream.toDF().toDF("ts", "user_id", "event_id",
      "event_type")
    val query = SequenceStats.transform(events, patterns,
        watermark = "5 minutes", sessionGap = "60 minutes")
      .toDF("user_id", "flags", "n_events", "t_last")
      .writeStream.format("memory").queryName("seq_stats")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()

    // (user, event_id, type, minute)
    val batch1 = Seq(
      (1L, 10L, "signup", 10), (1L, 11L, "purchase", 11),
      (2L, 21L, "view", 10), (2L, 22L, "view", 11), // v@9 comes later
      (3L, 31L, "error", 10), (3L, 32L, "view", 12),
      (3L, 33L, "error", 13),
      (4L, 41L, "view", 10), (4L, 42L, "view", 11),
      (5L, 53L, "purchase", 8), (5L, 52L, "signup", 8)) // same-ts: id order
    // watermark after b1 = 13 − 5 = minute 8
    val batch2 = Seq(
      (2L, 20L, "view", 9), // earlier ts, later batch, above watermark
      (99L, 90L, "view", 40)) // advances the watermark to 35
    // u4's first two views fold to the tail when b3 processes (both ≤
    // 35); the third view then spans the fold boundary
    val batch3 = Seq((4L, 43L, "view", 36), (99L, 91L, "view", 100))
    def add(b: Seq[(Long, Long, String, Int)]): Unit = {
      stream.addData(b.map { case (u, i, e, m) => (ts(m), u, i, e) }: _*)
      query.processAllAvailable()
    }
    add(batch1)
    assert(spark.table("seq_stats").isEmpty,
      "nothing may emit before a session seals")
    add(batch2); add(batch3)
    add(Seq((99L, 92L, "view", 300))) // seal every user (lastTs+60 < 295)
    // late event for the SEALED u1 — dropped, no second emission
    add(Seq((1L, 12L, "view", 12)))
    query.stop()

    val got = spark.table("seq_stats")
      .selectExpr("user_id", "flags", "n_events")
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // batch reference: whole-string containment per user over all
    // non-late events in (ts, event_id) order
    val all = batch1 ++ batch2 ++ batch3
    val want = all.groupBy(_._1).collect { case (u, rows) if u != 99L =>
      val seq = rows.sortBy(r => (r._4, r._2)).map(_._3.head).mkString
      val flags = patterns.zipWithIndex
        .collect { case (p, i) if seq.contains(p) => 1 << i }.sum
      u -> ((flags, rows.size.toLong))
    }
    assert(got == want, s"streamed $got\nvs batch $want")
    // the interesting rows, explicitly
    assert(got(2L)._1 == 2, "shuffled arrival broke the vvv ordering")
    assert(got(4L)._1 == 2, "fold-boundary-spanning vvv lost")
    assert(got(5L)._1 == 1, "same-ts event_id tie-break broke sp")
    assert(got(3L)._1 == 0, "eve must not match ee")
    assert(got(1L) == ((1, 2L)), "late view changed a sealed session")
    assert(!got.contains(99L), "the unsealed sentinel user emitted")
  }
}
