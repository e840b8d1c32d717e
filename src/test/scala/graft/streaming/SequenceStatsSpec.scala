package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming sequence patterns: per-user-per-session flags equal the
  * batch whole-string containment on the same (non-late) events —
  * under shuffled cross-batch arrival (an earlier-ts event in a later
  * batch), a pattern SPANNING a fold boundary (its prefix folded into
  * the tail a batch before its suffix arrives), same-ts event_id
  * tie-breaks, a GENUINE session split (two bursts > gap apart with no
  * watermark movement between their arrivals), straggler folding at
  * seal, and late-drop. */
class SequenceStatsSpec extends SparkSuite {

  private val patterns = Seq("sp", "vvv", "ee")

  private def ts(m: Int): Timestamp = // minute m past 10:00
    Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")

  test("fold: (ts, event_id) order, boundary-spanning match, gap split") {
    val noGap = 1000000L
    val st0 = SequenceStats.SeqState("", 0, 0L, Long.MinValue, 5L,
      Array(5L, 1L, 3L), Array(1L, 2L, 1L), "psv")
    val pats = Array("vp", "ss")
    // fold up to ts 3: s(1) then v(3) fold — "sv"; p(5) stays pending
    val (st1, c1) = SequenceStats.fold(st0, 3L, pats, keep = 1, noGap)
    assert(st1.tail == "v" && st1.flags == 0 && st1.n == 2 && c1.isEmpty)
    assert(st1.pendTs.toSeq == Seq(5L) && st1.pendCh == "p")
    // final fold: hay = tail "v" + "p" — "vp" spans the boundary
    val (st2, c2) = SequenceStats.fold(st1, Long.MaxValue, pats,
      keep = 1, noGap)
    assert(st2.flags == 1 && st2.n == 3 && st2.pendTs.isEmpty
      && c2.isEmpty)
    // same ts, event_id tie-break: (7,id9,'s') before (7,id10,'x')
    val (tie, _) = SequenceStats.fold(
      SequenceStats.SeqState("", 0, 0L, Long.MinValue, 7L,
        Array(7L, 7L), Array(10L, 9L), "xs"),
      Long.MaxValue, Array("sx"), keep = 1, noGap)
    assert(tie.flags == 1, "event_id tie-break lost")
    // a gap > gapMs inside ONE fold closes the earlier session even
    // though the watermark never moved between the bursts — the
    // session-merge hazard this segmentation exists for
    val (open, closedList) = SequenceStats.fold(
      SequenceStats.SeqState("", 0, 0L, Long.MinValue, 500L,
        Array(0L, 1L, 500L, 501L), Array(1L, 2L, 3L, 4L), "spvv"),
      Long.MaxValue, Array("sp", "vv"), keep = 1, gapMs = 100L)
    assert(closedList == List((1, 2L, 1L)),
      s"burst A must close as its own session: $closedList")
    assert(open.flags == 2 && open.n == 2 && open.lastFoldTs == 501L,
      "burst B must start fresh — sp must NOT match across the gap")
  }

  test("streamed flags ≡ batch containment; shuffle, span, split, late-drop") {
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
      (5L, 53L, "purchase", 8), (5L, 52L, "signup", 8), // same-ts: id order
      (6L, 61L, "signup", 10), (6L, 62L, "purchase", 11))
    // watermark after b1 = 13 − 5 = minute 8
    val batch2 = Seq(
      (2L, 20L, "view", 9), // earlier ts, later batch, above watermark
      (99L, 90L, "view", 40)) // advances the watermark to 35
    // u4's first two views fold to the tail when b3 processes (both ≤
    // 35); the third view then spans the fold boundary. u6's second
    // burst sits 189 minutes (> the 60-minute gap) after its first —
    // BOTH bursts are in flight before any watermark passes the gap,
    // the exact session-merge scenario
    val batch3 = Seq(
      (4L, 43L, "view", 36),
      (6L, 63L, "view", 200), (6L, 64L, "view", 201),
      (6L, 65L, "view", 202),
      (99L, 91L, "view", 100))
    def add(b: Seq[(Long, Long, String, Int)]): Unit = {
      stream.addData(b.map { case (u, i, e, m) => (ts(m), u, i, e) }: _*)
      query.processAllAvailable()
    }
    add(batch1)
    assert(spark.table("seq_stats").isEmpty,
      "nothing may emit before a session seals")
    add(batch2); add(batch3)
    add(Seq((99L, 92L, "view", 400))) // seal every session (wm 395)
    // late event for the SEALED u1 — dropped, no second emission
    add(Seq((1L, 12L, "view", 12)))
    query.stop()

    val got = spark.table("seq_stats")
      .selectExpr("user_id", "flags", "n_events")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3)).toSet).toMap

    // batch reference: per user, sort all non-late events by
    // (ts, event_id), SEGMENT at gaps > 60 minutes, whole-string
    // containment per SEALED segment — a segment is sealed by a later
    // segment's existence (the gap is order-final) or by the final
    // watermark (395) passing lastTs + gap; u99's trailing {400}
    // session stays open and must not emit
    val all = batch1 ++ batch2 ++ batch3 ++ Seq((99L, 92L, "view", 400))
    val want = all.groupBy(_._1).map { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._2))
      val segs = ordered.foldLeft(List.empty[List[(Long, Long, String, Int)]]) {
        case (acc, e) => acc match {
          case cur :: done if e._4 - cur.head._4 <= 60 =>
            (e :: cur) :: done // cur.head is the segment's LAST event
          case _ => List(e) :: acc
        }
      }.map(_.reverse).reverse
      val sealedSegs = segs.zipWithIndex.filter { case (seg, i) =>
        i < segs.size - 1 || 395 > seg.last._4 + 60
      }.map(_._1)
      u -> sealedSegs.map { seg =>
        val str = seg.map(_._3.head).mkString
        val flags = patterns.zipWithIndex
          .collect { case (p, i) if str.contains(p) => 1 << i }.sum
        (flags, seg.size.toLong)
      }.toSet
    }.filter(_._2.nonEmpty)
    assert(got == want, s"streamed $got\nvs batch $want")
    // the interesting rows, explicitly
    assert(got(2L) == Set((2, 3L)), "shuffled arrival broke vvv ordering")
    assert(got(4L) == Set((2, 3L)), "fold-boundary-spanning vvv lost")
    assert(got(5L) == Set((1, 2L)), "same-ts event_id tie-break broke sp")
    assert(got(3L) == Set((0, 3L)), "eve must not match ee")
    assert(got(6L) == Set((1, 2L), (2, 3L)),
      "the >gap bursts must split into two sessions (sp, then vvv)")
    assert(got(1L) == Set((1, 2L)), "late view changed a sealed session")
    assert(got(99L) == Set((0, 2L)),
      "the sentinel's first session closes by gap; its {400} stays open")
  }
}
