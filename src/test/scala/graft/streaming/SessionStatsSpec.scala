package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming sessionization: closed sessions ≡ the batch q_sessionize
  * kernel rows, under cross-batch session stitching, same-ts
  * event_id tie-breaks, late-drop, and the watermark/timer close of a
  * quiet user's final session. */
class SessionStatsSpec extends SparkSuite {

  private val GapUs = SessionStats.GapUs

  test("fold: gap split, watermark closure, cross-fold stitching") {
    val none = SessionStats.SessState(0L, 0L, Long.MinValue, 0L,
      Array.emptyLongArray, Array.emptyLongArray)
    // two events 10 min apart, then a 40-min gap, then one more:
    // fold with wm inside the gap → first session NOT yet closed
    // (wm < last + gap)
    val min = 60000000L
    val st0 = none.copy(pendUs = Array(0L, 10 * min, 50 * min),
      pendId = Array(1L, 2L, 3L))
    val (st1, o1) = SessionStats.fold(st0, 20 * min)
    assert(o1.isEmpty && st1.idx == 1 && st1.n == 2 &&
      st1.pendUs.sameElements(Array(50 * min)))
    // wm passes the gap: session 1 closes with its 10-min duration,
    // session 2 opens from the pending event
    val (st2, o2) = SessionStats.fold(st1, 50 * min)
    assert(o2 == List((1L, 2L, 600L)), o2)
    assert(st2.idx == 2 && st2.n == 1 && st2.startUs == 50 * min)
    // watermark closure with NO successor: wm ≥ last + gap seals it
    val (st3, o3) = SessionStats.fold(st2, 50 * min + GapUs)
    assert(o3 == List((2L, 1L, 0L)) && st3.n == 0L)
    // a later event opens session 3 — the ordinal never resets
    val (st4, o4) = SessionStats.fold(
      st3.copy(pendUs = Array(200 * min), pendId = Array(4L)),
      Long.MaxValue)
    assert(o4 == List((3L, 1L, 0L)) && st4.idx == 3)
  }

  test("streamed closed sessions ≡ batch kernel") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // day-1 base, NOT epoch 0: Spark's fMGWS pre-filters rows at or
    // below the watermark, and the watermark initializes to 0 — an
    // event at exactly epoch-0 ms would be engine-dropped before the
    // fold ever saw it
    def ts(minute: Int): Timestamp =
      new Timestamp(86400000L + minute * 60000L)

    val stream = MemoryStream[(Timestamp, Long, Long)]
    val events = stream.toDF().toDF("ts", "user_id", "event_id")
    val query = SessionStats.transform(events, watermark = "5 minutes")
      .toDF("user_id", "session_idx", "n_events", "duration_sec")
      .writeStream.format("memory").queryName("session_stats")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()

    // u1: session 1 split across batches (0,10,25 min), session 2 at
    // 70-75; u2: same-ts tie-break pair then a second session; u3:
    // single event (the quiet user the watermark must close)
    val batch1 = Seq((1L, 0, 101L), (2L, 0, 201L), (2L, 0, 202L),
      (3L, 5, 301L))
    val batch2 = Seq((1L, 10, 102L), (1L, 25, 103L))
    val batch3 = Seq((1L, 70, 104L), (1L, 75, 105L), (2L, 90, 203L))
    var lastId = 0L
    def add(b: Seq[(Long, Int, Long)]): Unit = {
      stream.addData(b.map { case (u, m, id) => (ts(m), u, id) }: _*)
      query.processAllAvailable()
    }
    add(batch1); add(batch2); add(batch3)
    // flusher: a far-future event drags the watermark past every
    // regular session's close time — ALL their sessions seal; the
    // flusher's own session stays open and emits nothing
    add(Seq((42L, 10000, 999L)))
    add(Seq((1L, 12, 106L))) // late probe: inside an emitted session
    query.stop()

    val got = spark.table("session_stats")
      .selectExpr("user_id", "session_idx", "n_events", "duration_sec")
      .as[(Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq

    val orderFinal = (batch1 ++ batch2 ++ batch3)
      .map { case (u, m, id) => (ts(m), u, id) }
      .toDF("ts", "user_id", "event_id")
    val want = graft.queries.Behavior.sessionize(orderFinal)
      .selectExpr("user_id", "session_idx", "n_events", "duration_sec")
      .as[(Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq

    assert(want.nonEmpty && got == want,
      s"streamed=${got.mkString(",")}\nbatch=${want.mkString(",")}")
    // the cross-batch stitch really happened: u1's first session spans
    // three arrivals from two batches (25 min, 3 events)
    assert(got.contains((1L, 1L, 3L, 1500L)))
    // and the quiet user's single-event session closed by watermark
    assert(got.contains((3L, 1L, 1L, 0L)))
  }
}
