package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming EWMA: one row per order-final (user, day), the halving
  * fold walking the identical integer sequence as the batch q_ewma
  * kernel — pinned streamed ≡ batch through the SAME factored code,
  * under shuffled cross-batch arrival, cross-batch same-day count
  * merging, gap days (observed-only, no zero-fill), late-drop, and
  * the timeout flush for quiet users. */
class EwmaStatsSpec extends SparkSuite {

  // day d, hour h — all in 2024 (days 19723+)
  private def ts(d: Int, h: Int): Timestamp =
    new Timestamp((19723L + d) * 86400000L + h * 3600000L)

  test("fold: day order, halving seed, partial finality, gaps") {
    // days 5 and 7 (gap at 6), counts 3 and 1
    val st0 = EwmaStats.EwmaState(-1L, 0L, Array(7L, 5L), Array(1L, 3L))
    // watermark inside day 7: only day 5 is final
    val (st1, o1) = EwmaStats.fold(st0, 7L * 86400000000L + 5L)
    assert(o1 == List((5L, 3L, 1L, 3000000L))) // first day passes through
    assert(st1.ewmaU == 3000000L && st1.nDays == 1L)
    assert(st1.pendDay.toSeq == Seq(7L))
    // day 7 folds later: (3e6 + 1e6) / 2 = 2e6 — the gap day 6 does
    // NOT fold in (observed-days-only, the batch kernel's semantics)
    val (st2, o2) = EwmaStats.fold(st1, Long.MaxValue)
    assert(o2 == List((7L, 1L, 2L, 2000000L)))
    assert(st2.pendDay.isEmpty && st2.ewmaU == 2000000L)
    // integer floor: counts 1 then 2 → (1e6 + 2e6) DIV 2 = 1500000
    val (_, of) = EwmaStats.fold(
      EwmaStats.EwmaState(-1L, 0L, Array(1L, 2L), Array(1L, 2L)),
      Long.MaxValue)
    assert(of.map(_._4) == List(1000000L, 1500000L))
  }

  test("streamed per-day EWMA ≡ batch kernel on order-final days") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[(Timestamp, Long, Long, String)]
    val events = stream.toDF().toDF("ts", "user_id", "event_id",
      "event_type")
    val query = EwmaStats.transform(events, watermark = "2 hours")
      .toDF("user_id", "day", "x", "n_days", "ewma_u")
      .writeStream.format("memory").queryName("ewma_stats")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()

    // (user, day, hour): u1 has a same-day count split across batches;
    // u2 has a gap day; u9 is the quiet user the timer must flush
    val batch1 = Seq((1L, 0, 3), (1L, 0, 5), (2L, 0, 4), (9L, 0, 2))
    val batch2 = Seq((1L, 0, 7), // same day as batch1, still open
      (1L, 1, 1), (2L, 2, 1))   // u2 skips day 1
    val batch3 = Seq((1L, 2, 6), (2L, 3, 2))
    var id = 100L
    def add(b: Seq[(Long, Int, Int)]): Unit = {
      stream.addData(b.map { case (u, d, h) =>
        id += 1; (ts(d, h), u, id, "view") }: _*)
      query.processAllAvailable()
    }
    add(batch1); add(batch2); add(batch3)
    add(Seq((42L, 9, 0))) // flusher: watermark → day 8+, finalizes all
    // late probe: far below the watermark, its day already folded
    add(Seq((1L, 0, 6)))
    query.stop()

    val got = spark.table("ewma_stats")
      .selectExpr("user_id", "day", "x", "n_days", "ewma_u")
      .as[(Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq

    // batch kernel over the order-final events (flusher + late probe
    // excluded): every user's LAST streamed row carries the kernel's
    // (n_days, ewma_u)
    id = 100L
    val orderFinal = (batch1 ++ batch2 ++ batch3)
      .map { case (u, d, h) => id += 1; (ts(d, h), u, id, "view") }
      .toDF("ts", "user_id", "event_id", "event_type")
    val want = graft.queries.Behavior.ewma(orderFinal)
      .selectExpr("user_id", "CAST(n_days AS LONG)", "ewma_u")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

    val lastPerUser = got.groupBy(_._1).view
      .mapValues(rs => rs.maxBy(_._4)).toMap
    assert(want.nonEmpty)
    want.foreach { case (u, n, e) =>
      val r = lastPerUser.getOrElse(u, sys.error(s"user $u never emitted"))
      assert(r._4 == n && r._5 == e,
        s"user $u: streamed (${r._4}, ${r._5}) vs batch ($n, $e)")
    }
    // per-day trajectory sanity: u1's day-0 count merged across
    // batches (3 events + the late probe dropped), day sequence dense
    assert(got.filter(_._1 == 1L).map(r => (r._2 - 19723L, r._3)) ==
      Seq((0L, 3L), (1L, 1L), (2L, 1L)))
    // the streamed row count is one per (user, observed final day)
    assert(got.map(r => (r._1, r._2)).distinct.size == got.size)
  }
}
