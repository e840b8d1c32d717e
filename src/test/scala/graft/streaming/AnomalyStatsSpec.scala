package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming anomaly contract: per-user flagged days equal the batch
  * integer z-inequality over the same events, across micro-batch
  * splits and out-of-order (in-watermark) arrival; days emit exactly
  * once when sealed; the ring keeps only 6 sealed days per user. */
class AnomalyStatsSpec extends SparkSuite {

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${day + 1}%02d $hour%02d:00:00")

  test("streamed flags ≡ batch inequality; exactly-once at seal") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // u1: 8 quiet days (2/day) then a burst day (9) — must flag;
    // u2: steady 3/day for 9 days — never flags;
    // events arrive hour-shuffled and split across batches
    def spread(u: Long, day: Int, k: Int): Seq[(Timestamp, Long)] =
      (0 until k).map(h => (ts(day, 1 + (h * 7) % 20), u))
    val all: Seq[(Timestamp, Long)] =
      (0 until 8).flatMap(d => spread(1L, d, 2)) ++ spread(1L, 8, 9) ++
        (0 until 9).flatMap(d => spread(2L, d, 3))

    val stream = MemoryStream[(Timestamp, Long)]
    val events = stream.toDF().toDF("ts", "user_id")
    val query = AnomalyStats.transform(events, watermark = "2 hours")
      .toDF("user_id", "day", "x", "n")
      .writeStream.format("memory").queryName("anomaly_stats")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()

    // day-interleaved batches: days 0-4, then 3-8 stragglers, then a
    // sentinel far enough to seal everything through day 8
    val (early, late) = all.partition(_._1.getTime < ts(5, 0).getTime)
    stream.addData(early: _*)
    query.processAllAvailable()
    stream.addData(late: _*)
    query.processAllAvailable()
    stream.addData((ts(12, 10), 99L))
    query.processAllAvailable()
    // late row for u1's SEALED burst day: before the r14 explicit
    // late-drop it re-opened the day with a partial count and
    // re-sealed it immediately (duplicate flag with x = 1)
    stream.addData((ts(8, 3), 1L))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("anomaly_stats")
      .selectExpr("user_id", "cast(day as string)", "x", "n")
      .as[(Long, String, Long, Long)].collect().toSet

    // local batch reference over the same events, sealed days only
    val daily = all.groupBy { case (t, u) =>
      (u, t.getTime / 86400000L)
    }.view.mapValues(_.size.toLong).toMap
    val want = daily.keys.groupBy(_._1).flatMap { case (u, keys) =>
      val days = keys.map(_._2).toSeq.sorted
      days.indices.flatMap { i =>
        val frame = days.slice(math.max(0, i - 6), i + 1)
          .map(d => daily((u, d)))
        val (x, n) = (daily((u, days(i))), frame.length.toLong)
        val s = frame.sum
        val q = frame.map(v => v * v).sum
        if (n >= 4 && (n * x - s) * (n * x - s) > 4 * (n * q - s * s))
          Some((u, new Timestamp(days(i) * 86400000L).toString
            .stripSuffix(".0"), x, n))
        else None
      }
    }.toSet
    assert(got == want, s"streamed $got vs batch $want")
    assert(got.exists(f => f._1 == 1L && f._3 == 9L),
      "the burst day must flag")
    assert(!got.exists(_._1 == 2L), "steady u2 must never flag")
  }
}
