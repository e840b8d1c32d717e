package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Event-time semantics fixtures (SURVEY.md §2.C-9: session windows and
  * watermark late-data have no DuckDB oracle — golden-tested here).
  */
class EventTimeSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("session_window merges events within the gap (batch)") {
    import spark.implicits._
    val df = Seq(
      ("u1", ts(0)), ("u1", ts(4)), ("u1", ts(7)),   // one session 0..12
      ("u1", ts(30)), ("u1", ts(33)),                 // second session 30..38
      ("u2", ts(1))                                   // separate user
    ).toDF("user", "ts")
    val sessions = df
      .groupBy(col("user"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"), col("session_window.start").cast("string").as("start"),
        col("session_window.end").cast("string").as("end"), col("n"))
      .orderBy("user", "start")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(sessions == Seq(
      ("u1", "2024-01-01 10:00:00", "2024-01-01 10:12:00", 3L),
      ("u1", "2024-01-01 10:30:00", "2024-01-01 10:38:00", 2L),
      ("u2", "2024-01-01 10:01:00", "2024-01-01 10:06:00", 1L)))
  }

  test("watermark drops late data; windows finalize in append mode") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[(Timestamp, String)]
    val agg = stream.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string").as("ws"), col("n"))

    val query = agg.writeStream
      .format("memory").queryName("wm_test")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    // window [10:00,10:10): two on-time events
    stream.addData((ts(0), "a"), (ts(5), "b"))
    query.processAllAvailable()
    // advance event time far enough to close [10:00,10:10)
    stream.addData((ts(35), "c"))
    query.processAllAvailable()
    // LATE arrival for the already-finalized window → must be dropped
    stream.addData((ts(1), "late"))
    query.processAllAvailable()
    // close [10:30,10:40) too so its count becomes visible
    stream.addData((ts(59), "d"))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("wm_test")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // finalized first window counts ONLY the two on-time events
    assert(rows("2024-01-01 10:00:00") == 2L)
    assert(rows("2024-01-01 10:30:00") == 1L)
  }

  test("stream-stream join with watermarked state (purchase ⋈ signup)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val signups = MemoryStream[(Timestamp, String)]
    val purchases = MemoryStream[(Timestamp, String)]
    val sdf = signups.toDF().toDF("s_ts", "user")
      .withWatermark("s_ts", "1 hour")
    val pdf = purchases.toDF().toDF("p_ts", "p_user")
      .withWatermark("p_ts", "1 hour")
    // time-bounded equi join: purchase within 1h after the signup —
    // the bound lets Spark expire join state past the watermark
    val joined = pdf.join(sdf,
      expr("user = p_user AND p_ts >= s_ts AND p_ts <= s_ts + INTERVAL 1 HOUR"))
      .select(col("p_user"), col("p_ts").cast("string").as("pt"))

    val query = joined.writeStream
      .format("memory").queryName("ssj_test")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    signups.addData((ts(0), "u1"), (ts(5), "u2"))
    purchases.addData((ts(30), "u1"))    // within u1's hour → match
    query.processAllAvailable()
    purchases.addData((ts(10), "u3"))    // no signup → no row
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("ssj_test")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("u1", "2024-01-01 10:30:00")))
  }

  test("streaming dropDuplicates with watermark (stateful dedup)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[(Timestamp, String)]
    val deduped = stream.toDF().toDF("ts", "id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("id")

    val query = deduped.writeStream
      .format("memory").queryName("dd_test")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    stream.addData((ts(0), "x"), (ts(1), "x"), (ts(2), "y"))
    query.processAllAvailable()
    stream.addData((ts(3), "x"), (ts(4), "z"))
    query.processAllAvailable()
    query.stop()

    val ids = spark.table("dd_test").select("id").as[String]
      .collect().sorted.toSeq
    assert(ids == Seq("x", "y", "z"))
  }
}
