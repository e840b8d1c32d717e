package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.ingest.TableLog

/** Exactly-once streaming Type-2 maintenance: the batch-id guard turns
  * engine replays into no-ops (without it the order-final merge would
  * FAIL LOUDLY on re-delivery and wedge the stream), crashes between
  * merge and commit recover once, and the end-to-end stream equals the
  * from-scratch scd2 rebuild over the full history. */
class Scd2PipelineSpec extends SparkSuite {

  import spark.implicits._

  private def ts(h: Int) = new java.sql.Timestamp(3600000L * h)
  private type Row6 = (Long, String, Long, Long, Option[Long], Boolean)

  private def state(dir: String): Seq[Row6] =
    TableLog.read(spark, dir)
      .select("user_id", "event_type", "event_id", "valid_from",
        "valid_to", "is_current")
      .as[Row6].collect().sortBy(r => (r._1, r._2, r._4, r._3)).toSeq

  private def want(events: org.apache.spark.sql.DataFrame): Seq[Row6] =
    graft.queries.Streaming.scd2(events)
      .select("user_id", "event_type", "event_id", "valid_from",
        "valid_to", "is_current")
      .as[Row6].collect().sortBy(r => (r._1, r._2, r._4, r._3)).toSeq

  test("replay no-ops instead of tripping the order-final guard; crash recovers") {
    val root = Files.createTempDirectory("scd2-pipe").toString
    val h0 = Seq((ts(1), 1L, 101L, "view"), (ts(2), 2L, 102L, "cart"))
      .toDF("ts", "user_id", "event_id", "event_type")
    graft.queries.Streaming.scd2(h0).coalesce(1)
      .write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")

    val b0 = Seq((ts(5), 1L, 105L, "view"), (ts(6), 3L, 106L, "signup"))
      .toDF("ts", "user_id", "event_id", "event_type")
    assert(Scd2Pipeline.applyBatch(spark, b0, s"$root/t",
      Seq("user_id", "event_type"), batchId = 0))
    assert(state(s"$root/t") == want(h0.unionByName(b0)))

    // ENGINE REPLAY: without the id guard this batch would FAIL the
    // order-final contract (it reaches into now-landed history); with
    // it, a clean no-op
    assert(!Scd2Pipeline.applyBatch(spark, b0, s"$root/t",
      Seq("user_id", "event_type"), batchId = 0))
    assert(TableLog.head(spark, s"$root/t").contains(1))

    // CRASH between merge and commit: head untouched, replay of the
    // SAME id lands exactly once
    val b1 = Seq((ts(9), 1L, 109L, "view"))
      .toDF("ts", "user_id", "event_id", "event_type")
    intercept[RuntimeException] {
      Scd2Pipeline.applyBatch(spark, b1, s"$root/t",
        Seq("user_id", "event_type"), batchId = 1,
        crashBeforeCommit = true)
    }
    assert(TableLog.head(spark, s"$root/t").contains(1),
      "crashed batch must not advance the head")
    assert(Scd2Pipeline.applyBatch(spark, b1, s"$root/t",
      Seq("user_id", "event_type"), batchId = 1))
    assert(state(s"$root/t") ==
      want(h0.unionByName(b0).unionByName(b1)))
    assert(TableLog.actions(spark, s"$root/t").map(_._2) ==
      Seq("init", "scd2-batch-0", "scd2-batch-1"))
    // a genuine history rewrite (fresh id, stale timestamp) is still
    // LOUD — the guard protects replays, not rewrites
    val bad = Seq((ts(2), 1L, 777L, "view"))
      .toDF("ts", "user_id", "event_id", "event_type")
    val ex = intercept[IllegalArgumentException] {
      Scd2Pipeline.applyBatch(spark, bad, s"$root/t",
        Seq("user_id", "event_type"), batchId = 2)
    }
    assert(ex.getMessage.contains("append-only"), ex.getMessage)
  }

  test("end-to-end stream ≡ from-scratch scd2 over the full history") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("scd2-pipe-e2e").toString
    val h0 = Seq((ts(1), 1L, 101L, "view"))
      .toDF("ts", "user_id", "event_id", "event_type")
    graft.queries.Streaming.scd2(h0).coalesce(1)
      .write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")

    val stream = MemoryStream[(Long, Long, Long, String)]
    val events = stream.toDF()
      .toDF("h", "user_id", "event_id", "event_type")
      .select(expr("timestamp_micros(h * 3600000000)").as("ts"),
        col("user_id"), col("event_id"), col("event_type"))
    val query = Scd2Pipeline.start(events, s"$root/t",
      s"$root/ckpt", Seq("user_id", "event_type"),
      trigger = Trigger.ProcessingTime(0))
    // event-time-ordered batches (the order-final stream contract)
    val batches = Seq(
      Seq((3L, 1L, 103L, "view"), (4L, 2L, 104L, "cart")),
      Seq((6L, 1L, 106L, "view"), (7L, 3L, 107L, "signup")))
    batches.foreach { b =>
      stream.addData(b: _*)
      query.processAllAvailable()
    }
    query.stop()

    val all = h0.unionByName(
      batches.flatten.toDF("h", "user_id", "event_id", "event_type")
        .select(expr("timestamp_micros(h * 3600000000)").as("ts"),
          col("user_id"), col("event_id"), col("event_type")))
    assert(state(s"$root/t") == want(all))
    val actions = TableLog.actions(spark, s"$root/t").map(_._2)
    assert(actions.head == "init" &&
      actions.tail.forall(_.startsWith("scd2-batch-")),
      actions.mkString(","))
  }
}
