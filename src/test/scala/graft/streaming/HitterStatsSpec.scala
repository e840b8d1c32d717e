package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming count-min cells: sealed windows ≡ the batch kernel
  * bit-for-bit under shuffled cross-batch arrival, late-drop, and the
  * timer flush — and merged cells ≡ the GLOBAL batch sketch, so
  * heavy-hitter extraction over the streamed rows runs exactly the
  * batch `Sketch.estimate` path. */
class HitterStatsSpec extends SparkSuite {

  test("streamed sealed windows ≡ batch kernel; merged ≡ global CMS") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // day-1 base, NOT epoch 0 (fMGWS pre-filters rows at or below the
    // watermark, which initializes to 0)
    def ts(minute: Int): Timestamp =
      new Timestamp(86400000L + minute * 60000L)

    val stream = MemoryStream[(Timestamp, String)]
    val events = stream.toDF().toDF("ts", "token")
    val query = HitterStats.transform(events, "token",
        watermark = "5 minutes")
      .toDF("win_start_us", "bucket", "c")
      .writeStream.format("memory").queryName("hitter_stats")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()

    // hour 0 split across batches and arriving SHUFFLED; hour 1
    // sparse; a hot token dominating both hours; empty tokens
    // excluded on both sides
    val batch1 = Seq((0, "the"), (5, "the"), (10, "cat"), (3, ""))
    // minutes 6..9 sit above batch1's watermark (10 − 5 = 5)
    val batch2 = Seq((7, "the"), (9, "sat"), (40, "the"), (70, "mat"))
    val batch3 = Seq((75, "the"), (80, "mat"))
    def add(b: Seq[(Int, String)]): Unit = {
      stream.addData(b.map { case (m, t) => (ts(m), t) }: _*)
      query.processAllAvailable()
    }
    add(batch1); add(batch2); add(batch3)
    // flusher: drags the watermark past both windows' ends — they
    // seal; the flusher's own window stays open and emits nothing
    add(Seq((10000, "flush")))
    add(Seq((15, "the"))) // late probe: lands in an emitted window
    query.stop()

    val got = spark.table("hitter_stats")
      .as[(Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq

    val orderFinal = (batch1 ++ batch2 ++ batch3)
      .map { case (m, t) => (ts(m), t) }
      .toDF("ts", "token")
    val want = HitterStats.batchKernel(orderFinal, "token")
      .as[(Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(want.nonEmpty && got == want,
      s"streamed=${got.mkString(",")}\nbatch=${want.mkString(",")}")
    // two sealed windows; every non-empty order-final token hashed D
    // times — cross-batch accumulation really happened
    assert(got.map(_._1).distinct.size == 2)
    assert(got.map(_._3).sum == 9L * HitterStats.D)

    // mergeability: cell-summing sealed windows through asSketch ≡
    // Sketch.countMin of the order-final stream — the property that
    // lets a reader answer ANY coarser range from the per-hour rows
    val tokens = orderFinal.filter(col("token") =!= "").select("token")
    val merged = HitterStats.asSketch(spark.table("hitter_stats"))
      .as[(Int, Long, Long)].collect().toSet
    val global = graft.operators.Sketch
      .countMin(tokens, "token", d = HitterStats.D, w = HitterStats.W)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == global, s"merged=$merged\nglobal=$global")

    // extraction: estimates off the streamed sketch are the batch
    // path's, and threshold-select the true hitter ("the": 5 of 9 —
    // CMS overestimates never drop a true hitter)
    val est = graft.operators.Sketch.estimate(
        HitterStats.asSketch(spark.table("hitter_stats")),
        tokens.distinct(), "token", d = HitterStats.D, w = HitterStats.W)
      .as[(String, Long)].collect().toMap
    val estBatch = graft.operators.Sketch.estimate(
        graft.operators.Sketch.countMin(tokens, "token",
          d = HitterStats.D, w = HitterStats.W),
        tokens.distinct(), "token", d = HitterStats.D, w = HitterStats.W)
      .as[(String, Long)].collect().toMap
    assert(est == estBatch)
    assert(est.filter { case (_, c) => c * 3 >= 9 }.keySet
      .contains("the"))
  }
}
