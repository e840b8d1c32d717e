package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.operators.Sketch

/** Streaming DDSketch contract: the landed per-window buckets equal
  * the batch sketch of the same window's data EXACTLY (fixed bucket
  * boundaries ⇒ the streaming incremental aggregation and the batch
  * groupBy are the same arithmetic), late data is dropped, and the
  * quantile readout honors the alpha guarantee per window. */
class CorpusStatsSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val Alpha = 0.01

  test("per-window buckets equal the batch sketch; late data drops") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[(Long, Timestamp, Long)]
    val docs = stream.toDF().toDF("doc_id", "ts", "n_tokens")
    val out = CorpusStats.transform(docs, col("n_tokens"),
      watermark = "10 minutes", windowLen = "10 minutes", alpha = Alpha)
    val query = out.writeStream
      .format("memory").queryName("corpus_stats")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    // window [10:00,10:10): token counts 10..59; plus a zero-metric
    // row that must be excluded (log domain)
    val w1 = (0 until 50).map(i => (i.toLong, ts(i % 10), 10L + i))
    stream.addData(w1 :+ ((99L, ts(3), 0L)): _*)
    query.processAllAvailable()
    // advance the watermark past the first window
    val w2 = (0 until 30).map(i => (100L + i, ts(30 + i % 10), 500L + 7 * i))
    stream.addData(w2: _*)
    query.processAllAvailable()
    // LATE row for the closed first window — must be dropped
    stream.addData((999L, ts(1), 40L))
    query.processAllAvailable()
    // close the second window
    stream.addData((1000L, ts(59), 17L))
    query.processAllAvailable()
    query.stop()

    val landed = spark.table("corpus_stats")
      .select(col("win_start").cast("string"), col("bucket"), col("c"))
      .as[(String, Long, Long)].collect()

    // first window: exactly the batch ddSketch of values 10..59
    val batch1 = Sketch.ddSketch(
      w1.map(_._3.toDouble).toDF("v"), "v", Alpha)
      .as[(Long, Long)].collect().toSet
    val got1 = landed.filter(_._1 == "2024-01-01 10:00:00")
      .map(t => (t._2, t._3)).toSet
    assert(got1 == batch1,
      s"window 1 diverged from the batch sketch:\n$got1\nvs\n$batch1")

    // second window: the batch sketch of its 30 values
    val batch2 = Sketch.ddSketch(
      w2.map(_._3.toDouble).toDF("v"), "v", Alpha)
      .as[(Long, Long)].collect().toSet
    val got2 = landed.filter(_._1 == "2024-01-01 10:30:00")
      .map(t => (t._2, t._3)).toSet
    assert(got2 == batch2, "window 2 diverged from the batch sketch")
  }

  test("quantile readout per window holds the alpha guarantee") {
    import spark.implicits._
    // two landed windows with known distributions, straight to the
    // batch readout (the streaming path is pinned above)
    val v1 = (1 to 200).map(_.toDouble * 3)
    val v2 = (1 to 120).map(i => 1000.0 + i * i)
    def sk(vs: Seq[Double], win: String) =
      Sketch.ddSketch(vs.toDF("v"), "v", Alpha)
        .select(lit(Timestamp.valueOf(win)).as("win_start"),
          col("bucket"), col("c"))
    val stats = sk(v1, "2024-01-01 10:00:00")
      .union(sk(v2, "2024-01-01 10:10:00"))
    val qs = Seq(0.1, 0.5, 0.9, 1.0)
    val est = CorpusStats.quantilesByWindow(stats, Alpha, qs)
      .select(col("win_start").cast("string"), col("q"), col("est"))
      .as[(String, Double, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toMap).toMap
    def checkWin(win: String, vs: Seq[Double]): Unit = {
      val sorted = vs.sorted
      qs.foreach { q =>
        val x = sorted(math.ceil(q * sorted.size).toInt - 1)
        val e = est(win)(q)
        assert(math.abs(e - x) <= Alpha * x,
          s"$win q=$q: est $e vs exact $x")
      }
    }
    checkWin("2024-01-01 10:00:00", v1)
    checkWin("2024-01-01 10:10:00", v2)
  }

  test("windows re-aggregate to coarser granularity by bucket addition") {
    import spark.implicits._
    val v1 = (1 to 80).map(_.toDouble)
    val v2 = (1 to 80).map(i => i * 2.5)
    def sk(vs: Seq[Double], win: String) =
      Sketch.ddSketch(vs.toDF("v"), "v", Alpha)
        .select(lit(Timestamp.valueOf(win)).as("win_start"),
          col("bucket"), col("c"))
    val fine = sk(v1, "2024-01-01 10:00:00")
      .union(sk(v2, "2024-01-01 10:10:00"))
    val hourly = fine
      .groupBy(date_trunc("hour", col("win_start")).as("win_start"),
        col("bucket"))
      .agg(sum("c").as("c"))
    val whole = Sketch.ddSketch((v1 ++ v2).toDF("v"), "v", Alpha)
      .as[(Long, Long)].collect().toSet
    val got = hourly.select("bucket", "c")
      .as[(Long, Long)].collect().toSet
    assert(got == whole, "hourly roll-up diverged from the whole sketch")
  }
}
