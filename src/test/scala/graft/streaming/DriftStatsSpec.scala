package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming fixed-bin drift histograms: sealed windows ≡ the batch
  * kernel bit-for-bit under shuffled cross-batch arrival, late-drop,
  * and the timer flush; psiU ≡ an independent PSI reimplementation;
  * and a planted distribution shift alarms while a stationary window
  * does not. */
class DriftStatsSpec extends SparkSuite {

  private val bounds = Seq(10.0, 50.0, 100.0)

  test("psiU ≡ independent PSI; identical histograms score 0") {
    val ref = Map(0L -> 40L, 1L -> 30L, 2L -> 20L, 3L -> 10L)
    val win = Map(0L -> 5L, 1L -> 10L, 2L -> 30L, 3L -> 55L)
    // independent reimplementation: literal textbook formula, no
    // shared helpers
    val bins = (ref.keySet ++ win.keySet).toSeq.sorted
    val v = bins.size.toDouble
    val (na, nb) = (ref.values.sum.toDouble, win.values.sum.toDouble)
    val expected = bins.map { b =>
      val p = (ref.getOrElse(b, 0L) + 1) / (na + v)
      val q = (win.getOrElse(b, 0L) + 1) / (nb + v)
      math.floor(1e6 * (p - q) * math.log(p / q)).toLong
    }.sum
    assert(DriftStats.psiU(ref, win) == expected)
    assert(expected > 250000L, "the planted shift must cross the alarm")
    // identical histograms: every term is exactly 0 (p == q)
    assert(DriftStats.psiU(ref, ref) == 0L)
    // disjoint support still defined (add-one smoothing)
    assert(DriftStats.psiU(Map(0L -> 10L), Map(3L -> 10L)) > 0L)
  }

  test("streamed sealed windows ≡ batch kernel; drifted window alarms") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // day-1 base, NOT epoch 0 (fMGWS pre-filters rows at or below the
    // watermark, which initializes to 0)
    def ts(minute: Int): Timestamp =
      new Timestamp(86400000L + minute * 60000L)

    val stream = MemoryStream[(Timestamp, Double)]
    val events = stream.toDF().toDF("ts", "value")
    val query = DriftStats.transform(events, bounds,
        watermark = "5 minutes")
      .toDF("win_start_us", "bucket", "c")
      .writeStream.format("memory").queryName("drift_stats")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()

    // hour 0 tracks the reference shape (most mass low), split across
    // batches and arriving SHUFFLED; hour 1 is the planted shift
    // (mass pushed above the top boundary)
    val batch1 = Seq((0, 3.0), (5, 7.0), (10, 20.0), (3, 55.0))
    // minutes 6..9 sit above batch1's watermark (10 − 5 = 5)
    val batch2 = Seq((7, 4.0), (9, 30.0), (40, 8.0), (70, 150.0))
    val batch3 = Seq((75, 120.0), (80, 200.0), (85, 9.0), (90, 101.0))
    def add(b: Seq[(Int, Double)]): Unit = {
      stream.addData(b.map { case (m, v) => (ts(m), v) }: _*)
      query.processAllAvailable()
    }
    add(batch1); add(batch2); add(batch3)
    // flusher: drags the watermark past both windows' ends
    add(Seq((10000, 1.0)))
    add(Seq((15, 2.0))) // late probe: lands in an emitted window
    query.stop()

    val got = spark.table("drift_stats")
      .as[(Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq

    val orderFinal = (batch1 ++ batch2 ++ batch3)
      .map { case (m, v) => (ts(m), v) }
      .toDF("ts", "value")
    val want = DriftStats.batchKernel(orderFinal, bounds)
      .as[(Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(want.nonEmpty && got == want,
      s"streamed=${got.mkString(",")}\nbatch=${want.mkString(",")}")
    assert(got.map(_._1).distinct.size == 2, "two sealed windows")
    assert(got.map(_._3).sum == 12L, "12 order-final values")

    // the monitor: reference = hour 0's histogram; hour 0 vs itself
    // is silent, hour 1's shift crosses the 0.25 alarm
    val wins = got.groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val Seq(h0, h1) = wins.keySet.toSeq.sorted.map(wins)
    assert(DriftStats.psiU(h0, h0) == 0L)
    assert(DriftStats.psiU(h0, h1) > 250000L,
      s"planted shift scored ${DriftStats.psiU(h0, h1)}")
  }
}
