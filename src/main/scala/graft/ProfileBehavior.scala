package graft

import org.apache.spark.sql.functions._

/** Scale sweep for the behavioral-analytics family: synthetic event
  * corpora (hash-derived types/timestamps, zero RNG) at 1M and 10M
  * events, run through the SAME declared queries via a temp table dir
  * — the evidence the one-exchange funnel cascade, the lag-window
  * transition matrix and the rolling-anomaly window hold when the
  * events table is 1000× the sf0.1 fixture.
  *
  * Usage: runMain graft.ProfileBehavior [nEvents ...]
  *        (default 1000000 10000000)
  */
object ProfileBehavior {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-behavior")
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(1000000L, 10000000L)
    sizes.foreach { n =>
      val users = math.max(100L, n / 2000L) // ~2k events/user
      val dir = java.nio.file.Files
        .createTempDirectory(s"behav$n").toString
      spark.range(n)
        .select(col("id").as("event_id"),
          // 60 days of event time, hash-spread (a small linear stripe
          // covered only minutes — every window test was degenerate)
          timestamp_micros(lit(1704067200000000L) +
            pmod(xxhash64(col("id"), lit(3)), lit(60L * 86400000000L)))
            .cast("timestamp_ntz").as("ts"),
          pmod(xxhash64(col("id")), lit(users)).as("user_id"),
          element_at(array(lit("signup"), lit("view"), lit("click"),
            lit("purchase"), lit("error")),
            (pmod(xxhash64(col("id"), lit(7)), lit(5)) + 1).cast("int"))
            .as("event_type"),
          (pmod(xxhash64(col("id"), lit(9)), lit(10000)) / 100.0)
            .as("value"),
          lit("{}").as("props"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      def time(fam: QueryFamily, q: String): Double = {
        val t0 = System.nanoTime()
        fam.queries(q)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val funnel = time(queries.Behavior, "q_funnel")
      val trans = time(queries.Behavior, "q_event_transitions")
      val anom = time(queries.Behavior, "q_rolling_anomaly")
      val ret = time(queries.Behavior, "q_retention_cohort")
      val sess = time(queries.Behavior, "q_sessionize")
      val regex = time(queries.Behavior, "q_sequence_regex")
      val attr = time(queries.Behavior, "q_attribution")
      val ewma = time(queries.Behavior, "q_ewma")
      val topk = time(queries.Streaming, "q_stream_topk")
      val scd2 = time(queries.Streaming, "q_scd2")
      println(f"BEHAVIOR n=$n users=$users funnel=$funnel%.2fs " +
        f"transitions=$trans%.2fs anomaly=$anom%.2fs " +
        f"retention=$ret%.2fs sessionize=$sess%.2fs " +
        f"seq_regex=$regex%.2fs attribution=$attr%.2fs ewma=$ewma%.2fs " +
        f"stream_topk=$topk%.2fs scd2=$scd2%.2fs " +
        f"(${n / funnel / 1e6}%.1fM ev/s funnel)")
    }
    spark.stop()
  }
}
