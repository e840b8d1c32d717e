package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming windowed quantiles — the continuous form of
  * `q_quantile_sketch`'s DDSketch machinery
  * ([[graft.operators.Sketch.ddSketch]]): per tumbling hour, the
  * occupied (bucket, count) histogram of the positive `value` column,
  * emitted ONCE when the watermark passes the window end. Feed the
  * rows to [[graft.operators.Sketch.ddQuantiles]] (per window, or
  * bucket-summed across windows for any coarser range) and the answer
  * is the batch sketch's, exactly.
  *
  * The thirteenth batch↔stream pair — a DDSketch bucketing projection
  * over [[WindowHistogram]], the factored order-insensitive fold
  * machine (see there for the family contract: no pending slice,
  * late-drop, finality-only order sensitivity, tombstone at emit).
  * Bucketing runs MAP-SIDE with the batch kernel's own Catalyst
  * expression (`ceil(log(γ, value))` — shared via [[bucketed]], not
  * re-derived in Scala), so streamed rows are bit-equal to
  * [[batchKernel]]'s by construction of the plan, not by luck of two
  * log implementations agreeing.
  *
  * Retained state per OPEN window: ≤ ⌈log_γ(max/min)⌉ occupied-bucket
  * entries (~2.3k at α = 1% over a 10²⁰ dynamic range) regardless of
  * row count. QuantileStatsSpec pins streamed ≡ batch kernel under
  * shuffled cross-batch arrival, late-drop, and the timer flush, plus
  * cross-window bucket sums ≡ the global batch sketch;
  * StreamingGcSpec drives a 10-year hourly stream proving per-window
  * tombstoning. */
object QuantileStats {

  /** (window start epoch-micros, DDSketch bucket, count) — one sealed
    * histogram row, identical to the batch kernel's. */
  type BucketRow = WindowHistogram.BucketRow

  private[streaming] val WinUs = 3600L * 1000000L
  private[streaming] val Alpha = 0.01

  type QState = WindowHistogram.HState
  val QState = WindowHistogram.HState

  /** The shared bucketing projection: positive values →
    * (win_start_us, bucket). The SAME Catalyst expression feeds the
    * batch kernel and the stream transform — the pair's bit-equality
    * rests on this being one plan fragment, not two log()
    * implementations. */
  private[streaming] def bucketed(events: DataFrame): DataFrame = {
    val gamma = (1 + Alpha) / (1 - Alpha)
    events
      .filter(col("value").cast("double") > 0d)
      .select(col("ts"),
        expr(s"(unix_micros(ts) DIV $WinUs) * $WinUs").as("win_start_us"),
        ceil(log(gamma, col("value").cast("double")))
          .cast("long").as("bucket"))
  }

  /** Batch reference: the per-hour DDSketch histograms a backfill job
    * would compute — the frame the streamed rows must equal. */
  def batchKernel(events: DataFrame): DataFrame =
    bucketed(events)
      .groupBy("win_start_us", "bucket")
      .agg(count(lit(1)).as("c"))

  def transform(events: DataFrame, watermark: String)
      : Dataset[BucketRow] =
    WindowHistogram.transform(
      bucketed(events.withWatermark("ts", watermark)), WinUs)

  /** Pure fold (delegates to the factored machine with this pair's
    * window length) — kept as the spec/GC-drive entry point. */
  private[streaming] def fold(st: QState, add: Array[Long],
      winStart: Long, wmUs: Long)
      : (Option[QState], List[BucketRow]) =
    WindowHistogram.fold(st, add, winStart, WinUs, wmUs)

  def start(events: DataFrame, root: String, checkpoint: String,
      watermark: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    transform(events, watermark)
      .toDF("win_start_us", "bucket", "c")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", root)
      .outputMode("append")
      .start()
}
