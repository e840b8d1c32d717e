package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming windowed heavy-hitter sketch — the continuous form of
  * `q_heavy_hitters_cms`' count-min machinery
  * ([[graft.operators.Sketch.countMin]]): per tumbling hour, the
  * occupied (cell, count) rows of a d×w count-min sketch over the
  * token column, emitted ONCE when the watermark passes the window
  * end. [[asSketch]] turns sealed rows (one window, or cell-summed
  * across any set of windows) back into the (r, bucket, c) frame
  * [[graft.operators.Sketch.estimate]] consumes — so heavy-hitter
  * extraction over ANY time range runs exactly the batch path.
  *
  * The fourteenth batch↔stream pair, and the second bucketing
  * projection over [[WindowHistogram]] (see there for the family
  * contract): CMS merge is cellwise ADDITION, so like DDSketch it
  * needs no pending slice — arrival order cannot change a counter
  * array, only finality matters. The d row-hashes run MAP-SIDE
  * through the batch kernel's own Catalyst expression
  * (explode(sequence) × pmod(xxhash64(r, token), w) — shared via
  * [[bucketed]], the exact construction of `Sketch.countMin`), so
  * sealed windows are bit-equal to [[batchKernel]]'s frame and
  * cross-window sums are bit-equal to the global batch sketch by
  * construction of the plan.
  *
  * This is the open-token-space member of the streaming quality
  * family: where [[DistinctStats]]' KMV bounds distinct-count state
  * and [[QuantileStats]]' DDSketch bounds quantile state by dynamic
  * range, the CMS bounds FREQUENCY state at d·w cells per open window
  * (4×1024 = 4096 longs ≈ 32 KiB) no matter how many distinct tokens
  * stream through — a per-token exact count would retain the open
  * vocabulary itself. HitterStatsSpec pins streamed ≡ batch kernel
  * under shuffled cross-batch arrival, late-drop, and the timer
  * flush, plus merged-cells heavy-hitter extraction ≡ the batch CMS
  * path; StreamingGcSpec drives 1M all-distinct tokens proving the
  * d·w state bound. */
object HitterStats {

  /** (window start epoch-micros, cell = r·w + bucket, count). */
  type CellRow = WindowHistogram.BucketRow

  private[streaming] val WinUs = 3600L * 1000000L
  private[streaming] val D = 4
  private[streaming] val W = 1024

  /** The shared hashing projection: non-empty tokens →
    * (win_start_us, cell) with cell = r·W + pmod(xxhash64(r, token), W)
    * for r in 0..D−1 — the SAME explode(sequence)+xxhash64 construction
    * as `Sketch.countMin`, flattened to one long so the generic
    * histogram fold carries it. One plan fragment feeds the batch
    * kernel and the stream transform. */
  private[streaming] def bucketed(events: DataFrame, tokenCol: String)
      : DataFrame =
    events
      .filter(col(tokenCol).isNotNull && col(tokenCol) =!= "")
      .select(col("ts"),
        expr(s"(unix_micros(ts) DIV $WinUs) * $WinUs").as("win_start_us"),
        col(tokenCol).cast("string").as("token"),
        explode(sequence(lit(0), lit(D - 1))).as("r"))
      .select(col("ts"), col("win_start_us"),
        (col("r").cast("long") * W +
          pmod(xxhash64(col("r"), col("token")), lit(W))).as("bucket"))

  /** Batch reference: the per-hour CMS cell rows a backfill job would
    * compute — the frame the streamed rows must equal. */
  def batchKernel(events: DataFrame, tokenCol: String): DataFrame =
    bucketed(events, tokenCol)
      .groupBy("win_start_us", "bucket")
      .agg(count(lit(1)).as("c"))

  /** Sealed rows (any window subset) → the (r, bucket, c) sketch frame
    * `Sketch.estimate` consumes; summing cells across windows IS the
    * CMS merge, so the result over all windows equals
    * `Sketch.countMin` of the order-final stream bit-for-bit. */
  def asSketch(rows: DataFrame): DataFrame =
    rows
      .groupBy(expr(s"CAST(bucket DIV $W AS INT)").as("r"),
        pmod(col("bucket"), lit(W.toLong)).as("bucket"))
      .agg(sum(col("c")).as("c"))

  def transform(events: DataFrame, tokenCol: String, watermark: String)
      : Dataset[CellRow] =
    WindowHistogram.transform(
      bucketed(events.withWatermark("ts", watermark), tokenCol), WinUs)

  def start(events: DataFrame, tokenCol: String, root: String,
      checkpoint: String, watermark: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    transform(events, tokenCol, watermark)
      .toDF("win_start_us", "bucket", "c")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", root)
      .outputMode("append")
      .start()
}
