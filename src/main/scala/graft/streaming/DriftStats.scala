package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming drift monitor — the continuous form of `q_drift_psi_binned`:
  * per tumbling hour, the FIXED-BIN histogram of the `value` column
  * against a reference binning (a training artifact, like a vocab or
  * centroid table: boundaries computed ONCE from the reference corpus,
  * then literals in the plan), emitted when the watermark seals the
  * window. [[psiU]] turns any sealed window (or bin-summed window
  * range) plus the reference histogram into the Population Stability
  * Index in integer micro-units — the production alarm for "this
  * hour's traffic shifted under the filters", evaluated per hour
  * instead of per batch job.
  *
  * The fifteenth batch↔stream pair and the third bucketing projection
  * over [[WindowHistogram]] (see there for the family contract).
  * Binning runs MAP-SIDE through the batch kernel's own Catalyst
  * expression ([[binExpr]] — a sum of `value >= boundary` indicators,
  * shared via [[bucketed]]), so sealed windows are bit-equal to
  * [[batchKernel]]'s frame by construction of the plan.
  *
  * Why fixed bins and not the token-keyed PSI of `q_drift_psi`: a
  * token-keyed per-window histogram retains the OPEN vocabulary in
  * state — unbounded; the numeric-bin form is the classic PSI shape
  * and its state is `bounds.size + 1` cells per open window, gone at
  * emit. (Token drift at scale streams through [[HitterStats]]'
  * bounded CMS cells instead.) DriftStatsSpec pins streamed ≡ batch
  * kernel under shuffled cross-batch arrival, late-drop, and the
  * timer flush, psiU against an independent reimplementation, and the
  * planted-drift alarm; StreamingGcSpec drives 1M rows proving the
  * bin-count state bound. */
object DriftStats {

  /** (window start epoch-micros, bin, count). */
  type BinRow = WindowHistogram.BucketRow

  private[streaming] val WinUs = 3600L * 1000000L

  /** The default reference binning for the declared query's `events`
    * table — boundaries near the deciles of the reference snapshot,
    * exact double literals so both engines compare identically. */
  val Bounds: Seq[Double] = Seq(5.0, 15.0, 35.0, 70.0, 115.0, 200.0)

  /** bin(v) = #{boundaries ≤ v} — a codegen'd sum of indicators, the
    * ONE expression both the batch kernel and the stream fold over
    * (and the declared query mirrors in SQL as summed CASE WHENs). */
  def binExpr(value: Column, bounds: Seq[Double]): Column =
    bounds.map(b => when(value >= b, 1L).otherwise(0L))
      .reduce(_ + _)

  /** The shared projection: non-null values → (win_start_us, bin). */
  private[streaming] def bucketed(events: DataFrame,
      bounds: Seq[Double]): DataFrame =
    events
      .filter(col("value").isNotNull)
      .select(col("ts"),
        expr(s"(unix_micros(ts) DIV $WinUs) * $WinUs").as("win_start_us"),
        binExpr(col("value").cast("double"), bounds).as("bucket"))

  /** Batch reference: the per-hour fixed-bin histograms a backfill job
    * would compute — the frame the streamed rows must equal. */
  def batchKernel(events: DataFrame, bounds: Seq[Double]): DataFrame =
    bucketed(events, bounds)
      .groupBy("win_start_us", "bucket")
      .agg(count(lit(1)).as("c"))

  def transform(events: DataFrame, bounds: Seq[Double],
      watermark: String): Dataset[BinRow] =
    WindowHistogram.transform(
      bucketed(events.withWatermark("ts", watermark), bounds), WinUs)

  /** PSI in integer micro-units between a reference histogram and a
    * sealed window (or any bin-sum of windows): add-one smoothing over
    * the OCCUPIED-bin union (the `q_drift_psi` convention), per-bin
    * floor(1e6·(p−q)·ln(p/q)) summed — monitor-side math over ≤
    * bounds.size+1 entries. ≥ 0 up to per-bin floor (each term is
    * (p−q)ln(p/q) ≥ 0); alarm thresholds are the classic 0.1/0.25,
    * i.e. 100_000/250_000 micro-units. */
  def psiU(ref: Map[Long, Long], win: Map[Long, Long]): Long = {
    val bins = (ref.keySet ++ win.keySet).toSeq.sorted
    val v = bins.size.toDouble
    val nRef = ref.valuesIterator.sum.toDouble
    val nWin = win.valuesIterator.sum.toDouble
    bins.iterator.map { b =>
      val p = (ref.getOrElse(b, 0L) + 1).toDouble / (nRef + v)
      val q = (win.getOrElse(b, 0L) + 1).toDouble / (nWin + v)
      math.floor(1e6 * (p - q) * math.log(p / q)).toLong
    }.sum
  }

  def start(events: DataFrame, bounds: Seq[Double], root: String,
      checkpoint: String, watermark: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    transform(events, bounds, watermark)
      .toDF("win_start_us", "bucket", "c")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", root)
      .outputMode("append")
      .start()
}
