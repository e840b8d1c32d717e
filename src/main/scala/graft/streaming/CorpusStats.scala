package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus-distribution monitor: per-event-time-window
  * DDSketch buckets of a positive metric (doc length, token count, a
  * quality score) over the document stream — the streaming companion
  * to the batch drift alarm (q_drift_psi) and quantile sketch
  * (q_quantile_sketch).
  *
  * The sketch IS a streaming aggregation: bucket(x) = ⌈log_γ x⌉ has
  * fixed boundaries, so `groupBy(window(ts), bucket).count()` is the
  * whole operator — a standard watermarked windowed count that Spark
  * runs incrementally in append mode, emitting each window's
  * (bucket, c) rows exactly once when the watermark closes it. No
  * custom state store, no mapGroupsWithState: the DDSketch design
  * (order-free bucketwise addition) is precisely what makes the
  * built-in incremental aggregation correct here — a KLL compactor
  * would need custom state and merge-order reasoning.
  *
  * Landed stats re-aggregate: windows merge to coarser granularities
  * (hour → day) by summing bucket counts, and [[quantilesByWindow]]
  * reads any landed slice back into per-window quantile estimates
  * with the same α relative-error guarantee (SketchSpec's contract).
  * State per window is ≤ the occupied-bucket count (~2.3k at α=1%
  * across a 10²⁰ dynamic range) — bounded regardless of stream rate.
  */
object CorpusStats {

  private def gamma(alpha: Double): Double = {
    require(alpha > 0 && alpha < 1, s"corpus stats needs 0 < alpha < 1: $alpha")
    (1 + alpha) / (1 - alpha)
  }

  /** (win_start, bucket, c) per closed window. `metric` must be > 0
    * rows are excluded otherwise (log domain). */
  def transform(docs: DataFrame, metric: Column, watermark: String,
      windowLen: String, alpha: Double = 0.01): DataFrame = {
    val g = gamma(alpha)
    docs
      .withColumn("v", metric.cast("double"))
      .filter(col("v") > 0d)
      .withColumn("bucket", ceil(log(g, col("v"))).cast("long"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("win_start"), col("bucket"), col("c"))
  }

  def start(docs: DataFrame, root: String, checkpoint: String,
      metric: Column, watermark: String = "10 minutes",
      windowLen: String = "10 minutes", alpha: Double = 0.01,
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    transform(docs, metric, watermark, windowLen, alpha)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", root)
      .outputMode("append")
      .start()

  /** Batch readout over a landed stats table: quantile estimates at
    * ranks ⌈q·N⌉ PER WINDOW. Sketch-sized work per window (the range
    * self-join is over occupied buckets only). */
  def quantilesByWindow(stats: DataFrame, alpha: Double,
      qs: Seq[Double]): DataFrame = {
    require(qs.forall(q => q > 0 && q <= 1), s"quantiles must be in (0,1]: $qs")
    val spark = stats.sparkSession
    import spark.implicits._
    val g = gamma(alpha)
    val cum = stats.as("a")
      .join(stats.select(col("win_start"), col("bucket").as("b2"),
        col("c").as("c2")).as("b"),
        col("a.win_start") === col("b.win_start") &&
          col("b2") <= col("a.bucket"))
      .groupBy(col("a.win_start").as("win_start"),
        col("a.bucket").as("bucket"))
      .agg(sum(col("c2")).as("cum"))
    val tot = stats.groupBy("win_start").agg(sum("c").as("n"))
    qs.toDF("q")
      .crossJoin(broadcast(cum.join(tot, Seq("win_start"))))
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy("win_start", "q").agg(min("bucket").as("bucket"))
      .select(col("win_start"), col("q"),
        (lit(2.0) * pow(lit(g), col("bucket")) / lit(g + 1)).as("est"))
      .orderBy("win_start", "q")
  }
}
