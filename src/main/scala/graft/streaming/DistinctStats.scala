package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming per-window DISTINCT monitor: the KMV bottom-k sketch
  * ([[graft.operators.Sketch.kmv]]) as a continuous operator — each
  * closed event-time window emits its ≤ k smallest distinct item
  * hashes, the persistable sketch rows that answer "how many distinct
  * users/tokens/sources this hour" AND cross-window overlap questions
  * (intersections/Jaccard between any two landed windows) that the
  * HLL-style register designs cannot.
  *
  * Unlike [[CorpusStats]] (whose DDSketch is a plain windowed count —
  * fixed buckets make the built-in incremental aggregation sufficient),
  * bottom-k is NOT expressible as a built-in aggregate without
  * unbounded per-window distinct state, so this is the
  * `flatMapGroupsWithState` shape: state = one ≤ k-entry sorted array
  * per open window (bounded however fast the stream), updated
  * incrementally per micro-batch, emitted EXACTLY ONCE when the
  * event-time timeout fires at watermark passage — append-mode
  * semantics with replay idempotence from the checkpoint.
  *
  * Because the KMV sketch is an exact SET property of the window's
  * items (not a sampling artifact), the streamed rows are BIT-FOR-BIT
  * the batch `Sketch.kmv` of the same window — DistinctStatsSpec pins
  * the equivalence, the strongest batch-parity contract in the
  * streaming family. */
object DistinctStats {

  /** (win_start, h) rows for CLOSED windows — ≤ k per window. `items`
    * needs an event-time `ts` column; `itemCol` is hashed with the
    * same xxhash64 as the batch sketch. */
  def transform(items: DataFrame, itemCol: Column, watermark: String,
      windowLen: String, k: Int): Dataset[(Timestamp, Long)] = {
    require(k > 1, s"distinct stats needs k > 1: $k")
    val spark = items.sparkSession
    import spark.implicits._
    val winMs = windowMillis(windowLen)
    items
      .withWatermark("ts", watermark)
      // ts stays in the frame: the watermark annotation travels on the
      // event-time COLUMN, and the event-time timeout needs it present
      // at the stateful operator
      .select(col("ts"),
        window(col("ts"), windowLen).getField("start").as("win_start"),
        xxhash64(itemCol).as("h"))
      .as[(Timestamp, Timestamp, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Array[Long], (Timestamp, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (win, rows, state: GroupState[Array[Long]]) =>
          if (state.hasTimedOut) {
            val hs = state.get
            state.remove()
            hs.iterator.map(h => (win, h))
          } else {
            val bottom = new java.util.TreeSet[java.lang.Long]()
            state.getOption.foreach(_.foreach(h => bottom.add(h)))
            rows.foreach { case (_, _, h) =>
              if (bottom.size < k) bottom.add(h)
              else if (h < bottom.last()) {
                if (bottom.add(h)) bottom.pollLast()
              }
            }
            val arr = new Array[Long](bottom.size)
            val it = bottom.iterator()
            var i = 0
            while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
            state.update(arr)
            // fire when the watermark passes the window end
            state.setTimeoutTimestamp(win.getTime + winMs)
            Iterator.empty
          }
      }
  }

  def start(items: DataFrame, root: String, checkpoint: String,
      itemCol: Column, watermark: String = "10 minutes",
      windowLen: String = "10 minutes", k: Int = 1024,
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    transform(items, itemCol, watermark, windowLen, k)
      .toDF("win_start", "h")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", root)
      .outputMode("append")
      .start()

  /** Batch readout over landed sketch rows: per-window distinct
    * estimate — exact row count below k, (k−1)/θ above (the
    * [[graft.operators.Sketch.kmvEstimate]] formula, here as one
    * aggregation over all windows at once). */
  def distinctByWindow(stats: DataFrame, k: Int): DataFrame =
    stats.groupBy("win_start")
      .agg(count(lit(1)).as("m"), max("h").as("hmax"))
      .select(col("win_start"),
        when(col("m") < k, col("m").cast("double"))
          .otherwise(lit(k - 1) /
            (col("hmax") / lit(1.8446744073709552e19) + lit(0.5)))
          .as("est"))
      .orderBy("win_start")

  /** "N minutes"/"N seconds"/"N hours" → milliseconds (the window
    * lengths this monitor is used at; sub-day by construction). */
  private def windowMillis(len: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String
        .fromString(len))
    require(iv.months == 0, s"window length must be sub-month: $len")
    iv.days * 86400000L + iv.microseconds / 1000L
  }
}
