package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming windowed top-k ("trending now"): per event-time tumbling
  * window, the k most frequent keys with rank — the streaming form of
  * the declared q_stream_topk batch query.
  *
  * Split the way Structured Streaming wants it split:
  *
  *  - [[counts]] is the STREAMING stage: watermarked per-(window, key)
  *    counts in APPEND mode. Spark's windowed-aggregation state handles
  *    sealing — each (window, key) row is emitted exactly once, when
  *    the watermark passes the window end, and late rows are dropped by
  *    the aggregation operator itself (unlike flatMapGroupsWithState,
  *    which admits them — the ADVICE.md discipline — windowed aggs get
  *    the drop natively). State per key-window is one count; nothing
  *    here is corpus-scaled.
  *
  *  - [[rank]] is a bounded BATCH pass over sealed rows (the appended
  *    sink table, or the per-seal slice inside foreachBatch): a rank
  *    window partitioned per time-window — |keys| rows per partition,
  *    never corpus-scaled — with the (count desc, key asc) tie-break
  *    the DuckDB oracle uses. Ranking cannot live inside the streaming
  *    stage: a rank is only final when its window is sealed, which is
  *    exactly the append-mode emission point, so ranking sealed output
  *    is both correct and the only shape that avoids retracting ranks.
  *
  * WindowTopKSpec pins streamed counts+rank ≡ the batch query under
  * shuffled cross-batch arrival and late-row drop.
  */
object WindowTopK {

  /** Streaming stage: watermarked tumbling-window counts per
    * event_type, append-mode sealed. `events` needs (ts, event_type). */
  def counts(events: DataFrame, windowLen: String,
      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"))

  /** Bounded post-seal rank: top-k per window, (n desc, key asc). */
  def rank(sealedCounts: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("ws"))
      .orderBy(col("n").desc, col("event_type"))
    sealedCounts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}
