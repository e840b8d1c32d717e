package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.{Decode, ParquetTuning, ProtoSchema, RangePartitioner, RangeSink}
import graft.ingest.ProtoSchema.PMessage

/** The reference's whole pipeline on Structured Streaming (SURVEY.md §3.1
  * restated): block stream → proto decode → main table (+ per-repeated-
  * field child tables when exploding) → range-named Parquet sinks, with
  * checkpointed exactly-once delivery.
  *
  * The input is any streaming DataFrame with columns
  * `(block_number: long, block_id: string, payload: binary)` — a file
  * source over block parquet in tests, a custom gRPC DSv2 source in a live
  * deployment (SURVEY.md §7.3: deferred; behaviorally equivalent for
  * everything testable).
  *
  * One foreachBatch writes ALL tables per epoch — a single offset log, the
  * N-sinks-off-one-source layout the reference approximates with explode
  * worker fan-out (SURVEY.md §3.2).
  */
object BlockPipeline {

  def start(
      blocks: DataFrame,
      schema: PMessage,
      root: String,
      partitioner: RangePartitioner,
      checkpoint: String,
      explode: Boolean = false,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      tuning: ParquetTuning = ParquetTuning()): StreamingQuery = {

    val mainSink = RangeSink(s"$root/main", partitioner, tuning = tuning)
    val childSinks: Seq[(String, RangeSink)] =
      if (!explode) Seq.empty
      else ProtoSchema.explodableFields(schema)
        .map(f => f.name -> RangeSink(s"$root/${f.name}", partitioner,
          tuning = tuning))

    blocks.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, epochId: Long) =>
        // decode ONCE per epoch (reference decodes once and fans out,
        // sinker.go:195); every table derives from the cached result
        val dec = Decode.decoded(df, schema).persist()
        try {
          val fieldByName = ProtoSchema.explodableFields(schema)
            .map(f => f.name -> f).toMap
          // tables are independent sinks off one cached input — write
          // them CONCURRENTLY (the reference overlaps its exploded
          // writes the same way, factory.go worker pools). Spark's
          // scheduler interleaves the jobs; the cache is built once.
          import scala.concurrent.{Await, ExecutionContext, Future}
          import scala.concurrent.duration.Duration
          val writes = 1 + childSinks.size
          val pool = java.util.concurrent.Executors.newFixedThreadPool(writes)
          implicit val ec: ExecutionContext =
            ExecutionContext.fromExecutor(pool)
          try {
            val jobs = Future {
              mainSink.processBatch(Decode.mainFromDecoded(dec), epochId)
            } +: childSinks.map { case (name, sink) => Future {
              sink.processBatch(
                Decode.childFromDecoded(dec, fieldByName(name)), epochId)
            }}
            Await.result(Future.sequence(jobs), Duration.Inf)
            ()
          } finally pool.shutdown()
        } finally dec.unpersist()
      }
      .start()
  }
}
