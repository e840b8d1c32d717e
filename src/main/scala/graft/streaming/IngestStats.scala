package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Ingest observability (SURVEY.md §2.A#21) — the reference logs
  * files/bytes/rows + derived rows/s every 30 s (sinker.go:18-90, with
  * dead Prometheus gauges). The Spark-native equivalent reads the same
  * signals off the streaming progress events: rows/s in+processed,
  * batch durations, state-store metrics — already wired to the
  * `spark.metrics.conf` sinks (Prometheus/JMX) without extra code.
  *
  * Attach: `spark.streams.addListener(new IngestStats(log))`.
  */
final class IngestStats(log: String => Unit = s => Console.err.println(s))
    extends StreamingQueryListener {

  /** Rolling record of per-epoch progress (for tests / debugging). */
  val progress = new ConcurrentLinkedQueue[(Long, Double, Double)]()

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    log(s"[ingest] query ${event.id} started (${event.name})")

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    progress.add((p.batchId, p.inputRowsPerSecond, p.processedRowsPerSecond))
    log(f"[ingest] batch=${p.batchId} rows=${p.numInputRows} " +
      f"in=${p.inputRowsPerSecond}%.1f rows/s " +
      f"processed=${p.processedRowsPerSecond}%.1f rows/s " +
      f"durationMs=${p.durationMs.getOrDefault("triggerExecution", -1L)}")
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    log(s"[ingest] query ${event.id} terminated" +
      event.exception.map(e => s" with error: $e").getOrElse(""))
}
