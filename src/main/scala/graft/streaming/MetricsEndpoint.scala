package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.HttpServer

/** Local observability endpoint — the reference serves pprof + Prometheus
  * listeners from its CLI root (main.go:17, main.go:26-35; its gauges are
  * registered but never updated — SURVEY.md §2.A#21). Spark already
  * exports engine metrics via `spark.metrics.conf` sinks; this endpoint
  * adds the one thing those don't carry: the INGEST-level counters the
  * reference's stats loop logs, scraped from [[IngestStats]].
  *
  * Serves, on 127.0.0.1:`port`:
  *   - `/metrics` — Prometheus text format: per-query last batch id,
  *     input/processed rows-per-second, epochs observed;
  *   - `/healthz` — 200 "ok" (liveness for a supervisor);
  *   - `/profile?seconds=N` — the pprof-profile analogue (the reference
  *     mounts net/http/pprof, main.go:17,26-27): records the JVM for N
  *     seconds (default 5, capped at 300) with JDK Flight Recorder's
  *     built-in `profile` configuration and returns the `.jfr` bytes,
  *     exactly how `GET /debug/pprof/profile?seconds=N` blocks then
  *     returns a pb.gz. One recording at a time — a concurrent request
  *     gets 409, matching pprof's "profiling already in progress".
  *
  * JDK-built-in `com.sun.net.httpserver` — no dependency, loopback-only
  * bind (operational surface, not a public API).
  */
final class MetricsEndpoint(stats: IngestStats, port: Int = 0) {

  private val server = HttpServer.create(
    new InetSocketAddress("127.0.0.1", port), 0)
  // without an executor every handler runs on the single dispatcher
  // thread — a blocking /profile recording would starve /healthz
  server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(
    r => { val t = new Thread(r, "graft-metrics"); t.setDaemon(true); t }))

  /** Bound port (useful when constructed with port=0 → ephemeral). */
  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: com.sun.net.httpserver.HttpExchange,
      code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  server.createContext("/healthz", ex => respond(ex, 200, "ok\n"))
  server.createContext("/metrics", ex => {
    import scala.jdk.CollectionConverters._
    val rows = stats.progress.asScala.toSeq
    val last = rows.lastOption
    val b = new StringBuilder
    b ++= "# TYPE graft_ingest_epochs_total counter\n"
    b ++= s"graft_ingest_epochs_total ${rows.size}\n"
    b ++= "# TYPE graft_ingest_last_batch_id gauge\n"
    b ++= s"graft_ingest_last_batch_id ${last.map(_._1).getOrElse(-1L)}\n"
    b ++= "# TYPE graft_ingest_input_rows_per_sec gauge\n"
    b ++= s"graft_ingest_input_rows_per_sec ${last.map(_._2).getOrElse(0.0)}\n"
    b ++= "# TYPE graft_ingest_processed_rows_per_sec gauge\n"
    b ++= s"graft_ingest_processed_rows_per_sec ${last.map(_._3).getOrElse(0.0)}\n"
    respond(ex, 200, b.result())
  })

  private val profiling = new java.util.concurrent.atomic.AtomicBoolean(false)

  server.createContext("/profile", ex => {
    // parse defensively: a malformed value must yield the default, not
    // an exception that escapes the handler and drops the exchange with
    // no HTTP response at all
    val seconds = Option(ex.getRequestURI.getQuery).toSeq
      .flatMap(_.split('&')).collectFirst {
        case q if q.startsWith("seconds=") => q.stripPrefix("seconds=")
      }.flatMap(s => scala.util.Try(s.toInt).toOption)
      .getOrElse(5).max(1).min(300)
    if (!profiling.compareAndSet(false, true))
      respond(ex, 409, "a profile recording is already in progress\n")
    else try {
      val rec = new jdk.jfr.Recording(
        jdk.jfr.Configuration.getConfiguration("profile"))
      val dump = java.nio.file.Files.createTempFile("graft-profile", ".jfr")
      val bytes = try {
        rec.start()
        Thread.sleep(seconds * 1000L)
        rec.stop()
        rec.dump(dump)
        java.nio.file.Files.readAllBytes(dump)
      } finally {
        rec.close()
        java.nio.file.Files.deleteIfExists(dump)
      }
      ex.getResponseHeaders.set("Content-Type", "application/octet-stream")
      ex.getResponseHeaders.set("Content-Disposition",
        s"attachment; filename=profile-${seconds}s.jfr")
      ex.sendResponseHeaders(200, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    } catch {
      case e: Exception => respond(ex, 500, s"profile failed: ${e.getMessage}\n")
    } finally profiling.set(false)
  })

  def start(): MetricsEndpoint = { server.start(); this }
  def stop(): Unit = server.stop(0)
}
