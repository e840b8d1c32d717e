package graft.streaming

import java.net.URI

import org.scalatest.funsuite.AnyFunSuite

/** The reference's metrics/health listeners (main.go:26-35), functional:
  * unlike its never-updated gauges, these serve real IngestStats. */
class MetricsEndpointSpec extends AnyFunSuite {

  private def get(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    val code = conn.getResponseCode
    val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
    (code, body)
  }

  test("healthz and metrics serve IngestStats counters") {
    val stats = new IngestStats(_ => ())
    stats.progress.add((0L, 100.0, 120.0))
    stats.progress.add((1L, 200.0, 180.5))
    val ep = new MetricsEndpoint(stats).start()
    try {
      val base = s"http://127.0.0.1:${ep.boundPort}"
      assert(get(s"$base/healthz") == (200, "ok\n"))
      val (code, body) = get(s"$base/metrics")
      assert(code == 200)
      assert(body.contains("graft_ingest_epochs_total 2"))
      assert(body.contains("graft_ingest_last_batch_id 1"))
      assert(body.contains("graft_ingest_processed_rows_per_sec 180.5"))
    } finally ep.stop()
  }

  test("empty stats serve zero-state, not errors") {
    val ep = new MetricsEndpoint(new IngestStats(_ => ())).start()
    try {
      val (code, body) = get(s"http://127.0.0.1:${ep.boundPort}/metrics")
      assert(code == 200)
      assert(body.contains("graft_ingest_last_batch_id -1"))
    } finally ep.stop()
  }
}
