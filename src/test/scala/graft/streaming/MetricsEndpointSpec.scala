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

  test("/profile records the JVM and returns JFR bytes (pprof analogue)") {
    val ep = new MetricsEndpoint(new IngestStats(_ => ())).start()
    try {
      val base = s"http://127.0.0.1:${ep.boundPort}"
      val conn = URI.create(s"$base/profile?seconds=1").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 200)
      val bytes = conn.getInputStream.readAllBytes()
      // JFR chunk magic: 'F' 'L' 'R' \0
      assert(bytes.length > 4 &&
        bytes.take(4).sameElements(Array[Byte]('F', 'L', 'R', 0)),
        s"expected a JFR stream, got ${bytes.take(4).toSeq}")
      // a recording must not have starved liveness: healthz answers
      // while nothing else is running
      assert(get(s"$base/healthz") == (200, "ok\n"))
    } finally ep.stop()
  }

  test("concurrent /profile requests get 409, not interleaved recordings") {
    val ep = new MetricsEndpoint(new IngestStats(_ => ())).start()
    try {
      val base = s"http://127.0.0.1:${ep.boundPort}"
      val first = new Thread(() =>
        get(s"$base/profile?seconds=2"): Unit)
      first.start()
      Thread.sleep(400) // let the first recording start
      val conn = URI.create(s"$base/profile?seconds=1").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 409)
      first.join(15000)
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
