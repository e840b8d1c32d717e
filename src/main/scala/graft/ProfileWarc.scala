package graft

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.functions.Web
import graft.sources.Warc

/** Developer tool: WARC ingest throughput — records/s and payload MB/s
  * through parse → HTTP split → HTML strip, the full crawl front door.
  * `args`: [nFiles] [recordsPerFile] [runs] [gzip(0|1)].
  *
  * Synthetic archives written once to a temp dir (deterministic HTML
  * bodies ~1 KB); the measured path is the production one: binaryFiles
  * → streaming parse → responses() → htmlText → aggregate. File count
  * is the parallelism unit, so nFiles should be ≥ cores to measure the
  * saturated rate.
  */
object ProfileWarc {

  private def mix(z0: Long): Long = ProfileBpe.mix(z0)

  private def record(uri: String, body: String): Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      body).getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: <$uri>\r\n" +
      s"WARC-Date: 2026-08-14T00:00:00Z\r\n" +
      s"Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("UTF-8") ++
      http ++ "\r\n\r\n".getBytes("UTF-8")
  }

  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(32)
    val perFile = args.lift(1).map(_.toInt).getOrElse(5000)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val gzip = args.lift(3).forall(_ == "1")
    val dir = Files.createTempDirectory("profile-warc").toString

    var totalBytes = 0L
    (0 until nFiles).foreach { f =>
      val suffix = if (gzip) ".warc.gz" else ".warc"
      val raw = new BufferedOutputStream(
        new FileOutputStream(s"$dir/f$f$suffix"), 1 << 16)
      val out = if (gzip) new GZIPOutputStream(raw, 1 << 16) else raw
      (0 until perFile).foreach { r =>
        val id = f.toLong * perFile + r
        val words = (0 until 100).map(w =>
          s"w${mix(id * 131 + w).abs % 5000}").mkString(" ")
        val body = s"<html><head><script>x=1</script></head><body>" +
          s"<h1>Doc $id</h1><p>$words</p></body></html>"
        val rec = record(s"http://h$f.example.com/p$r?utm_source=x", body)
        totalBytes += rec.length
        // single-member-per-FILE gzip here (the reader consumes CC's
        // member-per-record and this identically; WarcSpec pins both)
        out.write(rec)
      }
      out.close()
    }
    val spark = Sessions.get("profile-warc")
    val n = nFiles.toLong * perFile
    println(f"[profile-warc] files=$nFiles records=$n " +
      f"payloadMB=${totalBytes / 1e6}%.0f gzip=$gzip")
    (1 to runs).foreach { r =>
      val t0 = System.nanoTime()
      val docs = Warc.responses(Warc.read(spark, s"$dir/*.warc*"))
        .select(Web.urlNormalize(col("target_uri")).as("url"),
          Web.htmlText(col("body")).as("text"))
        .agg(count(lit(1)), sum(length(col("text")))).collect().head
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile-warc] run$r: ${docs.getLong(0)} docs in $dt%.1fs " +
        f"(${n / dt}%.0f rec/s, ${totalBytes / dt / 1e6}%.0f MB/s)")
    }
    spark.stop()
  }
}
