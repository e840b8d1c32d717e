package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.Web

/** WARC parsing against hand-framed fixtures: plain and per-record-gzip
  * streams parse identically, payloads round-trip bit-for-bit, framing
  * errors quarantine instead of killing the job, and the HTTP/HTML/URL
  * helpers carry a response record all the way to the documents-table
  * shape. */
class WarcSpec extends SparkSuite {

  private val html =
    """<html><head><style>body{color:red}</style>
      |<script>alert("no")</script></head>
      |<body><h1>Title &amp; More</h1><p>Real   text&nbsp;here.</p>
      |<!-- comment --></body></html>""".stripMargin

  private def http(body: String, mime: String = "text/html"): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: $mime; charset=utf-8\r\n\r\n" +
      body).getBytes("UTF-8")

  private def record(typ: String, uri: String,
      payload: Array[Byte]): Array[Byte] = {
    val hdr = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: $typ\r\n")
    if (uri.nonEmpty) hdr.append(s"WARC-Target-URI: <$uri>\r\n")
    hdr.append("WARC-Date: 2026-08-14T00:00:00Z\r\n")
      .append("Content-Type: application/http;msgtype=response\r\n")
      .append(s"Content-Length: ${payload.length}\r\n\r\n")
    hdr.toString.getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def records: Seq[Array[Byte]] = Seq(
    record("warcinfo", "", "software: graft-test\r\n".getBytes("UTF-8")),
    record("response", "http://EXAMPLE.com:80/a?utm_source=x&q=1#frag",
      http(html)),
    record("response", "https://other.org/b", http("plain body", "text/plain")))

  private def writeFixture(dir: String, gzip: Boolean): String = {
    val name = if (gzip) "f.warc.gz" else "f.warc"
    val out = new FileOutputStream(s"$dir/$name")
    if (gzip) records.foreach { r => // one gzip MEMBER per record (CC framing)
      val g = new GZIPOutputStream(out); g.write(r); g.finish()
    } else records.foreach(out.write)
    out.close()
    s"$dir/$name"
  }

  test("plain and multi-member-gzip streams parse identically") {
    val dir = Files.createTempDirectory("warc").toString
    writeFixture(dir, gzip = false)
    writeFixture(dir, gzip = true)
    val plain = Warc.read(spark, s"$dir/f.warc")
      .orderBy("record_id").collect()
    val gz = Warc.read(spark, s"$dir/f.warc.gz")
      .orderBy("record_id").collect()
    assert(plain.length == 3 && gz.length == 3)
    assert(plain.forall(_.getAs[String]("_corrupt") == null))
    plain.zip(gz).foreach { case (a, b) =>
      assert(a.getAs[String]("record_type") == b.getAs[String]("record_type"))
      assert(a.getAs[Array[Byte]]("payload")
        .sameElements(b.getAs[Array[Byte]]("payload")))
    }
    // payload round-trips bit-for-bit
    assert(plain(1).getAs[Array[Byte]]("payload").sameElements(http(html)))
    assert(plain(1).getAs[String]("target_uri") ==
      "http://EXAMPLE.com:80/a?utm_source=x&q=1#frag") // <brackets> stripped
    assert(plain(0).getAs[String]("record_type") == "warcinfo")
  }

  test("framing errors quarantine; records before the break survive") {
    val dir = Files.createTempDirectory("warc").toString
    val out = new FileOutputStream(s"$dir/bad.warc")
    out.write(records.head)
    // claims 100 payload bytes, delivers 10 — truncation mid-record
    out.write(("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 100\r\n\r\n0123456789").getBytes("UTF-8"))
    out.close()
    val rows = Warc.read(spark, s"$dir/bad.warc")
      .orderBy("record_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("_corrupt") == null)
    val corrupt = rows(1).getAs[String]("_corrupt")
    assert(corrupt != null && corrupt.contains("truncated"), corrupt)

    val notWarc = new FileOutputStream(s"$dir/junk.warc")
    notWarc.write("this is not a warc file\r\n".getBytes("UTF-8"))
    notWarc.close()
    val junk = Warc.read(spark, s"$dir/junk.warc").collect()
    assert(junk.length == 1 &&
      junk.head.getAs[String]("_corrupt").contains("expected WARC/"))
  }

  test("responses() splits HTTP head from body; helpers land the doc shape") {
    val dir = Files.createTempDirectory("warc").toString
    writeFixture(dir, gzip = false)
    val resp = Warc.responses(Warc.read(spark, s"$dir/f.warc"))
      .orderBy("record_id")
    val rows = resp.collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("mime") == "text/html")
    assert(rows(0).getAs[Int]("status") == 200)
    assert(rows(1).getAs[String]("body") == "plain body")

    // WARC response -> canonical URL + visible text: the doc-table shape
    val doc = resp.filter(col("mime") === "text/html")
      .select(Web.urlNormalize(col("target_uri")).as("url"),
        Web.htmlText(col("body")).as("text"))
      .collect().head
    assert(doc.getAs[String]("url") == "http://example.com/a?q=1")
    assert(doc.getAs[String]("text") == "Title & More Real text here.")
  }

  test("CLI warc subcommand lands docs + dead letters end-to-end") {
    val dir = Files.createTempDirectory("warc").toString
    writeFixture(dir, gzip = true)
    val junk = new FileOutputStream(s"$dir/junk.warc")
    junk.write("not a warc\r\n".getBytes("UTF-8")); junk.close()
    val out = Files.createTempDirectory("warcout").toString
    graft.CliMain.main(Array("warc", s"$dir/*.warc*", out))
    val docs = spark.read.parquet(s"$out/docs").collect()
    assert(docs.length == 1) // only the 200 text/html response
    assert(docs.head.getAs[String]("url") == "http://example.com/a?q=1")
    assert(docs.head.getAs[String]("text").startsWith("Title & More"))
    assert(spark.read.parquet(s"$out/_dead_letters").count() == 1)
  }

  test("htmlText decodes the escape character LAST (no double-decode)") {
    import spark.implicits._
    // visible text of 'a &amp;lt; b' is 'a &lt; b' — decoding &amp;
    // first would double-decode it to 'a < b'
    val out = Seq("<p>a &amp;lt; b</p>").toDF("t")
      .select(Web.htmlText(col("t"))).as[String].collect().head
    assert(out == "a &lt; b", out)
  }

  test("urlNormalize: ports, fragments, tracking params, case") {
    import spark.implicits._
    val cases = Seq(
      "https://A.B.com:443/Path?gclid=9&x=1" -> "https://a.b.com/Path?x=1",
      "http://h.io/p?utm_campaign=a&utm_medium=b" -> "http://h.io/p",
      "https://h.io/p#sec" -> "https://h.io/p",
      "https://h.io:8080/p" -> "https://h.io:8080/p", // non-default port kept
      // default ports are scheme-specific: these are NOT default and stay
      "http://h.io:443/p" -> "http://h.io:443/p",
      "https://h.io:80/p" -> "https://h.io:80/p",
      "relative/path" -> "relative/path")
    val out = cases.map(_._1).toDF("u")
      .select(Web.urlNormalize(col("u"))).as[String].collect()
    out.zip(cases.map(_._2)).foreach { case (got, want) =>
      assert(got == want, s"got $got want $want")
    }
  }
}
