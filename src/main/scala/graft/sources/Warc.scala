package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500) reader — the container format web-crawl training
  * data actually arrives in (Common Crawl publishes everything as WARC;
  * reference sinks parquet, but a corpus engine has to be able to EAT
  * the crawl, not just its processed descendants).
  *
  * Format: a WARC file is a sequence of records — `WARC/1.x\r\n`,
  * header lines to a blank line, exactly Content-Length payload bytes,
  * then a blank-line pair. Common Crawl gzips ONE MEMBER PER RECORD so
  * byte-range readers can split; java.util.zip.GZIPInputStream consumes
  * multi-member streams natively, so the same sequential parse reads
  * .warc and .warc.gz identically.
  *
  * Spark shape: `binaryFiles` → iterator-to-iterator parse. The unit of
  * parallelism is the FILE — a crawl segment is thousands of ~1 GB
  * files, so executors saturate on file count (the task-per-file model
  * every WARC processor uses); the streaming parse holds one record in
  * memory, never the file. Malformed input follows the engine's
  * quarantine contract (JsonlCorpus, proto Decode): a parse failure
  * emits a `_corrupt` row carrying the error and position instead of
  * killing the job or silently truncating, and parsing resumes with
  * the next file.
  *
  * At 100 TB: WARC parses once on ingest and lands as parquet
  * (documents-table schema) — like JSONL, re-parsing per query would
  * make every scan CPU-bound on record framing.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("file", StringType),
    StructField("record_id", LongType),      // ordinal within the file
    StructField("record_type", StringType),  // warcinfo/request/response/…
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("payload", BinaryType),
    StructField("_corrupt", StringType)))

  /** Parse every record of every *.warc / *.warc.gz under `path`. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val raw = new BufferedInputStream(pds.open(), 1 << 16)
        // buffer ABOVE the inflater too: header parsing reads byte-at-a-
        // time, and unbuffered that is one inflater call per byte
        val in =
          if (file.endsWith(".gz"))
            new BufferedInputStream(new GZIPInputStream(raw, 1 << 16), 1 << 16)
          else raw
        parseStream(file, in)
      }
      .map(r => org.apache.spark.sql.Row(
        r.file, r.recordId, r.recordType, r.targetUri, r.warcDate,
        r.contentType, r.payload, r.corrupt))
    spark.createDataFrame(rows, schema)
  }

  /** The `response` records split into HTTP head and body — all
    * built-ins on the parsed frame: the payload of a response record is
    * an HTTP message, so body = everything past the first blank line,
    * and the served MIME type comes from its Content-Type header. The
    * UTF-8 cast is deliberately lossy (invalid bytes → U+FFFD): this is
    * the text-pipeline front door, not an archival round-trip — the
    * exact bytes stay in `payload` for anyone who needs them. */
  def responses(records: DataFrame): DataFrame =
    records
      .filter(col("_corrupt").isNull && col("record_type") === "response")
      .withColumn("http", split(col("payload").cast("string"),
        "\r\n\r\n", 2))
      .select(col("file"), col("record_id"),
        col("target_uri"), col("warc_date"),
        regexp_extract(element_at(col("http"), 1),
          "(?im)^content-type:\\s*([^;\r\n]+)", 1).as("mime"),
        regexp_extract(element_at(col("http"), 1),
          "(?i)^HTTP/[0-9.]+\\s+(\\d{3})", 1).cast("int").as("status"),
        element_at(col("http"), 2).as("body"))

  // ---------------------------------------------------------------- parse

  private[sources] final case class Rec(file: String, recordId: Long,
      recordType: String, targetUri: String, warcDate: String,
      contentType: String, payload: Array[Byte], corrupt: String)

  /** Streaming parse of one WARC stream: an iterator that reads record
    * N+1 only after record N is consumed. On a framing error, one
    * `_corrupt` row is emitted and the REST OF THE FILE is skipped —
    * Content-Length framing gives no reliable resync point. */
  private[sources] def parseStream(file: String, in: InputStream)
      : Iterator[Rec] = new Iterator[Rec] {
    private var recordId = 0L
    private var dead = false
    private var nextRec: Rec = null

    private def readLine(): String = {
      val buf = new ArrayBuffer[Byte](128)
      var b = in.read()
      if (b < 0) return null
      while (b >= 0 && b != '\n') { buf += b.toByte; b = in.read() }
      val n = if (buf.nonEmpty && buf.last == '\r') buf.length - 1
        else buf.length
      new String(buf.toArray, 0, n, "UTF-8")
    }

    private def skipFully(n: Long): Unit = {
      var left = n
      val buf = new Array[Byte](1 << 16)
      while (left > 0) {
        val k = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
        if (k < 0) throw new EOFException(
          s"payload truncated with $left of $n bytes unread")
        left -= k
      }
    }

    private def readFully(n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val k = in.read(out, off, n - off)
        if (k < 0) throw new EOFException(
          s"payload truncated at $off of $n bytes")
        off += k
      }
      out
    }

    private def advance(): Unit = {
      nextRec = null
      if (dead) return
      try {
        // skip inter-record blank lines
        var line = readLine()
        while (line != null && line.isEmpty) line = readLine()
        if (line == null) { dead = true; return } // clean EOF
        if (!line.startsWith("WARC/"))
          throw new IllegalArgumentException(
            s"expected WARC/ version line, got '${line.take(40)}'")
        val headers = Iterator.continually(readLine())
          .takeWhile(l => l != null && l.nonEmpty)
          .flatMap { l =>
            val i = l.indexOf(':')
            if (i < 0) None
            else Some(l.substring(0, i).trim.toLowerCase ->
              l.substring(i + 1).trim)
          }.toMap
        val len = headers.getOrElse("content-length",
          throw new IllegalArgumentException("missing Content-Length"))
          .toLong
        if (len > Int.MaxValue - 8) {
          // well-formed but oversized (WARC caps nothing): the record
          // is perfectly framed, so SKIP its payload and keep parsing —
          // only this record quarantines, not the file's remainder
          skipFully(len)
          nextRec = Rec(file, recordId, "", "", "", "", null,
            s"record $recordId: payload $len bytes exceeds array limit")
        } else {
          val payload = readFully(len.toInt)
          nextRec = Rec(file, recordId,
            headers.getOrElse("warc-type", ""),
            // the header value is a URI, sometimes <bracketed> (WARC 1.0)
            headers.getOrElse("warc-target-uri", "")
              .stripPrefix("<").stripSuffix(">"),
            headers.getOrElse("warc-date", ""),
            headers.getOrElse("content-type", ""),
            payload, null)
        }
        recordId += 1
      } catch {
        case e: Exception =>
          dead = true
          nextRec = Rec(file, recordId, "", "", "", "", null,
            s"record $recordId: ${e.getMessage}")
      }
    }

    override def hasNext: Boolean = {
      if (nextRec == null && !dead) advance()
      nextRec != null
    }
    override def next(): Rec = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRec
      nextRec = null
      r
    }
  }
}
