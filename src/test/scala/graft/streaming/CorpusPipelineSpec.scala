package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming corpus ingestion: quality filter → watermarked exact dedup →
  * chunking → parquet, end-to-end off a MemoryStream. */
class CorpusPipelineSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def longText(seed: String): String =
    (1 to 100).map(i => s"$seed$i").mkString(" ") // 100 tokens -> 3 chunks

  test("filters, dedups within watermark, chunks, and lands in parquet") {
    import spark.implicits._
    val root = Files.createTempDirectory("corpus-out").toString
    val ckpt = Files.createTempDirectory("corpus-ckpt").toString
    val in = MemoryStream[(Long, Timestamp, String, String)](spark)
    // MemoryStream: data BEFORE start
    in.addData(
      (1L, ts(0), longText("alpha"), "crawl"),   // kept: 3 chunks
      (2L, ts(1), longText("alpha"), "crawl"),   // exact dup of 1 -> dropped
      (3L, ts(2), "tiny", "crawl"),              // quality: too short
      (4L, ts(3), "dup dup dup dup dup dup dup dup", "crawl"), // repetitive
      (5L, ts(4), longText("beta"), "feed")      // kept: 3 chunks
    )
    val q = CorpusPipeline.start(
      in.toDF().toDF("doc_id", "ts", "text", "source"),
      root, ckpt, watermark = "10 minutes",
      trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)
    val out = spark.read.parquet(root)
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Long, String)].collect().toSeq.sortBy(r => (r._1, r._2))
    // 100 tokens / stride 48: starts 1, 49, 97 -> 3 chunks per kept doc
    assert(out.map(_._1).distinct == Seq(1L, 5L))
    assert(out.count(_._1 == 1L) == 3 && out.count(_._1 == 5L) == 3)
    // chunk 1 is the full 64-token window; chunk 3 the 4-token tail
    val c1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3.split(" ").length)
    assert(c1 == Seq(64, 52, 4))
    // doc 2 (the in-watermark duplicate) is gone
    assert(!out.exists(_._1 == 2L))
  }

  test("bag dedup collapses token-permuted duplicates exact dedup keeps") {
    import spark.implicits._
    val root = Files.createTempDirectory("corpus-bag").toString
    val ckpt = Files.createTempDirectory("corpus-bag-ckpt").toString
    val text = longText("gamma")
    val permuted = text.split(" ").reverse.mkString(" ")
    val in = MemoryStream[(Long, Timestamp, String, String)](spark)
    in.addData(
      (1L, ts(0), text, "crawl"),
      (2L, ts(1), permuted, "crawl"),           // same bag, different order
      (3L, ts(2), longText("delta"), "crawl"))  // different bag
    val q = CorpusPipeline.start(
      in.toDF().toDF("doc_id", "ts", "text", "source"),
      root, ckpt, watermark = "10 minutes",
      trigger = Trigger.AvailableNow(), bagDedup = true)
    q.awaitTermination(120000)
    val kept = spark.read.parquet(root).select("doc_id").distinct()
      .as[Long].collect().sorted.toSeq
    // the permuted copy deduped away; the distinct bag survives
    assert(kept == Seq(1L, 3L))
  }
}
