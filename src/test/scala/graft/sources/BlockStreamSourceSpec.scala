package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.ingest.RangePartitioner
import graft.streaming.BlockPipeline

/** DSv2 block source spec: offsets, finality lag, reorg isolation, and
  * end-to-end wiring into the range-sink pipeline. */
class BlockStreamSourceSpec extends SparkSuite {

  private val fmt = "graft.sources.BlockStreamProvider"

  test("emits the full chain exactly once, in order") {
    import spark.implicits._
    val out = Files.createTempDirectory("bss-out").toString
    val q = spark.readStream.format(fmt)
      .option("numBlocks", "57").option("blocksPerBatch", "10")
      .load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("bss-ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val nums = spark.read.parquet(out).select("block_number")
      .as[Long].collect().sorted.toSeq
    assert(nums == (1L to 57L))
  }

  test("confirmations hold back the unfinalized head; reorged ids never surface") {
    import spark.implicits._
    val out = Files.createTempDirectory("bss-out2").toString
    // reorg at head 30, depth 3: blocks 28..30 re-mined (generation 1).
    // With K=5 ≥ depth, the exposed stream must contain ONLY the final ids.
    val q = spark.readStream.format(fmt)
      .option("numBlocks", "60").option("blocksPerBatch", "7")
      .option("confirmations", "5").option("reorgs", "30:3")
      .load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("bss-ckpt2").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val rows = spark.read.parquet(out)
      .select("block_number", "block_id").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(rows.map(_._1) == (1L to 60L), "gapless, duplicate-free")
    // re-mined blocks carry their post-reorg identity; everything else gen-0
    val ids = rows.toMap
    assert(ids(28L) == "0xb28_r1" && ids(29L) == "0xb29_r1" &&
      ids(30L) == "0xb30_r1")
    assert(ids(27L) == "0xb27" && ids(31L) == "0xb31")
  }

  test("end-to-end: DSv2 source → decode → range-named tables") {
    val root = Files.createTempDirectory("bss-pipe").toString
    val blocks = spark.readStream.format(fmt)
      .option("numBlocks", "40").option("blocksPerBatch", "10")
      .load()
    val q = BlockPipeline.start(blocks, graft.ingest.SampleBlocks.output,
      root, RangePartitioner(start = 1, size = 10),
      Files.createTempDirectory("bss-pipe-ckpt").toString,
      explode = true, trigger = Trigger.AvailableNow())
    q.processAllAvailable(); q.stop()
    val mainFiles = new java.io.File(s"$root/main").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted.toSeq
    // ranges [1,11) [11,21) [21,31) finalized; [31,41) is the open head
    assert(mainFiles == Seq(
      "0000000001-0000000011.parquet",
      "0000000011-0000000021.parquet",
      "0000000021-0000000031.parquet"))
    val main = spark.read.parquet(s"$root/main/0000000011-0000000021.parquet")
    assert(main.count() == 10)
    assert(main.columns.take(2).toSeq == Seq("block_number", "block_id"))
  }
}
