package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.ingest.RangePartitioner
import graft.streaming.BlockPipeline

/** A stand-in for a live Substreams gRPC client: fixed 25-block chain,
  * distinctive ids, head advancing 6 per poll, blocks ≥ 20 re-mined
  * (post-reorg identity at fetch time). Instantiated by FQCN on driver
  * and executors — exactly how a real client would be plugged in. */
class StubClientFactory extends BlockClientFactory {
  override def create(o: Map[String, String]): BlockClient = new BlockClient {
    private var head = 0L
    override def headBlock(): Long = { head = math.min(head + 6, 25); head }
    override def prepareDrain(): Unit = head = 25
    override def blocks(from: Long, until: Long): Iterator[BlockData] =
      (from until math.min(until, 26)).iterator.map { n =>
        val id = if (n >= 20) s"stub-$n-r1" else s"stub-$n"
        BlockData(n, id, Array[Byte](n.toByte))
      }
  }
}

/** DSv2 block source spec: offsets, finality lag, reorg isolation, the
  * pluggable client seam, and end-to-end wiring into the range-sink
  * pipeline. */
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

  test("a stubbed client is a drop-in: custom ids, payloads, reorg identities") {
    import spark.implicits._
    val out = Files.createTempDirectory("bss-stub").toString
    val q = spark.readStream.format(fmt)
      .option("client", classOf[StubClientFactory].getName)
      .option("confirmations", "3")
      .load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("bss-stub-ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val rows = spark.read.parquet(out)
      .select("block_number", "block_id").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    // head 25, K=3 → exposure stops at 22; ids are the stub's, with the
    // fetch-time (post-reorg) identity for re-mined blocks
    assert(rows.map(_._1) == (1L to 22L))
    val ids = rows.toMap
    assert(ids(19L) == "stub-19" && ids(20L) == "stub-20-r1" &&
      ids(22L) == "stub-22-r1")
    val payload = spark.read.parquet(out).where($"block_number" === 7L)
      .select("payload").as[Array[Byte]].head()
    assert(payload.toSeq == Seq(7.toByte))
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
