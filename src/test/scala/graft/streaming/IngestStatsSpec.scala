package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.ingest.RangePartitioner

/** The stats listener observes real pipeline epochs. */
class IngestStatsSpec extends SparkSuite {

  test("listener records per-epoch throughput for the block pipeline") {
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stats = new IngestStats(lines.add(_))
    spark.streams.addListener(stats)
    try {
      val blocks = spark.readStream
        .format("graft.sources.BlockStreamProvider")
        .option("numBlocks", "30").option("blocksPerBatch", "10")
        .load()
      val q = BlockPipeline.start(blocks, graft.ingest.SampleBlocks.output,
        Files.createTempDirectory("stats-root").toString,
        RangePartitioner(start = 1, size = 10),
        Files.createTempDirectory("stats-ckpt").toString,
        trigger = Trigger.AvailableNow())
      q.processAllAvailable(); q.stop()
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (stats.progress.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(!stats.progress.isEmpty, "no progress events observed")
      assert(lines.stream().anyMatch(_.contains("rows/s")))
    } finally spark.streams.removeListener(stats)
  }
}
