package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Range-named sink fixtures (FIXTURES.md §B scenarios 1, 2, 4; SURVEY.md
  * §5.2.4): exact file names, dense empty backfill, single sorted file per
  * range, idempotent re-publish. */
class RangeSinkSpec extends SparkSuite {

  private def tmpDir(): String =
    Files.createTempDirectory("rangesink").toString

  private def blocksDF(nums: Seq[Long]): DataFrame = {
    import spark.implicits._
    nums.map(n => (n, s"0x$n", n * 10)).toDF("block_number", "block_id", "v")
  }

  private def published(root: String): Seq[String] =
    new java.io.File(root).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq.sorted

  test("scenario 1: blocks 100..130, size 10 → exact range file names") {
    val root = tmpDir()
    val sink = RangeSink(root, RangePartitioner(start = 100, size = 10))
    sink.writeAll(blocksDF(100L until 130L))
    assert(published(root) == Seq(
      "0000000100-0000000110.parquet",
      "0000000110-0000000120.parquet",
      "0000000120-0000000130.parquet"))
    // every range file holds exactly its blocks, sorted
    val df = spark.read.parquet(s"$root/0000000110-0000000120.parquet")
    assert(df.select("block_number").collect().map(_.getLong(0)).toSeq ==
      (110L until 120L))
    // one physical file per range (single-file contract)
    assert(new java.io.File(s"$root/0000000110-0000000120.parquet").isFile)
  }

  test("scenario 2: first block mid-stream → dense empty backfill") {
    val root = tmpDir()
    val sink = RangeSink(root, RangePartitioner(start = 100, size = 10))
    sink.writeAll(blocksDF(Seq(125L, 126L)))
    assert(published(root) == Seq(
      "0000000100-0000000110.parquet",
      "0000000110-0000000120.parquet",
      "0000000120-0000000130.parquet"))
    // backfilled ranges are EMPTY but carry the schema
    val empty = spark.read.parquet(s"$root/0000000100-0000000110.parquet")
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("block_number", "block_id", "v"))
    val data = spark.read.parquet(s"$root/0000000120-0000000130.parquet")
    assert(data.count() == 2)
  }

  test("gap between epochs → interior ranges backfilled") {
    val root = tmpDir()
    val sink = RangeSink(root, RangePartitioner(start = 0, size = 10))
    sink.processBatch(blocksDF(Seq(5L)), epochId = 0)
    sink.processBatch(blocksDF(Seq(35L)), epochId = 1)
    // range [30,40) is still open (high-water); [0..30) finalized
    assert(published(root) == Seq(
      "0000000000-0000000010.parquet",
      "0000000010-0000000020.parquet",
      "0000000020-0000000030.parquet"))
    assert(spark.read.parquet(s"$root/0000000000-0000000010.parquet").count() == 1)
    assert(spark.read.parquet(s"$root/0000000010-0000000020.parquet").count() == 0)
  }

  test("epoch replay is idempotent (exactly-once upgrade, SURVEY §2.A#17)") {
    val root = tmpDir()
    val sink = RangeSink(root, RangePartitioner(start = 0, size = 10))
    sink.processBatch(blocksDF(0L until 15L), epochId = 0)
    val firstListing = published(root)
    // crash-replay of the same epoch, then progress
    sink.processBatch(blocksDF(0L until 15L), epochId = 0)
    sink.processBatch(blocksDF(15L until 25L), epochId = 1)
    assert(published(root) == Seq(
      "0000000000-0000000010.parquet",
      "0000000010-0000000020.parquet"))
    assert(firstListing == Seq("0000000000-0000000010.parquet"))
    // no duplicated rows despite the replayed epoch
    val df = spark.read.parquet(s"$root/0000000010-0000000020.parquet")
    assert(df.select("block_number").collect().map(_.getLong(0)).toSeq ==
      (10L until 20L))
  }

  test("fully-published epoch dirs are reaped from staging") {
    val root = tmpDir()
    val sink = RangeSink(root, RangePartitioner(start = 0, size = 10))
    for (e <- 0 until 5)
      sink.processBatch(blocksDF(Seq(e * 10L, e * 10L + 5L)), epochId = e)
    // every range below the high-water published → its epoch dirs gone;
    // only epochs still holding the open head range may remain
    val open = new java.io.File(s"$root/_open")
    val leftover =
      if (!open.exists()) Seq.empty
      else open.listFiles().filter(_.isDirectory).map(_.getName).toSeq
    assert(leftover.size <= 1,
      s"published epochs must not accumulate in _open: $leftover")
  }

  test("published files never rewritten (completed-range guard)") {
    val root = tmpDir()
    val sink = RangeSink(root, RangePartitioner(start = 0, size = 10))
    sink.writeAll(blocksDF(0L until 10L))
    val before = new java.io.File(s"$root/0000000000-0000000010.parquet")
      .lastModified()
    Thread.sleep(20)
    sink.writeAll(blocksDF(0L until 10L)) // full re-run
    val after = new java.io.File(s"$root/0000000000-0000000010.parquet")
      .lastModified()
    assert(before == after)
  }

  test("widened (uint64 → Decimal) block numbers are accepted") {
    import org.apache.spark.sql.functions._
    val root = tmpDir()
    val sink = RangeSink(root, RangePartitioner(start = 0, size = 10))
    val dec = blocksDF(0L until 15L)
      .withColumn("block_number", col("block_number").cast("decimal(20,0)"))
    sink.processBatch(dec, epochId = 0)
    assert(published(root) == Seq("0000000000-0000000010.parquet"))
  }

  test("schema evolution across epochs: merged read null-backfills history") {
    // The reference derives its schema ONCE at startup
    // (converter_proto.go:24-45) and has no story for a module whose
    // proto gains a field mid-stream. Ours: restart the pipeline with
    // the evolved descriptor; published ranges are immutable history,
    // and a mergeSchema read over the table unions the columns —
    // pre-evolution ranges null-backfill added fields, post-removal
    // ranges null-backfill dropped ones.
    import spark.implicits._
    val root = tmpDir()
    val sink = RangeSink(root, RangePartitioner(start = 0, size = 10))
    sink.processBatch(blocksDF(0L until 10L), epochId = 0)
    // proto adds `tag`
    val gained = (10L until 20L).map(n => (n, s"0x$n", n * 10, s"tag$n"))
      .toDF("block_number", "block_id", "v", "tag")
    sink.processBatch(gained, epochId = 1)
    // proto later drops `v`
    val dropped = (20L until 30L).map(n => (n, s"0x$n", s"tag$n"))
      .toDF("block_number", "block_id", "tag")
    sink.processBatch(dropped, epochId = 2)
    // a block past the boundary closes range 20-30 (rotation semantics —
    // the open range publishes only when the stream crosses it)
    sink.processBatch(Seq((30L, "0x30", "tag30"))
      .toDF("block_number", "block_id", "tag"), epochId = 3)
    assert(published(root) == Seq("0000000000-0000000010.parquet",
      "0000000010-0000000020.parquet", "0000000020-0000000030.parquet"))
    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.toSet ==
      Set("block_number", "block_id", "v", "tag"))
    assert(merged.count() == 30)
    assert(merged.filter(col("tag").isNull).count() == 10)  // pre-evolution
    assert(merged.filter(col("v").isNull).count() == 10)    // post-removal
    assert(merged.filter(col("block_number") < 10 && col("v").isNotNull)
      .count() == 10)
  }

  test("schema evolution MID-RANGE: the merge path unions epoch schemas") {
    // a range straddling the evolution boundary takes finalizeBelow's
    // merge path (two staged epoch dirs → one job); reading with the
    // NEWEST schema there would silently drop the older epoch's column
    // values — the merged publish must null-backfill instead
    import spark.implicits._
    val root = tmpDir()
    val sink = RangeSink(root, RangePartitioner(start = 0, size = 10))
    sink.processBatch((0L until 5L).map(n => (n, s"0x$n", n * 10))
      .toDF("block_number", "block_id", "v"), epochId = 0)
    // proto drops `v` mid-range; next epoch also closes the range
    sink.processBatch((5L until 11L).map(n => (n, s"0x$n", s"tag$n"))
      .toDF("block_number", "block_id", "tag"), epochId = 1)
    assert(published(root).head == "0000000000-0000000010.parquet")
    val file = spark.read.parquet(s"$root/0000000000-0000000010.parquet")
    assert(file.columns.toSet == Set("block_number", "block_id", "v", "tag"))
    assert(file.count() == 10)
    // the older epoch's v values survived the merge
    assert(file.filter(col("v").isNotNull).count() == 5)
    assert(file.filter(col("tag").isNotNull).count() == 5)
  }

  test("stop-block clamps the final range name (scenario 6)") {
    val root = tmpDir()
    val sink = RangeSink(root,
      RangePartitioner(start = 100, size = 10, stop = Some(125)))
    sink.writeAll(blocksDF(100L until 125L))
    assert(published(root).last == "0000000120-0000000125.parquet")
  }
}
