package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming MinHash near-dup stage: near-duplicates dropped ACROSS
  * micro-batches via the bucket-claim registry, state bounded by the
  * watermark horizon (old claims expire), registry compaction, and
  * end-to-end wiring through CorpusPipeline.startNearDup. */
class NearDupStageSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  private def longText(seed: String): String =
    (1 to 100).map(i => s"$seed$i").mkString(" ")

  /** ~97% shingle-identical: one token changed mid-document. */
  private def nearDupOf(text: String): String = {
    val t = text.split(" "); t(50) = "CHANGED"; t.mkString(" ")
  }

  test("near-dups drop across micro-batches; state expires at the horizon") {
    import spark.implicits._
    val reg = Files.createTempDirectory("ndr").toString + "/registry"
    val stage = NearDupStage(reg, watermarkMs = 10 * 60000L)
    val alpha = longText("alpha")

    // epoch 0: two distinct docs, plus an IN-batch near-dup of alpha
    val b0 = Seq(
      (1L, ts(0), alpha, "crawl"),
      (2L, ts(1), nearDupOf(alpha), "crawl"),   // in-batch near-dup → drop
      (3L, ts(2), longText("beta"), "crawl"))
      .toDF("doc_id", "ts", "text", "source")
    assert(stage.process(b0, 0L).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 3L))

    // epoch 1 (inside the watermark): cross-batch near-dup of alpha
    // drops; a fresh doc survives
    val b1 = Seq(
      (4L, ts(5), nearDupOf(alpha), "feed"),    // cross-batch near-dup
      (5L, ts(6), longText("gamma"), "feed"))
      .toDF("doc_id", "ts", "text", "source")
    assert(stage.process(b1, 1L).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(5L))

    // epoch 2: far in the future — alpha's claims are now BELOW the
    // horizon, so its near-dup is (deliberately) kept: bounded state
    val b2 = Seq(
      (6L, ts(90), nearDupOf(alpha), "crawl"),
      (7L, ts(91), longText("gamma"), "crawl")) // gamma claim also expired
      .toDF("doc_id", "ts", "text", "source")
    assert(stage.process(b2, 2L).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(6L, 7L))

    // epoch 3: near-dup of the RE-ADMITTED doc 6 drops again
    val b3 = Seq((8L, ts(92), nearDupOf(longText("alpha")), "crawl"))
      .toDF("doc_id", "ts", "text", "source")
    assert(stage.process(b3, 3L).count() == 0)

    // compaction drops sub-horizon claims but keeps live ones
    stage.compact(spark)
    val live = spark.read.parquet(s"$reg/epoch=-1")
    assert(live.count() > 0)
    assert(live.filter(org.apache.spark.sql.functions.col("ts") < ts(80))
      .count() == 0, "sub-horizon claims must be gone after compact")
    // post-compact: collision checking still works
    val b4 = Seq((9L, ts(93), nearDupOf(longText("gamma")), "crawl"))
      .toDF("doc_id", "ts", "text", "source")
    assert(stage.process(b4, 4L).count() == 0)
  }

  test("epoch replay is idempotent: re-running a batch can't self-collide") {
    import spark.implicits._
    val reg = Files.createTempDirectory("ndr-replay").toString + "/registry"
    val stage = NearDupStage(reg, watermarkMs = 10 * 60000L)
    val b0 = Seq((1L, ts(0), longText("delta"), "crawl"))
      .toDF("doc_id", "ts", "text", "source")
    assert(stage.process(b0, 0L).count() == 1)
    // replay of the same epoch (crash before checkpoint commit): the
    // claims it wrote must not drop its own docs
    assert(stage.process(b0, 0L).count() == 1)
  }

  test("end-to-end: quality filter → LSH dedup → chunks land in parquet") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ndr-e2e").toString
    val in = MemoryStream[(Long, Timestamp, String, String)](spark)
    val alpha = longText("alpha")
    in.addData(
      (1L, ts(0), alpha, "crawl"),              // kept: 3 chunks
      (2L, ts(1), nearDupOf(alpha), "crawl"),   // near-dup → dropped
      (3L, ts(2), "tiny", "crawl"),             // quality-filtered
      (4L, ts(3), longText("beta"), "feed"))    // kept: 3 chunks
    val q = CorpusPipeline.startNearDup(
      in.toDF().toDF("doc_id", "ts", "text", "source"),
      s"$dir/out", s"$dir/ckpt", s"$dir/registry",
      watermark = "10 minutes", trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$dir/out")
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toSeq
    assert(out.map(_._1).distinct.sorted == Seq(1L, 4L))
    assert(out.count(_._1 == 1L) == 3 && out.count(_._1 == 4L) == 3)
  }

  test("auto-compaction folds old epochs but never the replayable newest") {
    import spark.implicits._
    val reg = Files.createTempDirectory("ndr-auto").toString + "/registry"
    val stage = NearDupStage(reg, watermarkMs = 60 * 60000L, compactEvery = 2)
    def batch(id: Long, minute: Int, seed: String) =
      Seq((id, ts(minute), longText(seed), "crawl"))
        .toDF("doc_id", "ts", "text", "source")
    assert(stage.process(batch(1L, 0, "alpha"), 0L).count() == 1)
    assert(stage.process(batch(2L, 1, "beta"), 1L).count() == 1)
    assert(stage.process(batch(3L, 2, "gamma"), 2L).count() == 1) // compacts
    val dirs = new java.io.File(reg).listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).sorted.toSeq
    assert(dirs == Seq("epoch=-1", "epoch=2"),
      s"epochs 0/1 fold, newest survives: $dirs")
    // replay of the newest epoch can't self-collide (its claims were NOT
    // folded into the base)
    assert(stage.process(batch(3L, 2, "gamma"), 2L).count() == 1)
    // and claims folded into the base still drop near-dups
    assert(stage.process(
      Seq((4L, ts(3), nearDupOf(longText("alpha")), "crawl"))
        .toDF("doc_id", "ts", "text", "source"), 3L).count() == 0)
  }

  test("restart on the same checkpoint neither loses nor duplicates") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ndr-restart").toString
    val in = MemoryStream[(Long, Timestamp, String, String)](spark)
    val alpha = longText("alpha")
    in.addData((1L, ts(0), alpha, "crawl"))
    def run(): Unit = {
      val q = CorpusPipeline.startNearDup(
        in.toDF().toDF("doc_id", "ts", "text", "source"),
        s"$dir/out", s"$dir/ckpt", s"$dir/registry",
        watermark = "10 minutes", trigger = Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    run()
    // second run, same checkpoint: resumes AFTER doc 1, near-dup of it
    // (arriving in a later batch, new query instance) still drops
    in.addData(
      (2L, ts(4), nearDupOf(alpha), "feed"),
      (3L, ts(5), longText("epsilon"), "feed"))
    run()
    val out = spark.read.parquet(s"$dir/out")
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toSeq
    assert(out.map(_._1).distinct.sorted == Seq(1L, 3L))
    // no duplicated chunks for doc 1 (it was not reprocessed)
    assert(out.count(_._1 == 1L) == 3)
  }

  test("interval parsing") {
    assert(CorpusPipeline.parseMs("10 minutes") == 600000L)
    assert(CorpusPipeline.parseMs("1 hour") == 3600000L)
    assert(CorpusPipeline.parseMs("500 milliseconds") == 500L)
  }
}
