package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.ingest.TableLog
import graft.operators.{IncrementalAgg, Skew}

/** Exactly-once streaming rollup maintenance: batch-id-recorded
  * commits make engine replays no-ops, a crash between increment and
  * commit leaves the table untouched and the replay lands once, and
  * the end-to-end stream equals the from-scratch rollup. */
class RollupPipelineSpec extends SparkSuite {

  import spark.implicits._

  private val aggs = Seq[(String, Skew.ReAgg)](
    "n" -> Skew.CountRows(),
    "total" -> Skew.SumOf(col("amount")))

  private def state(dir: String): Seq[(Long, Long, Long)] =
    TableLog.read(spark, dir).select("k", "n", "total")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

  private def want(raw: org.apache.spark.sql.DataFrame)
      : Seq[(Long, Long, Long)] =
    IncrementalAgg.rollup(raw, Seq("k"), aggs)
      .select("k", "n", "total")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("replay and crash recovery cannot double-count") {
    val root = Files.createTempDirectory("rollup-pipe").toString
    val h0 = Seq((1L, 10L), (2L, 5L)).toDF("k", "amount")
    IncrementalAgg.rollup(h0, Seq("k"), aggs).coalesce(1)
      .write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")

    val b0 = Seq((1L, 7L), (3L, 2L)).toDF("k", "amount")
    assert(RollupPipeline.applyBatch(spark, b0, s"$root/t",
      Seq("k"), aggs, batchId = 0))
    assert(state(s"$root/t") == want(h0.unionByName(b0)))

    // ENGINE REPLAY: the same batch id re-delivered (recovery re-runs
    // the last uncommitted batch) — recorded in history, so a no-op
    assert(!RollupPipeline.applyBatch(spark, b0, s"$root/t",
      Seq("k"), aggs, batchId = 0))
    assert(state(s"$root/t") == want(h0.unionByName(b0)),
      "replay double-counted")

    // CRASH between increment and commit: head untouched, replay of
    // the SAME id lands exactly once
    val b1 = Seq((1L, 100L)).toDF("k", "amount")
    intercept[RuntimeException] {
      RollupPipeline.applyBatch(spark, b1, s"$root/t", Seq("k"), aggs,
        batchId = 1, crashBeforeCommit = true)
    }
    assert(TableLog.head(spark, s"$root/t").contains(1),
      "crashed batch must not advance the head")
    assert(RollupPipeline.applyBatch(spark, b1, s"$root/t",
      Seq("k"), aggs, batchId = 1))
    val all = h0.unionByName(b0).unionByName(b1)
    assert(state(s"$root/t") == want(all))
    assert(TableLog.history(spark, s"$root/t").map(_.action) ==
      Seq("init", "rollup-batch-0", "rollup-batch-1"))

    // the crashed batch's staging shell is debris — expire sweeps it
    // (plus v0/v1's now-unreferenced files) and the head still reads;
    // minAgeMs = 0 because the staging dir is minutes old and the
    // default in-flight window would (correctly) keep it
    val st = TableLog.expire(spark, s"$root/t", retainLast = 1,
      minAgeMs = 0L)
    assert(st.filesDropped >= 1, s"$st")
    assert(state(s"$root/t") == want(all))
    val stagingLeft = new java.io.File(s"$root/t").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("_staging"))
    assert(stagingLeft.isEmpty, stagingLeft.mkString(","))
  }

  test("zero-copy: quiet files are shared by reference across snapshots") {
    val root = Files.createTempDirectory("rollup-share").toString
    // two-file bootstrap: key 1 and key 2 live in separate files
    IncrementalAgg.rollup(Seq((1L, 10L)).toDF("k", "amount"),
        Seq("k"), aggs).coalesce(1).write.parquet(s"$root/t")
    IncrementalAgg.rollup(Seq((2L, 20L)).toDF("k", "amount"),
        Seq("k"), aggs).coalesce(1).write.mode("append")
      .parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")

    // the batch touches key 1 only — key 2's file must CARRY by
    // reference, not copy: same manifest name in v0 and v1
    val b0 = Seq((1L, 5L)).toDF("k", "amount")
    assert(RollupPipeline.applyBatch(spark, b0, s"$root/t",
      Seq("k"), aggs, batchId = 0))
    val h = TableLog.history(spark, s"$root/t")
    val shared = h(0).files.toSet.intersect(h(1).files.toSet)
    assert(shared.size == 1,
      s"quiet file not shared: v0=${h(0).files} v1=${h(1).files}")
    val all = Seq((1L, 10L), (2L, 20L), (1L, 5L)).toDF("k", "amount")
    assert(state(s"$root/t") == want(all))

    // expiring v0 keeps the shared file (v1 still references it) and
    // drops only v0's rewritten-away file
    val st = TableLog.expire(spark, s"$root/t", retainLast = 1)
    assert(st.filesDropped == 1, s"$st")
    assert(state(s"$root/t") == want(all), "shared file lost to expire")
  }

  test("end-to-end stream ≡ from-scratch rollup; ids in history") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("rollup-e2e").toString
    val h0 = Seq((5L, 1L)).toDF("k", "amount")
    IncrementalAgg.rollup(h0, Seq("k"), aggs).coalesce(1)
      .write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")

    val stream = MemoryStream[(Long, Long)]
    val events = stream.toDF().toDF("k", "amount")
    val query = RollupPipeline.start(events, s"$root/t",
      s"$root/ckpt", Seq("k"), aggs,
      trigger = Trigger.ProcessingTime(0))
    val batches = Seq(
      Seq((5L, 2L), (6L, 3L)),
      Seq((6L, 4L), (7L, 1L)))
    batches.foreach { b =>
      stream.addData(b: _*)
      query.processAllAvailable()
    }
    query.stop()

    val raw = h0.unionByName(
      batches.flatten.toDF("k", "amount"))
    assert(state(s"$root/t") == want(raw))
    val actions = TableLog.history(spark, s"$root/t").map(_.action)
    assert(actions.head == "init" &&
      actions.tail.forall(_.startsWith("rollup-batch-")),
      actions.mkString(","))
  }
}
