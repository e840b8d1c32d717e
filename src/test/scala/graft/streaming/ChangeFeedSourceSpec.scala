package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ingest.TableLog

/** Streaming change-feed source: offsets ARE table versions, each
  * commit becomes exactly one delivered batch slice, the engine's
  * checkpoint resumes mid-feed after a restart, and a stream lagging
  * past expire fails loudly. */
class ChangeFeedSourceSpec extends SparkSuite {

  import spark.implicits._

  private def commitChanges(root: String, n: Int,
      rows: Seq[(Long, String, Long, Boolean)]): Unit = {
    rows.toDF("k", "v", "ver", "del").write.parquet(s"$root/chg$n")
    val (_, unt) = graft.operators.Upsert.mergeShared(spark,
      TableLog.snapshotFiles(spark, s"$root/t"), s"$root/chg$n",
      s"$root/stage$n", Seq("k"), versionCol = Some("ver"),
      tombstoneCol = Some("del"))
    TableLog.commit(spark, s"$root/t", s"$root/stage$n", s"c$n",
      carry = unt)
  }

  private def feedRows(dfDir: String): Seq[(Long, String, String, Int)] =
    spark.read.parquet(dfDir)
      .select(col("k"), col("v"), col("_change_type"),
        col("_commit_version"))
      .as[(Long, String, String, Int)].collect()
      .sortBy(r => (r._4, r._1, r._3)).toSeq

  test("readStream delivers per-commit changes; checkpoint resumes") {
    val root = Files.createTempDirectory("cdf-stream").toString
    Seq((1L, "a", 1L, false), (2L, "b", 1L, false))
      .toDF("k", "v", "ver", "del").drop("del")
      .coalesce(1).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")

    def startQuery() = spark.readStream
      .format("graft-changes")
      .option("path", s"$root/t")
      .option("startingVersion", "0")
      .load()
      .writeStream
      .format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .start()

    // two commits while the stream runs
    val q1 = startQuery()
    commitChanges(root, 1, Seq((9L, "nine", 2L, false)))
    q1.processAllAvailable()
    commitChanges(root, 2, Seq((9L, "x", 3L, true),
      (2L, "b2", 3L, false)))
    q1.processAllAvailable()
    q1.stop()

    val got1 = feedRows(s"$root/out")
    // v1: insert 9; v2: delete 9, update 2 (delete+insert pair)
    assert(got1 == Seq(
      (9L, "nine", "insert", 1),
      (2L, "b", "delete", 2), (2L, "b2", "insert", 2),
      (9L, "nine", "delete", 2)).sortBy(r => (r._4, r._1, r._3)),
      s"$got1")

    // restart from the engine checkpoint: a commit landed while the
    // stream was DOWN is delivered exactly once, nothing replays
    commitChanges(root, 3, Seq((5L, "five", 4L, false)))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val got2 = feedRows(s"$root/out")
    assert(got2.size == got1.size + 1 &&
      got2.contains((5L, "five", "insert", 3)), s"$got2")

    // schema: the head snapshot's columns + the stamps
    val sch = ChangeFeedSource.feedSchema(spark, s"$root/t")
    assert(sch.fieldNames.toSeq ==
      Seq("k", "v", "ver", "_change_type", "_commit_version"), s"$sch")
  }

  test("restart while lagging (no startingVersion) delivers pending commits") {
    val root = Files.createTempDirectory("cdf-stream-lag").toString
    Seq((1L, "a", 1L)).toDF("k", "v", "ver").coalesce(1)
      .write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    def startQuery() = spark.readStream
      .format("graft-changes")
      .option("path", s"$root/t") // NO startingVersion: head at start
      .load()
      .writeStream.format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    val q1 = startQuery()
    commitChanges(root, 1, Seq((2L, "b", 2L, false)))
    q1.processAllAvailable()
    q1.stop()
    // two commits land while the stream is DOWN: on restart the
    // re-derived startingVersion is the NEW head, past the committed
    // offset — the checkpointed offset must govern delivery (the r17
    // getOffset gate stranded this lag until a FUTURE commit moved
    // the head, indefinitely on a quiescent table)
    commitChanges(root, 2, Seq((3L, "c", 3L, false)))
    commitChanges(root, 3, Seq((4L, "d", 4L, false)))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val got = feedRows(s"$root/out")
    assert(got == Seq((2L, "b", "insert", 1), (3L, "c", "insert", 2),
      (4L, "d", "insert", 3)).sortBy(r => (r._4, r._1, r._3)), s"$got")
  }

  test("pairKeys streams update pre/post images") {
    val root = Files.createTempDirectory("cdf-stream-pairs").toString
    Seq((1L, "a", 1L)).toDF("k", "v", "ver").coalesce(1)
      .write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    val q = spark.readStream
      .format("graft-changes")
      .option("path", s"$root/t")
      .option("startingVersion", "0")
      .option("pairKeys", "k")
      .load()
      .writeStream.format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    commitChanges(root, 1, Seq((1L, "a2", 2L, false))) // update k=1
    q.processAllAvailable()
    q.stop()
    val got = feedRows(s"$root/out")
    assert(got == Seq(
      (1L, "a", "update_preimage", 1),
      (1L, "a2", "update_postimage", 1))
      .sortBy(r => (r._4, r._1, r._3)), s"$got")
  }

  test("a stream lagging past expire fails loudly, never skips") {
    val root = Files.createTempDirectory("cdf-stream-exp").toString
    Seq((1L, "a", 1L)).toDF("k", "v", "ver").coalesce(1)
      .write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    commitChanges(root, 1, Seq((2L, "b", 2L, false)))
    commitChanges(root, 2, Seq((3L, "c", 3L, false)))
    TableLog.expire(spark, s"$root/t", retainLast = 1, minAgeMs = 0L)
    val q = spark.readStream
      .format("graft-changes")
      .option("path", s"$root/t")
      .option("startingVersion", "0")
      .load()
      .writeStream.format("noop")
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    val ex = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    assert(ex.getMessage.contains("not in retained history") ||
      Option(ex.getCause).exists(_.getMessage
        .contains("not in retained history")), ex.getMessage)
  }
}
