package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.ingest.TableLog

/** Exactly-once streaming SCD1 maintenance of a dimension table:
  * batch-id-recorded commits make engine replays no-ops, a crash
  * between merge and commit leaves the table untouched and the replay
  * lands once, and the end-to-end stream equals the batch merge of
  * the union change set. */
class UpsertPipelineSpec extends SparkSuite {

  import spark.implicits._

  private def state(dir: String): Seq[(Long, String, Long)] =
    TableLog.read(spark, dir).select("k", "v", "ver")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq

  test("streamed commits keep a Bloom sidecar fresh (refreshAll hook)") {
    val root = Files.createTempDirectory("upsert-pipe-idx").toString
    // 4-file table clustered by k, indexed on the unrelated tag column
    spark.range(1000).select(col("id").as("k"),
        concat(lit("old"), col("id")).as("v"),
        (lit(9999) - col("id")).cast("string").as("tag"),
        lit(0L).as("ver"))
      .repartitionByRange(4, col("k")).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    graft.ingest.FileSkipIndex.buildFiles(spark, s"$root/t", "tag",
      TableLog.snapshotFiles(spark, s"$root/t"),
      mBits = 1L << 16, k = 4)

    // a streamed batch moves k=100's tag; the post-commit hook must
    // re-index so the lookup stays PRUNED (not just lossless): the
    // moved value resolves to its new file only, and an absent key
    // reads zero files
    val b0 = Seq((100L, "new", "moved-tag", 1L))
      .toDF("k", "v", "tag", "ver")
    assert(UpsertPipeline.applyBatch(spark, b0, s"$root/t", Seq("k"),
      Some("ver"), None, batchId = 0))
    val got = graft.ingest.FileSkipIndex.lookupSnapshot(spark,
      s"$root/t", "tag", Seq("moved-tag", "9899"))
      .select("k", "tag").as[(Long, String)].collect().toSeq
    assert(got == Seq((100L, "moved-tag")), s"$got")
    val absent = graft.ingest.FileSkipIndex.lookupSnapshot(spark,
      s"$root/t", "tag", Seq("no-such-tag"))
    assert(absent.count() == 0 && absent.inputFiles.isEmpty,
      s"sidecar trails the streamed commit: read ${absent.inputFiles.toSeq}")
  }

  test("replay no-op; crash between merge and commit recovers once") {
    val root = Files.createTempDirectory("upsert-pipe").toString
    spark.range(6).select(col("id").as("k"),
        concat(lit("old"), col("id")).as("v"), lit(0L).as("ver"))
      .coalesce(2).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")

    val b0 = Seq((2L, "b0", 1L), (9L, "ins", 1L)).toDF("k", "v", "ver")
    assert(UpsertPipeline.applyBatch(spark, b0, s"$root/t", Seq("k"),
      Some("ver"), None, batchId = 0))
    val after0 = state(s"$root/t")
    assert(after0.contains((2L, "b0", 1L)) &&
      after0.contains((9L, "ins", 1L)) && after0.size == 7, s"$after0")

    // ENGINE REPLAY of the same batch id: recorded, so a no-op — no
    // new version, no wasted maintenance pass
    assert(!UpsertPipeline.applyBatch(spark, b0, s"$root/t", Seq("k"),
      Some("ver"), None, batchId = 0))
    assert(TableLog.head(spark, s"$root/t").contains(1),
      "replay must not publish a spurious version")

    // CRASH between merge and commit: head untouched, the replay of
    // the SAME id lands exactly once
    val b1 = Seq((3L, "b1", 2L)).toDF("k", "v", "ver")
    intercept[RuntimeException] {
      UpsertPipeline.applyBatch(spark, b1, s"$root/t", Seq("k"),
        Some("ver"), None, batchId = 1, crashBeforeCommit = true)
    }
    assert(TableLog.head(spark, s"$root/t").contains(1),
      "crashed batch must not advance the head")
    assert(UpsertPipeline.applyBatch(spark, b1, s"$root/t", Seq("k"),
      Some("ver"), None, batchId = 1))
    assert(state(s"$root/t").contains((3L, "b1", 2L)))
    assert(TableLog.actions(spark, s"$root/t").map(_._2) ==
      Seq("init", "upsert-batch-0", "upsert-batch-1"))

    // the crashed batch's staging shell ages out via expire
    val st = TableLog.expire(spark, s"$root/t", retainLast = 1,
      minAgeMs = 0L, allowBatchActionDrop = true)
    assert(st.filesDropped >= 1, s"$st")
    assert(state(s"$root/t").contains((3L, "b1", 2L)))
    val stagingLeft = new java.io.File(s"$root/t").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("_staging"))
    assert(stagingLeft.isEmpty, stagingLeft.mkString(","))
  }

  test("tombstones delete through the stream; quiet files carry") {
    val root = Files.createTempDirectory("upsert-pipe-del").toString
    // two files: keys [0,5) and [5,10) — the batch touches the first
    val full = spark.range(10).select(col("id").as("k"),
      concat(lit("old"), col("id")).as("v"), lit(0L).as("ver"))
    full.filter(col("k") < 5).coalesce(1).write.parquet(s"$root/t")
    full.filter(col("k") >= 5).coalesce(1).write.mode("append")
      .parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")

    val b0 = Seq((1L, "x", 1L, true), (2L, "new2", 1L, false))
      .toDF("k", "v", "ver", "del")
    assert(UpsertPipeline.applyBatch(spark, b0, s"$root/t", Seq("k"),
      Some("ver"), Some("del"), batchId = 0))
    val got = state(s"$root/t")
    assert(!got.exists(_._1 == 1L), s"tombstone survived: $got")
    assert(got.contains((2L, "new2", 1L)) && got.size == 9, s"$got")
    // the untouched [5,10) file is shared by reference across v0/v1
    val h = TableLog.history(spark, s"$root/t")
    assert(h(0).files.toSet.intersect(h(1).files.toSet).size == 1,
      s"quiet file not carried: v0=${h(0).files} v1=${h(1).files}")
  }

  test("an evolved (superset) batch widens the table through the stream") {
    // schema evolution composes with the streaming tier: a restart
    // with an add-column feed widens via mergeShared, TableLog records
    // the union schema, old files null-fill, v0 keeps the old shape
    val root = Files.createTempDirectory("upsert-pipe-evolve").toString
    spark.range(4).select(col("id").as("k"),
        concat(lit("old"), col("id")).as("v"), lit(0L).as("ver"))
      .coalesce(1).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    val b0 = Seq((2L, "b0", 1L, 42L)).toDF("k", "v", "ver", "score")
    assert(UpsertPipeline.applyBatch(spark, b0, s"$root/t", Seq("k"),
      Some("ver"), None, batchId = 0))
    val head = TableLog.read(spark, s"$root/t")
    val scores = head.select("k", "score")
      .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(scores == Seq((0L, None), (1L, None), (2L, Some(42L)),
      (3L, None)), s"$scores")
    assert(!TableLog.read(spark, s"$root/t", Some(0))
      .columns.contains("score"))
  }

  test("end-to-end stream ≡ batch merge of the union change set") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("upsert-pipe-e2e").toString
    val t0 = spark.range(4).select(col("id").as("k"),
      concat(lit("old"), col("id")).as("v"), lit(0L).as("ver"))
    t0.coalesce(1).write.parquet(s"$root/t")
    t0.coalesce(1).write.parquet(s"$root/t0-copy")
    TableLog.init(spark, s"$root/t")

    val stream = MemoryStream[(Long, String, Long)]
    val changes = stream.toDF().toDF("k", "v", "ver")
    val query = UpsertPipeline.start(changes, s"$root/t",
      s"$root/ckpt", Seq("k"), versionCol = Some("ver"),
      trigger = Trigger.ProcessingTime(0))
    val batches = Seq(
      Seq((1L, "u1", 1L), (8L, "i8", 1L)),
      Seq((1L, "u1b", 2L), (2L, "u2", 2L)))
    batches.foreach { b =>
      stream.addData(b: _*)
      query.processAllAvailable()
    }
    query.stop()

    // ≡ one batch merge of the union change set (monotone versions
    // make the winner order-stable)
    val unionDir = s"$root/union-changes"
    batches.flatten.toDF("k", "v", "ver").write.parquet(unionDir)
    graft.operators.Upsert.merge(spark,
      s"${root}/t0-copy", unionDir, s"$root/want", Seq("k"),
      versionCol = Some("ver"))
    val want = spark.read.parquet(s"$root/want")
      .select("k", "v", "ver")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(state(s"$root/t") == want, s"stream=${state(s"$root/t")}")
    val actions = TableLog.actions(spark, s"$root/t").map(_._2)
    assert(actions.head == "init" &&
      actions.tail.forall(_.startsWith("upsert-batch-")),
      actions.mkString(","))
  }
}
