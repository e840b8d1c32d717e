package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Resumable change-data feed: TableLog.changes is the union of
  * pairwise per-commit diffs (insert-then-delete across commits shows
  * BOTH events), and the ChangeFeed cursor delivers each batch
  * at-least-once across a crash, composing to exactly-once with an
  * idempotent (write-by-version-range) apply. */
class ChangeFeedSpec extends SparkSuite {

  import spark.implicits._

  /** A 3-commit history over a tiny keyed table:
    * v0 init {1,2}; v1 inserts 9; v2 deletes 9 and updates 2. */
  private def build(root: String): Unit = {
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    def commitChanges(n: Int, rows: Seq[(Long, String, Long, Boolean)])
        : Unit = {
      rows.toDF("k", "v", "ver", "del").write.parquet(s"$root/chg$n")
      val (_, unt) = graft.operators.Upsert.mergeShared(spark,
        TableLog.snapshotFiles(spark, s"$root/t"), s"$root/chg$n",
        s"$root/stage$n", Seq("k"), versionCol = Some("ver"),
        tombstoneCol = Some("del"))
      TableLog.commit(spark, s"$root/t", s"$root/stage$n", s"c$n",
        expectedHead = Some(n - 1), carry = unt)
    }
    commitChanges(1, Seq((9L, "nine", 1L, false)))
    commitChanges(2, Seq((9L, "x", 2L, true), (2L, "b2", 2L, false)))
  }

  private def rows(df: org.apache.spark.sql.DataFrame)
      : Seq[(Long, String, String, Int)] =
    df.select(col("k"), col("v"), col("_change_type"),
        col("_commit_version").cast("int"))
      .as[(Long, String, String, Int)].collect()
      .sortBy(r => (r._4, r._1, r._3)).toSeq

  test("changes = union of pairwise diffs; cross-commit events survive") {
    val root = Files.createTempDirectory("cdf").toString
    build(root)
    val got = rows(TableLog.changes(spark, s"$root/t", 0))
    val want = rows(
      TableLog.diff(spark, s"$root/t", 0, 1)
        .withColumn("_commit_version", lit(1))
        .unionByName(TableLog.diff(spark, s"$root/t", 1, 2)
          .withColumn("_commit_version", lit(2))))
    assert(got == want, s"got=$got")
    // the per-commit feed keeps the insert@v1 + delete@v2 pair that a
    // single spanning diff(0, 2) cancels
    assert(got.count(r => r._1 == 9L) == 2, s"$got")
    assert(rows(TableLog.diff(spark, s"$root/t", 0, 2)
      .withColumn("_commit_version", lit(2)))
      .count(_._1 == 9L) == 0)
    // bounds: an untilV slice, and a caught-up empty feed
    assert(rows(TableLog.changes(spark, s"$root/t", 0, Some(1)))
      .forall(_._4 == 1))
    assert(TableLog.changes(spark, s"$root/t", 2).count() == 0L)
  }

  test("diffCommit (file-granular) ≡ snapshot diff across commit shapes") {
    // the r18 claim: diff(v-1, v) computed from the delta record's
    // add/remove lists (carried files never read) matches the
    // full-snapshot exceptAll row-for-row — across a keyed upsert, an
    // add-column evolution, STACKED deletion-vector commits, the
    // compaction that materializes them, and a post-compaction upsert
    val root = Files.createTempDirectory("cdf-granular").toString
    spark.range(6).select(col("id").as("k"),
        concat(lit("old"), col("id")).as("v"), lit(1L).as("ver"))
      .repartitionByRange(2, col("k")).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    def upsert(n: Int, df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.parquet(s"$root/chg$n")
      val (_, unt) = graft.operators.Upsert.mergeShared(spark,
        TableLog.snapshotFiles(spark, s"$root/t"), s"$root/chg$n",
        s"$root/stage$n", Seq("k"), versionCol = Some("ver"),
        tombstoneCol = Some("del"))
      TableLog.commit(spark, s"$root/t", s"$root/stage$n", s"up$n",
        expectedHead = Some(n - 1), carry = unt)
    }
    // v1: update k2, delete k4, insert k9
    upsert(1, Seq((2L, "new2", 2L, false), (4L, "x", 2L, true),
      (9L, "new9", 2L, false)).toDF("k", "v", "ver", "del"))
    // v2: add-column evolution, old files carried by reference
    Seq((10L, "ten", 3L, 42L)).toDF("k", "v", "ver", "score")
      .coalesce(1).write.parquet(s"$root/stage2")
    TableLog.commit(spark, s"$root/t", s"$root/stage2", "evolve",
      expectedHead = Some(1),
      carry = TableLog.snapshotFiles(spark, s"$root/t"))
    // v3 + v4: stacked merge-on-read deletes (the second DV's
    // positions are computed over the first DV's applied read)
    TableLog.deleteWhere(spark, s"$root/t", col("k") % 3 === 0,
      expectedHead = Some(2))
    TableLog.deleteWhere(spark, s"$root/t", col("k") === 5,
      expectedHead = Some(3))
    // v5: compaction materializes both DVs — logically a no-op
    TableLog.compactDeletes(spark, s"$root/t", expectedHead = Some(4))
    // v6: the maintenance loop resumes post-compaction
    upsert(6, Seq((1L, "new1", 9L, false, 7L))
      .toDF("k", "v", "ver", "del", "score"))
    (1 to 6).foreach { v =>
      val got = TableLog.diffCommit(spark, s"$root/t", v)
      val want = TableLog.diffSnapshots(spark, s"$root/t", v - 1, v)
      assert(got.exceptAll(want).count() == 0 &&
        want.exceptAll(got).count() == 0 &&
        got.count() == want.count(),
        s"v$v: file-granular diff diverges from the snapshot diff")
    }
    // the DV commit's deletes are exactly the sidecar's positions
    val dv3 = TableLog.diffCommit(spark, s"$root/t", 3)
      .select(col("k"), col("_change_type"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(dv3 == Seq((0L, "delete"), (3L, "delete"), (9L, "delete")),
      s"$dv3")
    assert(TableLog.diffCommit(spark, s"$root/t", 5).count() == 0L,
      "compaction must diff empty")
  }

  test("cursor: crash re-delivers; idempotent apply lands exactly once") {
    val root = Files.createTempDirectory("cdf-cursor").toString
    build(root)
    val cursor = s"$root/consumer.pos"
    ChangeFeed.seed(spark, cursor, 0)
    assert(ChangeFeed.position(spark, cursor).contains(0))
    // double-seed is a bug, not a race
    intercept[IllegalArgumentException] {
      ChangeFeed.seed(spark, cursor, 0)
    }

    // take batch 1 (one version), process (land by version range),
    // CRASH before ack — the next take re-delivers the same batch
    val b1 = ChangeFeed.next(spark, s"$root/t", cursor,
      maxVersions = 1).get
    assert(b1.fromV == 0 && b1.toV == 1)
    def apply(b: ChangeFeed.Batch): Unit = b.changes.write
      .mode("overwrite").parquet(s"$root/out/v${b.fromV + 1}-v${b.toV}")
    apply(b1) // ... crash here: no ack
    val b1again = ChangeFeed.next(spark, s"$root/t", cursor,
      maxVersions = 1).get
    assert(b1again.fromV == b1.fromV && b1again.toV == b1.toV,
      "crash/resume must re-deliver the unacked batch")
    apply(b1again) // idempotent: same range, same content, overwrite
    ChangeFeed.ack(spark, cursor, b1again)
    assert(ChangeFeed.position(spark, cursor).contains(1))

    // a second ack of the same batch is loud (shared-cursor bug)
    intercept[IllegalArgumentException] {
      ChangeFeed.ack(spark, cursor, b1again)
    }

    // drain the rest, then the consumer is caught up
    val b2 = ChangeFeed.next(spark, s"$root/t", cursor).get
    assert(b2.fromV == 1 && b2.toV == 2)
    apply(b2)
    ChangeFeed.ack(spark, cursor, b2)
    assert(ChangeFeed.next(spark, s"$root/t", cursor).isEmpty)

    // exactly-once: the landed ranges union to the full feed
    val landed = rows(spark.read.parquet(s"$root/out/v1-v1",
      s"$root/out/v2-v2"))
    assert(landed == rows(TableLog.changes(spark, s"$root/t", 0)),
      s"$landed")
  }

  test("keys pair delete+insert into update pre/post images per commit") {
    val root = Files.createTempDirectory("cdf-pairs").toString
    build(root)
    // v1: insert 9 (no delete) stays insert; v2: update 2 becomes the
    // pre/post pair, delete 9 (no matching insert) stays delete
    val got = rows(TableLog.changes(spark, s"$root/t", 0,
      keys = Seq("k")))
    assert(got == Seq(
      (9L, "nine", "insert", 1),
      (2L, "b", "update_preimage", 2),
      (2L, "b2", "update_postimage", 2),
      (9L, "nine", "delete", 2)).sortBy(r => (r._4, r._1, r._3)),
      s"$got")
    // cross-commit events never pair: k=9's insert@v1 / delete@v2
    assert(got.count(r => r._1 == 9L &&
      r._3.startsWith("update")) == 0)

    // the cursor layer passes keys through unchanged
    val cursor = s"$root/pairs.pos"
    ChangeFeed.seed(spark, cursor, 0)
    val b = ChangeFeed.next(spark, s"$root/t", cursor,
      keys = Seq("k")).get
    assert(rows(b.changes) == got, "cursor batch must pair identically")

    // duplicate keys pair POSITIONALLY by deterministic rank: a full
    // replacement commit with two deletes and one insert on k=1
    // pairs exactly one and keeps the other a delete
    val r2 = Files.createTempDirectory("cdf-pairs-dup").toString
    Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$r2/t")
    TableLog.init(spark, s"$r2/t")
    Seq((1L, "z"), (2L, "c")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$r2/stage")
    TableLog.commit(spark, s"$r2/t", s"$r2/stage", "replace",
      expectedHead = Some(0))
    val d = TableLog.diff(spark, s"$r2/t", 0, 1, keys = Seq("k"))
      .select(col("k"), col("v"), col("_change_type"))
      .as[(Long, String, String)].collect()
      .sortBy(r => (r._1, r._3, r._2)).toSeq
    assert(d == Seq(
      (1L, "b", "delete"), // rank-2 delete finds no rank-2 insert
      (1L, "z", "update_postimage"),
      (1L, "a", "update_preimage")), s"$d")
  }

  test("a consumer lagging past expire fails loudly, never skips") {
    val root = Files.createTempDirectory("cdf-expire").toString
    build(root)
    val cursor = s"$root/consumer.pos"
    ChangeFeed.seed(spark, cursor, 0)
    TableLog.expire(spark, s"$root/t", retainLast = 1, minAgeMs = 0L,
      allowBatchActionDrop = true)
    val ex = intercept[Exception] {
      ChangeFeed.next(spark, s"$root/t", cursor).get.changes.count()
    }
    assert(ex.getMessage.contains("not in retained history"),
      ex.getMessage)
  }
}
