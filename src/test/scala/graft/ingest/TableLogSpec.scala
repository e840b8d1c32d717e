package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Versioned snapshot log: commits are atomic (manifest rename is the
  * only publish point), reads are snapshot-isolated and time travel,
  * expectedHead detects concurrent writers, crash debris is invisible
  * to readers and swept by expire, and expire never touches a
  * retained snapshot's files. */
class TableLogSpec extends SparkSuite {

  import spark.implicits._

  private def vals(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
    df.select("k", "v").as[(Long, String)].collect().sortBy(_._1).toSeq

  test("init → upsert → commit → time travel; expire keeps the head") {
    val root = Files.createTempDirectory("tablelog").toString
    spark.range(10).select(col("id").as("k"),
        concat(lit("old"), col("id")).as("v"), lit(1L).as("ver"))
      .repartitionByRange(2, col("k"))
      .write.parquet(s"$root/t")
    assert(TableLog.init(spark, s"$root/t") == 0)
    assert(TableLog.head(spark, s"$root/t").contains(0))

    // the maintenance loop: upsert writes BESIDE the table, commit
    // swaps it in atomically as v1
    Seq((3L, "new3", 2L)).toDF("k", "v", "ver")
      .write.parquet(s"$root/changes")
    graft.operators.Upsert.merge(spark, s"$root/t", s"$root/changes",
      s"$root/staged", "k", versionCol = Some("ver"))
    val v1 = TableLog.commit(spark, s"$root/t", s"$root/staged",
      action = "upsert", expectedHead = Some(0))
    assert(v1 == 1)

    // head sees the merge; v0 still reads the pre-merge table
    assert(vals(TableLog.read(spark, s"$root/t"))
      .contains((3L, "new3")))
    assert(vals(TableLog.read(spark, s"$root/t", Some(0)))
      .contains((3L, "old3")))
    assert(TableLog.history(spark, s"$root/t").map(_.action) ==
      Seq("init", "upsert"))

    // a reader pinned to v1's manifest survives expiry of v0
    val pinned = TableLog.read(spark, s"$root/t", Some(1))
    val st = TableLog.expire(spark, s"$root/t", retainLast = 1)
    assert(st.manifestsDropped == 1 && st.filesDropped == 2, s"$st")
    assert(vals(pinned).size == 10)
    intercept[IllegalArgumentException] {
      TableLog.read(spark, s"$root/t", Some(0))
    }
    // idempotent: nothing left to drop
    assert(TableLog.expire(spark, s"$root/t", 1) ==
      TableLog.ExpireStats(0, 0))
  }

  test("expectedHead detects a concurrent writer; crash debris is swept") {
    val root = Files.createTempDirectory("tablelog-cc").toString
    spark.range(4).select(col("id").as("k"), lit("a").as("v"))
      .coalesce(1).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    Seq((9L, "b")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$root/s1")
    Seq((9L, "c")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$root/s2")
    TableLog.commit(spark, s"$root/t", s"$root/s1", "w1",
      expectedHead = Some(0))
    // the second writer staged against v0 — its commit must fail, and
    // fail BEFORE moving any file into the table
    val ex = intercept[IllegalArgumentException] {
      TableLog.commit(spark, s"$root/t", s"$root/s2", "w2",
        expectedHead = Some(0))
    }
    assert(ex.getMessage.contains("conflict"), ex.getMessage)
    assert(vals(TableLog.read(spark, s"$root/t")) ==
      Seq((9L, "b")), "the losing writer must not corrupt the head")

    // crash simulation: a data file moved in but the manifest rename
    // never happened (+ a stranded tmp manifest) — readers see
    // nothing, expire sweeps both
    Files.write(java.nio.file.Paths.get(s"$root/t/v9-orphan.parquet"),
      Array[Byte](1, 2, 3))
    Files.createDirectories(java.nio.file.Paths.get(s"$root/t/_graft_log"))
    Files.write(java.nio.file.Paths.get(s"$root/t/_graft_log/_tmp.crash"),
      "action=crashed\n".getBytes)
    assert(vals(TableLog.read(spark, s"$root/t")) == Seq((9L, "b")))
    val st = TableLog.expire(spark, s"$root/t", retainLast = 10)
    assert(st.filesDropped == 1, s"orphan not swept: $st")
    assert(!Files.exists(
      java.nio.file.Paths.get(s"$root/t/_graft_log/_tmp.crash")))
    assert(vals(TableLog.read(spark, s"$root/t")) == Seq((9L, "b")))
  }

  test("diff: the change feed between snapshots is the upsert's deltas") {
    val root = Files.createTempDirectory("tablelog-diff").toString
    spark.range(6).select(col("id").as("k"),
        concat(lit("old"), col("id")).as("v"), lit(1L).as("ver"))
      .coalesce(1).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    // update k=2, delete k=4, insert k=9
    Seq((2L, "new2", 2L, false), (4L, "x", 2L, true),
      (9L, "new9", 2L, false))
      .toDF("k", "v", "ver", "del").write.parquet(s"$root/changes")
    graft.operators.Upsert.merge(spark, s"$root/t", s"$root/changes",
      s"$root/staged", "k", Some("ver"), Some("del"))
    TableLog.commit(spark, s"$root/t", s"$root/staged", "upsert",
      expectedHead = Some(0))
    val d = TableLog.diff(spark, s"$root/t", 0, 1)
      .select("k", "v", "_change_type")
      .as[(Long, String, String)].collect().sortBy(r => (r._1, r._3))
      .toSeq
    assert(d == Seq(
      (2L, "old2", "delete"), (2L, "new2", "insert"), // the update pair
      (4L, "old4", "delete"),
      (9L, "new9", "insert")), s"$d")
    // a no-change diff is empty
    assert(TableLog.diff(spark, s"$root/t", 1, 1).count() == 0L)
  }

  test("a quiesced RangeSink root inits; optimize commits over it") {
    // the handoff: backfill lands range-named parquet, init snapshots
    // it as v0, then the maintenance loop (optimize -> commit) takes
    // over — the committed layout replaces the ranges atomically and
    // v0 still time-travels to the raw landing
    val root = Files.createTempDirectory("tablelog-ranges").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$root/stage1")
    Seq((3L, "c")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$root/stage2")
    Files.createDirectories(java.nio.file.Paths.get(s"$root/t"))
    def adopt(stage: String, range: String): Unit = {
      val part = new java.io.File(s"$root/$stage").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$root/t/$range"))
    }
    adopt("stage1", "0000000000-0000001000.parquet")
    adopt("stage2", "0000001000-0000002000.parquet")
    assert(TableLog.init(spark, s"$root/t") == 0)
    assert(vals(TableLog.read(spark, s"$root/t")).size == 3)

    // a maintenance pass rewrites the layout and swaps in as v1
    TableLog.read(spark, s"$root/t").repartitionByRange(1, col("k"))
      .write.parquet(s"$root/staged")
    TableLog.commit(spark, s"$root/t", s"$root/staged", "optimize",
      expectedHead = Some(0))
    assert(vals(TableLog.read(spark, s"$root/t")) ==
      vals(TableLog.read(spark, s"$root/t", Some(0))))
    // v0's manifest still names the raw ranges
    assert(TableLog.history(spark, s"$root/t").head.files.toSet ==
      Set("0000000000-0000001000.parquet", "0000001000-0000002000.parquet"))
  }
}
