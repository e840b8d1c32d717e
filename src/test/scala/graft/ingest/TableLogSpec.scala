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
}
