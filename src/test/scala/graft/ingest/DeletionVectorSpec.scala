package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Merge-on-read deletes: deleteWhere publishes a (file, row_index)
  * sidecar instead of rewriting files — DV-read ≡ the copy-on-write
  * result, snapshot files untouched, time travel sees pre-delete
  * rows; compactDeletes materializes and unblocks the maintenance
  * loop; expire sweeps superseded sidecars. */
class DeletionVectorSpec extends SparkSuite {

  import spark.implicits._

  private def vals(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
    df.select("k", "v").as[(Long, String)].collect().sortBy(_._1).toSeq

  test("a 1-row delete rewrites zero data files; read ≡ copy-on-write") {
    val root = Files.createTempDirectory("dv").toString
    spark.range(20).select(col("id").as("k"),
        concat(lit("r"), col("id")).as("v"), lit(1L).as("ver"))
      .repartitionByRange(4, col("k")).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    val v0files = TableLog.snapshotFiles(spark, s"$root/t").sorted

    val st = TableLog.deleteWhere(spark, s"$root/t", col("k") === 7L,
      expectedHead = Some(0))
    assert(st.version == 1 && st.rowsDeleted == 1L &&
      st.filesRewritten == 0, s"$st")
    // ZERO data files rewritten: v1's file list is v0's, bit for bit
    assert(TableLog.snapshotFiles(spark, s"$root/t", Some(1),
      allowDvs = true).sorted == v0files)
    assert(TableLog.snapshotDvs(spark, s"$root/t").size == 1)

    // DV-read ≡ the copy-on-write result (the same delete applied the
    // expensive way: tombstone merge over a raw copy of the table)
    spark.read.parquet(v0files: _*).write.parquet(s"$root/t2")
    Seq((7L, "x", 2L, true)).toDF("k", "v", "ver", "del")
      .write.parquet(s"$root/chg")
    graft.operators.Upsert.merge(spark, s"$root/t2", s"$root/chg",
      s"$root/cow", Seq("k"), versionCol = Some("ver"),
      tombstoneCol = Some("del"))
    assert(vals(TableLog.read(spark, s"$root/t")) ==
      vals(spark.read.parquet(s"$root/cow")))
    // time travel to v0 still sees the row
    assert(vals(TableLog.read(spark, s"$root/t", Some(0)))
      .contains((7L, "r7")))
    // the change feed shows exactly the delete
    val d = TableLog.diff(spark, s"$root/t", 0, 1)
      .select("k", "_change_type").as[(Long, String)].collect().toSeq
    assert(d == Seq((7L, "delete")), s"$d")

    // idempotent: the same predicate has nothing left to delete and
    // publishes no new version
    val st2 = TableLog.deleteWhere(spark, s"$root/t", col("k") === 7L)
    assert(st2.rowsDeleted == 0L &&
      TableLog.head(spark, s"$root/t").contains(1), s"$st2")

    // a second delete stacks a second DV; both apply
    val st3 = TableLog.deleteWhere(spark, s"$root/t", col("k") < 2L,
      expectedHead = Some(1))
    assert(st3.version == 2 && st3.rowsDeleted == 2L, s"$st3")
    assert(vals(TableLog.read(spark, s"$root/t")).map(_._1) ==
      (2L until 20L).filterNot(_ == 7L))
  }

  test("maintenance is gated until compactDeletes materializes") {
    val root = Files.createTempDirectory("dv-compact").toString
    spark.range(20).select(col("id").as("k"),
        concat(lit("r"), col("id")).as("v"), lit(1L).as("ver"))
      .repartitionByRange(4, col("k")).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    TableLog.deleteWhere(spark, s"$root/t", col("k") === 7L)
    val want = vals(TableLog.read(spark, s"$root/t"))

    // raw file lists are refused while DVs are active — a merge over
    // them would resurrect k=7
    val ex = intercept[IllegalArgumentException] {
      TableLog.snapshotFiles(spark, s"$root/t")
    }
    assert(ex.getMessage.contains("deletion vector"), ex.getMessage)

    // compact: only the file holding k=7 rewrites, the rest carry
    val cs = TableLog.compactDeletes(spark, s"$root/t",
      expectedHead = Some(1)).get
    assert(cs.filesRewritten == 1, s"$cs")
    assert(TableLog.snapshotDvs(spark, s"$root/t").isEmpty)
    assert(vals(TableLog.read(spark, s"$root/t")) == want)
    // three of four files carried by reference across the compact
    val h = TableLog.history(spark, s"$root/t")
    assert(h.head.files.toSet.intersect(h.last.files.toSet).size == 3)
    // maintenance unblocked
    assert(TableLog.snapshotFiles(spark, s"$root/t").size == 4)
    // compact again: no-op
    assert(TableLog.compactDeletes(spark, s"$root/t").isEmpty)

    // expire past the DV versions sweeps the superseded sidecar
    TableLog.expire(spark, s"$root/t", retainLast = 1, minAgeMs = 0L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dvLeft = fs.listStatus(new org.apache.hadoop.fs.Path(
      s"$root/t/_graft_dv")).count(_.isFile)
    assert(dvLeft == 0, s"$dvLeft DV sidecars survived expire")
    assert(vals(TableLog.read(spark, s"$root/t")) == want)
  }

  test("skip-index lookups apply active DVs; refresh stays legal") {
    val root = Files.createTempDirectory("dv-skipidx").toString
    (0 until 4).foreach { f =>
      spark.range(f * 250, (f + 1) * 250)
        .select(col("id").as("k"), (lit(9999) - col("id")).as("v"))
        .coalesce(1).write.mode("append").parquet(s"$root/t")
    }
    TableLog.init(spark, s"$root/t")
    FileSkipIndex.buildFiles(spark, s"$root/t", "v",
      TableLog.snapshotFiles(spark, s"$root/t"),
      mBits = 1L << 16, k = 4)
    // delete k=300 (v=9699) merge-on-read; the sidecar still claims
    // its file (stale candidate — only costs a read), but the lookup
    // must NOT return the deleted row
    TableLog.deleteWhere(spark, s"$root/t", col("k") === 300L)
    val got = FileSkipIndex.lookupSnapshot(spark, s"$root/t", "v",
      Seq("9699", "9700")).select("k", "v")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((299L, 9700L)), s"$got")
    // refresh over the DV-bearing snapshot is legal (raw indexing
    // only adds candidates) and keeps the lookup DV-aware
    FileSkipIndex.refresh(spark, s"$root/t", "v")
    assert(FileSkipIndex.lookupSnapshot(spark, s"$root/t", "v",
      Seq("9699")).count() == 0L)
  }

  test("CLI: table delete --where / compact-deletes drive the kernels") {
    val root = Files.createTempDirectory("dv-cli").toString
    spark.range(10).select(col("id").as("k"),
        concat(lit("r"), col("id")).as("v")).coalesce(2)
      .write.parquet(s"$root/t")
    graft.CliMain.main(Array("table", s"$root/t", "init"))
    graft.CliMain.main(Array("table", s"$root/t", "delete",
      "--where", "k % 3 = 0", "--expect", "0"))
    assert(vals(TableLog.read(spark, s"$root/t")).map(_._1) ==
      (0L until 10L).filterNot(_ % 3 == 0))
    assert(TableLog.snapshotDvs(spark, s"$root/t").size == 1)
    graft.CliMain.main(Array("table", s"$root/t", "compact-deletes",
      "--expect", "1"))
    assert(TableLog.snapshotDvs(spark, s"$root/t").isEmpty)
    assert(vals(TableLog.read(spark, s"$root/t")).map(_._1) ==
      (0L until 10L).filterNot(_ % 3 == 0))
  }

  test("a rewriting commit without materialization is refused") {
    val root = Files.createTempDirectory("dv-guard").toString
    spark.range(10).select(col("id").as("k"),
        concat(lit("r"), col("id")).as("v")).coalesce(2)
      .write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    val files = TableLog.snapshotFiles(spark, s"$root/t")
    TableLog.deleteWhere(spark, s"$root/t", col("k") === 3L)
    // a commit REWRITING files (removes nonempty) must not land over
    // active DVs — its output was computed from raw reads
    Seq((3L, "stale")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$root/staged")
    val ex = intercept[Exception] {
      TableLog.commit(spark, s"$root/t", s"$root/staged", "upsert",
        expectedHead = Some(1))
    }
    assert(ex.getMessage.contains("deletion vector"), ex.getMessage)
    // a pure APPEND (full carry) is fine: it read nothing raw
    val names = files.map(p => new org.apache.hadoop.fs.Path(p).getName)
    Seq((99L, "new")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$root/staged2")
    TableLog.commit(spark, s"$root/t", s"$root/staged2", "append",
      expectedHead = Some(1), carry = names)
    val got = vals(TableLog.read(spark, s"$root/t"))
    assert(got.contains((99L, "new")) && !got.exists(_._1 == 3L), s"$got")
  }
}
