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
    // full-copy staging over the SNAPSHOT's files (the raw-directory
    // merge refuses versioned dirs since r17)
    val (_, unt) = graft.operators.Upsert.mergeShared(spark,
      TableLog.snapshotFiles(spark, s"$root/t"), s"$root/changes",
      s"$root/staged", Seq("k"), versionCol = Some("ver"))
    graft.operators.Upsert.copyFiles(spark,
      unt.map(new org.apache.hadoop.fs.Path(_)), s"$root/staged",
      Set.empty)
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
    // a NEVER-referenced file is indistinguishable from an in-flight
    // commit's freshly-moved one: the default age gate keeps it
    val kept = TableLog.expire(spark, s"$root/t", retainLast = 10)
    assert(kept.filesDropped == 0, s"swept possibly-live debris: $kept")
    assert(Files.exists(
      java.nio.file.Paths.get(s"$root/t/v9-orphan.parquet")))
    // a quiesced table sweeps immediately with minAgeMs = 0
    val st = TableLog.expire(spark, s"$root/t", retainLast = 10,
      minAgeMs = 0L)
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
    val (_, unt) = graft.operators.Upsert.mergeShared(spark,
      TableLog.snapshotFiles(spark, s"$root/t"), s"$root/changes",
      s"$root/staged", Seq("k"), Some("ver"), Some("del"))
    graft.operators.Upsert.copyFiles(spark,
      unt.map(new org.apache.hadoop.fs.Path(_)), s"$root/staged",
      Set.empty)
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

  test("commit records are O(changed files), with periodic checkpoints") {
    val root = Files.createTempDirectory("tablelog-incr").toString
    // a 16-file table; each commit rewrites exactly one narrow file
    spark.range(1600).select(col("id").as("k"), lit("x").as("v"),
        lit(1L).as("ver"))
      .repartitionByRange(16, col("k"))
      .write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    def changeLines(v: Int): Int =
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(f"$root/t/_graft_log/v$v%010d.delta")),
        "UTF-8").linesIterator
        .count(l => l.startsWith("add=") || l.startsWith("remove="))
    (1 to 12).foreach { i =>
      val stage = s"$root/stage$i"
      Seq((7L, s"new$i", 1L + i)).toDF("k", "v", "ver")
        .write.parquet(s"$root/chg$i")
      val snap = TableLog.snapshotFiles(spark, s"$root/t")
      val (st, untouched) = graft.operators.Upsert.mergeShared(spark,
        snap, s"$root/chg$i", stage, Seq("k"),
        versionCol = Some("ver"))
      assert(st.filesRewritten == 1 && untouched.size == snap.size - 1,
        s"locality lost: $st / ${untouched.size} of ${snap.size}")
      TableLog.commit(spark, s"$root/t", stage, s"u$i",
        expectedHead = Some(i - 1), carry = untouched)
    }
    // the incremental claim: a 1-file change's record stays a handful
    // of change lines (1 remove + the rewrite's ≤2 adds) no matter
    // the table's file count — never one line per table file (v0's
    // init is the full 16)
    assert(changeLines(0) == 16, s"init adds: ${changeLines(0)}")
    assert(changeLines(12) <= 4,
      s"delta v12 carries ${changeLines(12)} change lines — " +
        "commit metadata is not O(changed)")
    // the checkpoint cadence landed v10 as a full-list record
    // (parquet since r17)
    assert(Files.exists(java.nio.file.Paths.get(
      s"$root/t/_graft_log/v0000000010.checkpoint.parquet")))
    assert(vals(TableLog.read(spark, s"$root/t")).count(_._2 == "new12") == 1)
    assert(vals(TableLog.read(spark, s"$root/t", Some(6)))
      .count(_._2 == "new6") == 1)
    // expire below the checkpoint: the floor checkpoint keeps every
    // retained version resolvable after the old deltas drop
    val st = TableLog.expire(spark, s"$root/t", retainLast = 3,
      minAgeMs = 0L)
    assert(st.manifestsDropped == 10, s"$st")
    assert(vals(TableLog.read(spark, s"$root/t", Some(10))).size == 1600)
    assert(vals(TableLog.read(spark, s"$root/t")).count(_._2 == "new12") == 1)
    intercept[IllegalArgumentException] {
      TableLog.read(spark, s"$root/t", Some(9))
    }
  }

  test("expire refuses to drop the most recent streaming batch record") {
    val root = Files.createTempDirectory("tablelog-batch").toString
    spark.range(4).select(col("id").as("k"), lit("a").as("v"))
      .coalesce(1).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    Seq((9L, "b")).toDF("k", "v").coalesce(1).write.parquet(s"$root/s1")
    TableLog.commit(spark, s"$root/t", s"$root/s1", "rollup-batch-7",
      carry = TableLog.snapshotFiles(spark, s"$root/t"))
    // an optimize lands AFTER the batch: retain=1 would drop the
    // batch record and a replaying pipeline could double-apply id 7
    TableLog.read(spark, s"$root/t").coalesce(1)
      .write.parquet(s"$root/s2")
    TableLog.commit(spark, s"$root/t", s"$root/s2", "optimize")
    val ex = intercept[RuntimeException] {
      TableLog.expire(spark, s"$root/t", retainLast = 1, minAgeMs = 0L)
    }
    assert(ex.getMessage.contains("batch"), ex.getMessage)
    // quiesced pipeline: the caller takes responsibility
    val st = TableLog.expire(spark, s"$root/t", retainLast = 1,
      minAgeMs = 0L, allowBatchActionDrop = true)
    assert(st.manifestsDropped == 2, s"$st")
    assert(vals(TableLog.read(spark, s"$root/t")).size == 5)
  }

  test("legacy text checkpoints still resolve (r17 parquet migration)") {
    val root = Files.createTempDirectory("tablelog-migrate").toString
    spark.range(8).select(col("id").as("k"),
        concat(lit("x"), col("id")).as("v"))
      .coalesce(2).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    val want = vals(TableLog.read(spark, s"$root/t"))
    val schemaJson = TableLog.schemaOf(spark, s"$root/t").get.json
    val names = TableLog.snapshotFiles(spark, s"$root/t")
      .map(f => new org.apache.hadoop.fs.Path(f).getName).sorted

    // swap the v0 parquet checkpoint for a pre-r17 TEXT record
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val log = s"$root/t/_graft_log"
    assert(fs.delete(new org.apache.hadoop.fs.Path(log,
      "v0000000000.checkpoint.parquet"), false))
    val text = (Seq("action=init",
      s"commit=${java.util.UUID.randomUUID()}",
      s"schema=$schemaJson") ++ names.map(n => s"file=$n"))
      .mkString("", "\n", "\n")
    val out = fs.create(new org.apache.hadoop.fs.Path(log,
      "v0000000000.checkpoint"), false)
    out.write(text.getBytes("UTF-8")); out.close()
    TableLog.dropCheckpointCache()

    // resolution, schema, and commits over the legacy record all work
    assert(vals(TableLog.read(spark, s"$root/t")) == want)
    assert(TableLog.schemaOf(spark, s"$root/t").get.json == schemaJson)
    Seq((99L, "new")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$root/staged")
    TableLog.commit(spark, s"$root/t", s"$root/staged", "append",
      expectedHead = Some(0),
      carry = names)
    assert(vals(TableLog.read(spark, s"$root/t")).size == 9)
    // expire past v0 lands the new floor checkpoint (parquet) and
    // drops the legacy text record with the version
    TableLog.expire(spark, s"$root/t", retainLast = 1, minAgeMs = 0L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(log,
      "v0000000000.checkpoint")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(log,
      "v0000000001.checkpoint.parquet")))
    TableLog.dropCheckpointCache()
    assert(vals(TableLog.read(spark, s"$root/t")).size == 9)
  }

  test("commit re-stamps moved files' mtime to move-in time") {
    // rename preserves mtime, so a slow maintenance pass's staged
    // output would look "old" the instant commit moves it in — and a
    // concurrent expire's never-referenced age gate could sweep it in
    // the window before the delta publishes. The commit re-stamps
    // each moved file at move-in, so the orphan clock starts at the
    // move, not the staging write.
    val root = Files.createTempDirectory("tablelog-mtime").toString
    spark.range(5).select(col("id").as("k"), lit("a").as("v"))
      .coalesce(1).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    Seq((9L, "b")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$root/staged")
    // simulate the slow pass: staged files written 2h ago
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = System.currentTimeMillis() - 2 * 3600 * 1000L
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/staged"))
      .filter(_.isFile)
      .foreach(s => fs.setTimes(s.getPath, old, -1))
    val before = System.currentTimeMillis()
    val carry0 = TableLog.snapshotFiles(spark, s"$root/t")
      .map(p => new org.apache.hadoop.fs.Path(p).getName)
    TableLog.commit(spark, s"$root/t", s"$root/staged", "append",
      expectedHead = Some(0), carry = carry0)
    val v1files = TableLog.snapshotFiles(spark, s"$root/t")
      .filter(_.contains("v1-"))
    assert(v1files.nonEmpty)
    v1files.foreach { f =>
      val m = fs.getFileStatus(new org.apache.hadoop.fs.Path(f))
        .getModificationTime
      assert(m >= before - 1000,
        s"$f mtime $m predates the move ($before) — expire could " +
          "sweep an in-flight commit's file")
    }
    // and expire with a 1h in-flight window leaves the snapshot whole
    TableLog.expire(spark, s"$root/t", retainLast = 2,
      minAgeMs = 3600 * 1000L)
    assert(TableLog.read(spark, s"$root/t").count() == 6L)
  }

  test("type widening evolution: narrow files upcast at read time") {
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("tablelog-widen").toString
    // v0: int measure + float score
    spark.range(4).select(col("id").as("k"),
        col("id").cast("int").as("m"),
        (col("id") * 1.5).cast("float").as("s"))
      .coalesce(1).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    // the widened feed carries m as LONG and s as DOUBLE; the old
    // narrow file carries by reference — no rewrite, scan-time upcast
    Seq((9L, 900L, 2.25d)).toDF("k", "m", "s").coalesce(1)
      .write.parquet(s"$root/stage")
    TableLog.commit(spark, s"$root/t", s"$root/stage", "widen",
      expectedHead = Some(0),
      carry = TableLog.snapshotFiles(spark, s"$root/t"))
    val head = TableLog.read(spark, s"$root/t")
    assert(head.schema("m").dataType == LongType &&
      head.schema("s").dataType == DoubleType, s"${head.schema}")
    val got = head.select("k", "m", "s").as[(Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, 0L, 0.0), (1L, 1L, 1.5), (2L, 2L, 3.0),
      (3L, 3L, 4.5), (9L, 900L, 2.25)), s"$got")
    // time travel to the pre-widening snapshot keeps the narrow shape
    val v0 = TableLog.read(spark, s"$root/t", Some(0))
    assert(v0.schema("m").dataType == IntegerType &&
      v0.schema("s").dataType == FloatType)
    // diff across the widening: the narrow side upcasts, so the
    // insert is the only change — and file-granular ≡ snapshot diff
    val d = TableLog.diff(spark, s"$root/t", 0, 1)
      .select("k", "_change_type").as[(Long, String)].collect().toSeq
    assert(d == Seq((9L, "insert")), s"$d")
    assert(TableLog.diffSnapshots(spark, s"$root/t", 0, 1)
      .exceptAll(TableLog.diffCommit(spark, s"$root/t", 1))
      .count() == 0L)
    // a NARROWING (or unrelated) change is still loud
    Seq((5L, "x", 1.0d)).toDF("k", "m", "s").coalesce(1)
      .write.parquet(s"$root/stage2")
    val ex = intercept[IllegalArgumentException] {
      TableLog.commit(spark, s"$root/t", s"$root/stage2", "bad",
        carry = TableLog.snapshotFiles(spark, s"$root/t"))
    }
    assert(ex.getMessage.contains("schema conflict"), ex.getMessage)
    // the widen matrix itself: chain, float, int→double, decimal
    assert(TableLog.widen(ByteType, IntegerType).contains(IntegerType))
    assert(TableLog.widen(IntegerType, DoubleType).contains(DoubleType))
    assert(TableLog.widen(LongType, DoubleType).isEmpty) // lossy
    assert(TableLog.widen(DecimalType(10, 2), DecimalType(14, 2))
      .contains(DecimalType(14, 2)))
    assert(TableLog.widen(DecimalType(10, 2), DecimalType(10, 3)).isEmpty)
  }

  test("timestamp time travel: as-of resolves monotonically under skew") {
    val root = Files.createTempDirectory("tablelog-asof").toString
    val saved = TableLog.clock
    try {
      TableLog.clock = () => 1000L
      spark.range(3).select(col("id").as("k"), lit("a").as("v"))
        .coalesce(1).write.parquet(s"$root/t")
      TableLog.init(spark, s"$root/t") // v0 @1000
      def append(n: Int, k: Long): Unit = {
        Seq((k, s"b$n")).toDF("k", "v").coalesce(1)
          .write.parquet(s"$root/s$n")
        TableLog.commit(spark, s"$root/t", s"$root/s$n", s"a$n",
          carry = TableLog.snapshotFiles(spark, s"$root/t"))
      }
      TableLog.clock = () => 5000L; append(1, 10L) // v1 @5000
      TableLog.clock = () => 3000L; append(2, 11L) // v2 skewed BACK
      TableLog.clock = () => 9000L; append(3, 12L) // v3 @9000
    } finally TableLog.clock = saved
    val t = s"$root/t"
    assert(TableLog.asOfVersion(spark, t, 1000L) == 0)
    assert(TableLog.asOfVersion(spark, t, 4999L) == 0)
    // v2's skewed stamp monotonicizes UP to v1's 5000: as-of returns
    // the newest version a live reader at that instant would have
    // seen, never a non-causal slice
    assert(TableLog.asOfVersion(spark, t, 5000L) == 2)
    assert(TableLog.asOfVersion(spark, t, 8999L) == 2)
    assert(TableLog.asOfVersion(spark, t, 9000L) == 3)
    assert(TableLog.readAsOf(spark, t, 6000L).count() == 5L) // at v2
    // predating the retained history is loud, never rounded up
    intercept[IllegalArgumentException] {
      TableLog.asOfVersion(spark, t, 999L)
    }
    // a pre-r18 record (no ts header) inherits its predecessor's
    // effective stamp — strip v1's and re-resolve
    val fsH = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dp = new org.apache.hadoop.fs.Path(s"$t/_graft_log/" +
      "v0000000001.delta")
    val stripped = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dp.toUri.getPath)), "UTF-8")
      .linesIterator.filterNot(_.startsWith("ts="))
      .mkString("", "\n", "\n")
    fsH.delete(dp, false) // rewrite THROUGH hadoop: keeps the crc true
    val out = fsH.create(dp, false)
    out.write(stripped.getBytes("UTF-8")); out.close()
    assert(TableLog.asOfVersion(spark, t, 1000L) == 1)
    assert(TableLog.asOfVersion(spark, t, 2999L) == 1)
    assert(TableLog.asOfVersion(spark, t, 3000L) == 2)
    // history surfaces the raw (un-monotonicized) stamps
    assert(TableLog.history(spark, t).map(_.tsMs) ==
      Seq(Some(1000L), None, Some(3000L), Some(9000L)))
  }

  test("cpCache validates the live file: rm -rf + re-init never stale") {
    val root = Files.createTempDirectory("tablelog-cache").toString
    spark.range(3).select(col("id").as("k"), lit("one").as("v"))
      .coalesce(1).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    // resolve once: the v0 checkpoint enters the process-wide cache
    assert(vals(TableLog.read(spark, s"$root/t")).forall(_._2 == "one"))
    // out-of-band: drop the WHOLE table and re-init different content
    // at the same path (long-lived driver, dev loop) — the
    // "immutable once published" premise does not cover deletion, so
    // the cached entry must invalidate on the changed file status
    // instead of serving the dead table's checkpoint
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$root/t"), true))
    spark.range(4).select(col("id").as("k"), lit("two").as("v"))
      .coalesce(1).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    val got = vals(TableLog.read(spark, s"$root/t"))
    assert(got.size == 4 && got.forall(_._2 == "two"),
      s"stale checkpoint served after out-of-band re-init: $got")
  }

  test("schema evolution: add-column commits, null-fill, time travel") {
    val root = Files.createTempDirectory("tablelog-schema").toString
    spark.range(3).select(col("id").as("k"), lit("a").as("v"))
      .coalesce(1).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    // the evolved feed carries a new column; the untouched old file
    // CARRIES by reference and must null-fill on read
    val carried = TableLog.snapshotFiles(spark, s"$root/t")
    Seq((9L, "b", 42L)).toDF("k", "v", "score").coalesce(1)
      .write.parquet(s"$root/stage")
    TableLog.commit(spark, s"$root/t", s"$root/stage", "evolve",
      expectedHead = Some(0), carry = carried)
    val head = TableLog.read(spark, s"$root/t")
    assert(head.columns.toSeq == Seq("k", "v", "score"))
    val byK = head.select("k", "score")
      .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(byK == Seq((0L, None), (1L, None), (2L, None),
      (9L, Some(42L))), s"$byK")
    // time travel to the pre-evolution snapshot returns the OLD shape
    assert(TableLog.read(spark, s"$root/t", Some(0)).columns.toSeq ==
      Seq("k", "v"))
    assert(TableLog.schemaOf(spark, s"$root/t", Some(0))
      .get.fieldNames.toSeq == Seq("k", "v"))
    // diff across the evolution: old side null-fills under the newer
    // schema, so the insert is the only change
    val d = TableLog.diff(spark, s"$root/t", 0, 1)
      .select("k", "_change_type").as[(Long, String)].collect().toSeq
    assert(d == Seq((9L, "insert")), s"$d")
    // a same-name column with a DIFFERENT type is a migration, not a
    // merge — loud
    Seq((5L, "c", "not-a-long")).toDF("k", "v", "score").coalesce(1)
      .write.parquet(s"$root/stage2")
    val ex = intercept[IllegalArgumentException] {
      TableLog.commit(spark, s"$root/t", s"$root/stage2", "bad",
        carry = TableLog.snapshotFiles(spark, s"$root/t"))
    }
    assert(ex.getMessage.contains("schema conflict"), ex.getMessage)
  }
}
