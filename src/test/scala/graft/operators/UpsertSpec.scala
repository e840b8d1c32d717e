package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Keyed MERGE/upsert: copy-on-write at file granularity — merged
  * content ≡ the plain reference merge, untouched files copied not
  * rewritten, replay idempotent, version resolution deterministic
  * with duplicate winners rejected. */
class UpsertSpec extends SparkSuite {

  import spark.implicits._

  private def readSorted(dir: String): Seq[(Long, String, Long)] =
    spark.read.parquet(dir).select("k", "v", "ver")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq

  test("merge ≡ reference; only key-overlapping files rewritten") {
    val root = Files.createTempDirectory("upsert").toString
    // 100 keys range-clustered into 4 files: [0-24][25-49][50-74][75-99]
    spark.range(100).select(col("id").as("k"),
        concat(lit("old"), col("id")).as("v"), lit(1L).as("ver"))
      .repartitionByRange(4, col("k"))
      .write.parquet(s"$root/table")
    // updates 5,7 + delete 9 hit ONE file; insert 200 hits none
    Seq((5L, "new5", 2L, false), (7L, "new7", 2L, false),
      (9L, "gone", 2L, true), (200L, "new200", 2L, false))
      .toDF("k", "v", "ver", "del")
      .write.parquet(s"$root/changes")
    val st = Upsert.merge(spark, s"$root/table", s"$root/changes",
      s"$root/out", Seq("k"), versionCol = Some("ver"),
      tombstoneCol = Some("del"))
    assert(st.filesRewritten == 1 && st.filesCopied == 3,
      s"pruning failed: $st")
    assert(st.upserts == 2 && st.inserts == 1 && st.deletes == 1, s"$st")
    val want = ((0L until 100L).filterNot(Set(5L, 7L, 9L))
      .map(k => (k, s"old$k", 1L)) ++
      Seq((5L, "new5", 2L), (7L, "new7", 2L), (200L, "new200", 2L)))
      .sortBy(_._1)
    assert(readSorted(s"$root/out") == want)
  }

  test("replay idempotence: same changes onto the merged result") {
    val root = Files.createTempDirectory("upsert-replay").toString
    spark.range(40).select(col("id").as("k"),
        concat(lit("old"), col("id")).as("v"), lit(1L).as("ver"))
      .repartitionByRange(2, col("k"))
      .write.parquet(s"$root/table")
    Seq((3L, "x", 2L, false), (50L, "y", 2L, false), (4L, "z", 2L, true))
      .toDF("k", "v", "ver", "del").write.parquet(s"$root/changes")
    Upsert.merge(spark, s"$root/table", s"$root/changes",
      s"$root/out1", Seq("k"), Some("ver"), Some("del"))
    val st2 = Upsert.merge(spark, s"$root/out1", s"$root/changes",
      s"$root/out2", Seq("k"), Some("ver"), Some("del"))
    assert(readSorted(s"$root/out1") == readSorted(s"$root/out2"),
      "replay changed the table")
    // second application finds both survivors already present
    assert(st2.upserts == 2 && st2.inserts == 0, s"$st2")
  }

  test("version resolution: latest wins, duplicate winners rejected") {
    val c = Seq((1L, "a", 1L), (1L, "b", 3L), (1L, "c", 2L),
      (2L, "d", 1L)).toDF("k", "v", "ver")
    val r = Upsert.resolve(c, Seq("k"), Some("ver"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1L, "b", 3L), (2L, "d", 1L)))
    val dup = Seq((1L, "a", 1L), (1L, "b", 1L)).toDF("k", "v", "ver")
    intercept[IllegalArgumentException] {
      Upsert.resolve(dup, Seq("k"), Some("ver")).collect()
    }
    intercept[IllegalArgumentException] {
      Upsert.resolve(dup.drop("ver"), Seq("k"), None).collect()
    }
  }

  test("partitioned (nested) table layouts are rejected loudly") {
    val root = Files.createTempDirectory("upsert-nested").toString
    spark.range(10).select(col("id").as("k"), lit("v").as("v"),
        (col("id") % 2).as("p"))
      .write.partitionBy("p").parquet(s"$root/table")
    Seq((1L, "x", 0L)).toDF("k", "v", "p")
      .write.parquet(s"$root/changes")
    val ex = intercept[IllegalArgumentException] {
      Upsert.merge(spark, s"$root/table", s"$root/changes",
        s"$root/out", Seq("k"))
    }
    assert(ex.getMessage.contains("flat parquet directory"), ex.getMessage)
  }

  test("SCD2 feed: closed intervals maintain the current-state table") {
    // the lakehouse loop: the scd2 kernel's versions are the change
    // feed; upsert --version valid_from lands the CURRENT row per user
    // (last writer wins == the open version)
    val root = Files.createTempDirectory("upsert-scd2").toString
    def ts(h: Int) = new java.sql.Timestamp(3600000L * h)
    val day1 = Seq((ts(1), 1L, 101L, "view"), (ts(2), 2L, 102L, "view"))
      .toDF("ts", "user_id", "event_id", "event_type")
    val day2 = day1.unionByName(Seq(
      (ts(5), 1L, 105L, "purchase"), (ts(6), 3L, 106L, "signup"))
      .toDF("ts", "user_id", "event_id", "event_type"))
    // current-state table after day 1 (one row per user)
    def current(events: org.apache.spark.sql.DataFrame) =
      graft.queries.Streaming.scd2(events)
        .filter(col("is_current"))
        .select("user_id", "event_type", "event_id", "valid_from")
    current(day1).repartitionByRange(2, col("user_id"))
      .write.parquet(s"$root/table")
    // day-2 versions (closed + open) as the change feed: resolve by
    // valid_from picks each user's latest — the open version
    graft.queries.Streaming.scd2(day2)
      .select("user_id", "event_type", "event_id", "valid_from")
      .write.parquet(s"$root/changes")
    val st = Upsert.merge(spark, s"$root/table", s"$root/changes",
      s"$root/out", Seq("user_id"), versionCol = Some("valid_from"))
    assert(st.upserts == 2 && st.inserts == 1, s"$st")
    val got = spark.read.parquet(s"$root/out")
      .select("user_id", "event_type", "event_id")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // user 1's current row advanced to the purchase; user 3 inserted
    assert(got == Seq((1L, "purchase", 105L), (2L, "view", 102L),
      (3L, "signup", 106L)), s"got=$got")
  }

  private def ts2(h: Int) = new java.sql.Timestamp(3600000L * h)

  private type Scd2Row = (Long, String, Long, Long, Option[Long], Boolean)
  private def scd2Sorted(df: org.apache.spark.sql.DataFrame): Seq[Scd2Row] =
    df.select("user_id", "event_type", "event_id", "valid_from",
        "valid_to", "is_current")
      .as[Scd2Row].collect()
      .sortBy(r => (r._1, r._2, r._4, r._3)).toSeq

  test("mergeScd2 ≡ from-scratch rebuild over the union history") {
    val root = Files.createTempDirectory("scd2merge").toString
    // H1: three keys, multi-version; H2: later events — a 2-version
    // chain for (1,view) incl. an equal-ts seq tie-break, one event
    // for (3,view), and a NEW key (4,signup) with its own chain
    val h1 = Seq((ts2(1), 1L, 101L, "view"), (ts2(2), 1L, 102L, "view"),
      (ts2(1), 2L, 103L, "cart"), (ts2(3), 3L, 104L, "view"))
      .toDF("ts", "user_id", "event_id", "event_type")
    val h2 = Seq((ts2(5), 1L, 105L, "view"), (ts2(5), 1L, 106L, "view"),
      (ts2(6), 3L, 107L, "view"), (ts2(7), 4L, 108L, "signup"),
      (ts2(8), 4L, 109L, "signup"))
      .toDF("ts", "user_id", "event_id", "event_type")
    graft.queries.Streaming.scd2(h1)
      .repartitionByRange(2, col("user_id"))
      .write.parquet(s"$root/table")
    h2.write.parquet(s"$root/changes")
    val st = Upsert.mergeScd2(spark, s"$root/table", s"$root/changes",
      s"$root/out", Seq("user_id", "event_type"))
    assert(st.versionsClosed == 2 && st.versionsAppended == 5 &&
      st.newKeys == 1, s"$st")
    val got = scd2Sorted(spark.read.parquet(s"$root/out"))
    val want = scd2Sorted(graft.queries.Streaming.scd2(h1.unionByName(h2)))
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("mergeScd2: closed-history files copy even for affected keys") {
    val root = Files.createTempDirectory("scd2cow").toString
    // land the table as two separate writes: one file holding ONLY
    // closed versions of key (1,view), one holding the open versions —
    // the probe must rewrite just the open-version file, because
    // closed history never changes
    val full = graft.queries.Streaming.scd2(
      Seq((ts2(1), 1L, 101L, "view"), (ts2(2), 1L, 102L, "view"),
        (ts2(3), 1L, 103L, "view"), (ts2(2), 2L, 104L, "cart"))
        .toDF("ts", "user_id", "event_id", "event_type"))
      .localCheckpoint()
    full.filter(!col("is_current")).coalesce(1)
      .write.parquet(s"$root/table")
    full.filter(col("is_current")).coalesce(1)
      .write.mode("append").parquet(s"$root/table")
    Seq((ts2(9), 1L, 110L, "view"))
      .toDF("ts", "user_id", "event_id", "event_type")
      .write.parquet(s"$root/changes")
    val st = Upsert.mergeScd2(spark, s"$root/table", s"$root/changes",
      s"$root/out", Seq("user_id", "event_type"))
    assert(st.filesRewritten == 1 && st.filesCopied == 1,
      s"closed-history file should copy byte-for-byte: $st")
    val events = Seq((ts2(1), 1L, 101L, "view"), (ts2(2), 1L, 102L, "view"),
      (ts2(3), 1L, 103L, "view"), (ts2(2), 2L, 104L, "cart"),
      (ts2(9), 1L, 110L, "view"))
      .toDF("ts", "user_id", "event_id", "event_type")
    assert(scd2Sorted(spark.read.parquet(s"$root/out")) ==
      scd2Sorted(graft.queries.Streaming.scd2(events)))
  }

  test("mergeScd2: history rewrites and replays fail loudly") {
    val root = Files.createTempDirectory("scd2guard").toString
    val h1 = Seq((ts2(4), 1L, 101L, "view"))
      .toDF("ts", "user_id", "event_id", "event_type")
    graft.queries.Streaming.scd2(h1).write.parquet(s"$root/table")
    // equal timestamp: the kernel would tie-break by event_id and
    // could reorder landed history — rejected, not guessed at
    Seq((ts2(4), 1L, 99L, "view"))
      .toDF("ts", "user_id", "event_id", "event_type")
      .write.parquet(s"$root/late")
    val ex = intercept[IllegalArgumentException] {
      Upsert.mergeScd2(spark, s"$root/table", s"$root/late",
        s"$root/out0", Seq("user_id", "event_type"))
    }
    assert(ex.getMessage.contains("append-only"), ex.getMessage)
    // a good batch applies once; replaying it reaches into history
    Seq((ts2(6), 1L, 102L, "view"))
      .toDF("ts", "user_id", "event_id", "event_type")
      .write.parquet(s"$root/changes")
    Upsert.mergeScd2(spark, s"$root/table", s"$root/changes",
      s"$root/out1", Seq("user_id", "event_type"))
    intercept[IllegalArgumentException] {
      Upsert.mergeScd2(spark, s"$root/out1", s"$root/changes",
        s"$root/out2", Seq("user_id", "event_type"))
    }
    // an exact duplicate row inside one batch has no chain position
    Seq((ts2(8), 1L, 103L, "view"), (ts2(8), 1L, 103L, "view"))
      .toDF("ts", "user_id", "event_id", "event_type")
      .write.parquet(s"$root/dup")
    intercept[IllegalArgumentException] {
      Upsert.mergeScd2(spark, s"$root/out1", s"$root/dup",
        s"$root/out3", Seq("user_id", "event_type"))
    }
  }

  test("mergeShared carries untouched files by reference through TableLog") {
    import graft.ingest.TableLog
    val root = Files.createTempDirectory("upsert-shared").toString
    // two-file table: keys [0,5) and [5,10) — the change touches the
    // first only, the second must carry without a byte moving
    val full = spark.range(10).select(col("id").as("k"),
      concat(lit("old"), col("id")).as("v"), lit(1L).as("ver"))
    full.filter(col("k") < 5).coalesce(1).write.parquet(s"$root/t")
    full.filter(col("k") >= 5).coalesce(1).write.mode("append")
      .parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    Seq((1L, "new1", 2L)).toDF("k", "v", "ver")
      .write.parquet(s"$root/changes")
    val (st, untouched) = Upsert.mergeShared(spark,
      TableLog.snapshotFiles(spark, s"$root/t"), s"$root/changes",
      s"$root/staged", Seq("k"), versionCol = Some("ver"))
    assert(st.filesRewritten == 1 && untouched.size == 1, s"$st")
    TableLog.commit(spark, s"$root/t", s"$root/staged", "upsert",
      expectedHead = Some(0), carry = untouched)
    val h = TableLog.history(spark, s"$root/t")
    assert(h(0).files.toSet.intersect(h(1).files.toSet).size == 1,
      "untouched file not shared by reference")
    // head snapshot ≡ the copying merge's result
    val viaLog = TableLog.read(spark, s"$root/t")
      .select("k", "v", "ver")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val want = ((0L until 10L).filterNot(_ == 1L)
      .map(k => (k, s"old$k", 1L)) :+ (1L, "new1", 2L)).sortBy(_._1)
    assert(viaLog == want, s"$viaLog")

    // SCD2 shared: the closed-history file carries, open-file rewrites
    val root2 = Files.createTempDirectory("scd2-shared").toString
    val scd = graft.queries.Streaming.scd2(
      Seq((ts2(1), 1L, 101L, "view"), (ts2(2), 1L, 102L, "view"))
        .toDF("ts", "user_id", "event_id", "event_type"))
      .localCheckpoint()
    scd.filter(!col("is_current")).coalesce(1)
      .write.parquet(s"$root2/t")
    scd.filter(col("is_current")).coalesce(1)
      .write.mode("append").parquet(s"$root2/t")
    TableLog.init(spark, s"$root2/t")
    Seq((ts2(9), 1L, 110L, "view"))
      .toDF("ts", "user_id", "event_id", "event_type")
      .write.parquet(s"$root2/changes")
    val (st2, un2) = Upsert.mergeScd2Shared(spark,
      TableLog.snapshotFiles(spark, s"$root2/t"), s"$root2/changes",
      s"$root2/staged", Seq("user_id", "event_type"))
    assert(st2.filesRewritten == 1 && un2.size == 1, s"$st2")
    TableLog.commit(spark, s"$root2/t", s"$root2/staged", "scd2",
      expectedHead = Some(0), carry = un2)
    assert(TableLog.read(spark, s"$root2/t").count() == 3L)
  }

  test("composite keys: (tenant, id) tuples, concat-ambiguous pairs held apart") {
    val root = Files.createTempDirectory("upsert-composite").toString
    // the HeadSplitJoin discipline: ("a","bc") and ("ab","c") concat
    // to the same string — a key-concatenation shortcut would merge
    // them; the composite tuple must not
    Seq(("a", "bc", "old-abc", 1L), ("ab", "c", "old-ab_c", 1L),
      ("t1", "x", "old-x", 1L))
      .toDF("tenant", "id", "v", "ver")
      .coalesce(1).write.parquet(s"$root/table")
    Seq(("a", "bc", "NEW", 2L), ("t2", "y", "ins", 2L))
      .toDF("tenant", "id", "v", "ver")
      .write.parquet(s"$root/changes")
    val st = Upsert.merge(spark, s"$root/table", s"$root/changes",
      s"$root/out", Seq("tenant", "id"), versionCol = Some("ver"))
    assert(st.upserts == 1 && st.inserts == 1, s"$st")
    val got = spark.read.parquet(s"$root/out")
      .select("tenant", "id", "v")
      .as[(String, String, String)].collect().sortBy(r => (r._1, r._2))
      .toSeq
    assert(got == Seq(("a", "bc", "NEW"), ("ab", "c", "old-ab_c"),
      ("t1", "x", "old-x"), ("t2", "y", "ins")), s"$got")
    // duplicate composite (keys, version) tuple still rejected loudly
    Seq(("a", "bc", "p", 3L), ("a", "bc", "q", 3L))
      .toDF("tenant", "id", "v", "ver").write.parquet(s"$root/dup")
    intercept[IllegalArgumentException] {
      Upsert.merge(spark, s"$root/out", s"$root/dup",
        s"$root/out2", Seq("tenant", "id"), versionCol = Some("ver"))
    }
  }

  test("schema evolution: a superset change feed widens the table") {
    import graft.ingest.TableLog
    val root = Files.createTempDirectory("upsert-evolve").toString
    // two-file table without `score`; the evolved feed adds it and
    // touches ONE file — the untouched file carries and null-fills
    val full = spark.range(10).select(col("id").as("k"),
      concat(lit("old"), col("id")).as("v"), lit(1L).as("ver"))
    full.filter(col("k") < 5).coalesce(1).write.parquet(s"$root/t")
    full.filter(col("k") >= 5).coalesce(1).write.mode("append")
      .parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    Seq((1L, "new1", 2L, 42L)).toDF("k", "v", "ver", "score")
      .write.parquet(s"$root/changes")
    val (st, untouched) = Upsert.mergeShared(spark,
      TableLog.snapshotFiles(spark, s"$root/t"), s"$root/changes",
      s"$root/staged", Seq("k"), versionCol = Some("ver"))
    assert(st.filesRewritten == 1 && untouched.size == 1, s"$st")
    TableLog.commit(spark, s"$root/t", s"$root/staged", "evolve",
      expectedHead = Some(0), carry = untouched)
    val head = TableLog.read(spark, s"$root/t")
    assert(head.columns.contains("score"))
    val scores = head.select("k", "score")
      .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(scores == (0L until 10L).map(k =>
      (k, if (k == 1L) Some(42L) else None)), s"$scores")
    // survivors of the REWRITTEN file null-filled too (k=0,2,3,4 came
    // through the widened read of the touched file)
    assert(head.filter(col("k") === 0L && col("score").isNull)
      .count() == 1L)
    // time travel: the pre-evolution snapshot keeps the old shape
    assert(!TableLog.read(spark, s"$root/t", Some(0))
      .columns.contains("score"))
    // a feed MISSING a table column is still loud
    Seq((2L, 3L)).toDF("k", "ver").write.parquet(s"$root/narrow")
    val ex = intercept[IllegalArgumentException] {
      Upsert.mergeShared(spark,
        TableLog.snapshotFiles(spark, s"$root/t"), s"$root/narrow",
        s"$root/staged2", Seq("k"), versionCol = Some("ver"))
    }
    assert(ex.getMessage.contains("missing table columns"),
      ex.getMessage)
  }
}
