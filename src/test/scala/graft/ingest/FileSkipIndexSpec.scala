package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Per-file Bloom skipping: lossless (lookup ≡ full scan, keys absent
  * everywhere included) and actually pruning (a key living in one file
  * reads one file). */
class FileSkipIndexSpec extends SparkSuite {

  import spark.implicits._

  test("lookup ≡ full scan; single-file keys read a single file") {
    val root = Files.createTempDirectory("skipidx").toString
    // clustered by k in 4 deterministic files; the INDEXED column v is
    // anti-correlated with the layout (v = 9999 - k), so min/max
    // pruning on k can never serve a v lookup — the bloom must
    (0 until 4).foreach { f =>
      spark.range(f * 250, (f + 1) * 250)
        .select(col("id").as("k"), (lit(9999) - col("id")).as("v"))
        .coalesce(1).write.mode("append").parquet(s"$root/t")
    }
    FileSkipIndex.build(spark, s"$root/t", "v", mBits = 1L << 16, k = 4)

    // point lookups across three files + a key absent everywhere
    val keys = Seq("9999", "9700", "9200", "123456")
    val got = FileSkipIndex.lookup(spark, s"$root/t", "v", keys)
      .select("k", "v").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val want = spark.read.parquet(s"$root/t")
      .filter(col("v").cast("string").isin(keys: _*))
      .select("k", "v").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(want.size == 3 && got == want, s"got=$got want=$want")

    // pruning: each present key lives in exactly one file — with
    // 250 keys/file in 2^16 bits the planted layout resolves to one
    // candidate (deterministic: xxhash64 is fixed)
    val one = FileSkipIndex.candidateFiles(spark, s"$root/t", "v",
      Seq("9999"))
    assert(one.size == 1, s"expected 1 candidate file, got $one")
    // the absent key prunes everything — zero files, zero rows
    assert(FileSkipIndex.candidateFiles(spark, s"$root/t", "v",
      Seq("123456")).isEmpty)
    val empty = FileSkipIndex.lookup(spark, s"$root/t", "v",
      Seq("123456"))
    assert(empty.count() == 0 &&
      empty.columns.toSeq == Seq("k", "v"))

    // no false negatives over EVERY key in the table (the guarantee,
    // not a sample): each key's candidate set contains its file
    val allCands = FileSkipIndex.candidateFiles(spark, s"$root/t", "v",
      (9000 to 9999).map(_.toString))
    val gotAll = FileSkipIndex.lookup(spark, s"$root/t", "v",
      (9000 to 9999).map(_.toString)).count()
    assert(gotAll == 1000L, s"lost rows to skipping: $gotAll")
    assert(allCands.size == 4)
  }

  test("duplicate lookup keys and shared probe bits stay lossless") {
    val root = Files.createTempDirectory("skipidx-dup").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$root/t")
    // tiny filter forces probe-bit collisions within a key
    FileSkipIndex.build(spark, s"$root/t", "v", mBits = 64, k = 6)
    val got = FileSkipIndex.lookup(spark, s"$root/t", "v",
      Seq("a", "a", "b"))
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L), s"$got")
  }

  test("versioned tables: raw-directory build/lookup fail loudly") {
    val root = Files.createTempDirectory("skipidx-guard").toString
    Seq((1L, "a")).toDF("k", "v").coalesce(1).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    val ex = intercept[IllegalArgumentException] {
      FileSkipIndex.build(spark, s"$root/t", "v")
    }
    assert(ex.getMessage.contains("TableLog-versioned"), ex.getMessage)
    intercept[IllegalArgumentException] {
      FileSkipIndex.lookup(spark, s"$root/t", "v", Seq("a"))
    }
  }

  test("refresh after an upsert commit: incremental, provably touched-only") {
    val root = Files.createTempDirectory("skipidx-refresh").toString
    // 4-file versioned table clustered by k, indexed on v = 9999 - k
    (0 until 4).foreach { f =>
      spark.range(f * 250, (f + 1) * 250)
        .select(col("id").as("k"), (lit(9999) - col("id")).as("v"),
          lit(1L).as("ver"))
        .coalesce(1).write.mode("append").parquet(s"$root/t")
    }
    TableLog.init(spark, s"$root/t")
    FileSkipIndex.buildFiles(spark, s"$root/t", "v",
      TableLog.snapshotFiles(spark, s"$root/t"),
      mBits = 1L << 16, k = 4)

    // an upsert touches ONE file (k=100 → v=9899 moves to v=77)
    Seq((100L, 77L, 2L)).toDF("k", "v", "ver")
      .write.parquet(s"$root/changes")
    val (st, untouched) = graft.operators.Upsert.mergeShared(spark,
      TableLog.snapshotFiles(spark, s"$root/t"), s"$root/changes",
      s"$root/staged", Seq("k"), versionCol = Some("ver"))
    assert(st.filesRewritten == 1, s"$st")
    TableLog.commit(spark, s"$root/t", s"$root/staged", "upsert",
      expectedHead = Some(0), carry = untouched)

    // the incremental pass re-aggregates ONLY the snapshot's new
    // files (the rewrite's output), keeps the 3 quiet files' rows,
    // and drops the replaced file's
    val rs = FileSkipIndex.refresh(spark, s"$root/t", "v")
    assert(rs.filesKept == 3 && rs.filesDropped == 1 &&
      rs.filesIndexed >= 1, s"$rs")

    // lossless against the head snapshot: the moved value found, the
    // vacated value gone, an untouched value still one-file-pruned
    val head = TableLog.read(spark, s"$root/t")
    def scan(keys: Seq[String]) = head
      .filter(col("v").cast("string").isin(keys: _*))
      .select("k", "v").as[(Long, Long)].collect().sortBy(_._1).toSeq
    def idx(keys: Seq[String]) =
      FileSkipIndex.lookupSnapshot(spark, s"$root/t", "v", keys)
        .select("k", "v").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val keys = Seq("77", "9899", "9700", "123456")
    assert(idx(keys) == scan(keys) && scan(keys).size == 2,
      s"idx=${idx(keys)} scan=${scan(keys)}")
    assert(FileSkipIndex.candidateFiles(spark, s"$root/t", "v",
      Seq("9700")).size == 1)

    // time travel: the same probe scoped to v0 sees the PRE-upsert
    // rows WITHOUT a rebuild — refresh dropped v0's replaced file
    // from the sidecar, so that file is sidecar-unindexed and scans
    // unconditionally (lossless by construction, r17)
    val old = FileSkipIndex.lookupSnapshot(spark, s"$root/t", "v",
      Seq("9899", "77"), version = Some(0))
      .select("k", "v").as[(Long, Long)].collect().toSeq
    assert(old == Seq((100L, 9899L)), s"$old")

    // full-history losslessness at the head
    val all = (9000 to 9999).map(_.toString) :+ "77"
    assert(idx(all).size == head
      .filter(col("v").cast("string").isin(all: _*)).count().toInt)
  }

  test("lookupSnapshot lossless when the sidecar trails the head") {
    val root = Files.createTempDirectory("skipidx-trail").toString
    (0 until 4).foreach { f =>
      spark.range(f * 250, (f + 1) * 250)
        .select(col("id").as("k"), (lit(9999) - col("id")).as("v"),
          lit(1L).as("ver"))
        .coalesce(1).write.mode("append").parquet(s"$root/t")
    }
    TableLog.init(spark, s"$root/t")
    FileSkipIndex.buildFiles(spark, s"$root/t", "v",
      TableLog.snapshotFiles(spark, s"$root/t"),
      mBits = 1L << 16, k = 4)

    // a commit lands and the caller FORGETS refresh: the moved value
    // lives in a file the sidecar does not index — it must still be
    // found (scanned unconditionally), the vacated value must be gone
    // (its file left the snapshot), and untouched values stay pruned
    Seq((100L, 77L, 2L)).toDF("k", "v", "ver")
      .write.parquet(s"$root/changes")
    val (st, untouched) = graft.operators.Upsert.mergeShared(spark,
      TableLog.snapshotFiles(spark, s"$root/t"), s"$root/changes",
      s"$root/staged", Seq("k"), versionCol = Some("ver"))
    assert(st.filesRewritten == 1, s"$st")
    TableLog.commit(spark, s"$root/t", s"$root/staged", "upsert",
      expectedHead = Some(0), carry = untouched)

    def idx(keys: Seq[String]) =
      FileSkipIndex.lookupSnapshot(spark, s"$root/t", "v", keys)
        .select("k", "v").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val got = idx(Seq("77", "9899", "9700", "123456"))
    assert(got == Seq((100L, 77L), (299L, 9700L)), s"$got")

    // pruning still works for indexed files even while the sidecar
    // trails: an absent key reads ONLY the unindexed files (the v1
    // commit's rewrite output), never the 3 quiet indexed ones
    val absent = FileSkipIndex.lookupSnapshot(spark, s"$root/t", "v",
      Seq("123456"))
    assert(absent.count() == 0 &&
      absent.inputFiles.nonEmpty &&
      absent.inputFiles.forall(f =>
        new org.apache.hadoop.fs.Path(f).getName.startsWith("v1-")),
      s"read ${absent.inputFiles.toSeq}")

    // refresh restores full pruning; result unchanged
    FileSkipIndex.refresh(spark, s"$root/t", "v")
    assert(idx(Seq("77", "9899", "9700", "123456")) == got)
  }

  test("refresh joins the sidecar against a names frame (no giant In)") {
    val root = Files.createTempDirectory("skipidx-plan").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$root/t")
    FileSkipIndex.build(spark, s"$root/t", "v", mBits = 64, k = 2)
    val idx = spark.read.parquet(s"$root/t/_graft_index/v")
    val kept = FileSkipIndex.keptRows(spark, idx,
      (0 until 1000).map(i => s"part-$i.parquet"))
    val plan = kept.queryExecution.optimizedPlan.toString
    assert(plan.contains("Join"), plan.take(500))
    assert(!plan.contains(" IN ") && !plan.contains("isin"),
      plan.take(500))
  }
}
