package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Log-resident per-file column stats: scanWhere prunes a planted
  * range layout to the provably-matching files, stays lossless for
  * every predicate shape (including ones the pruner ignores), keeps
  * files without stats, follows maintenance commits, and applies
  * deletion vectors. */
class FileStatsSpec extends SparkSuite {

  import spark.implicits._

  /** 100 rows over 4 range files on k: k, a string name, and a
    * measure m that is NULL throughout the first file. */
  private def plant(root: String): Unit = {
    spark.range(100).select(col("id").as("k"),
        concat(lit("name"), format_string("%03d", col("id"))).as("v"),
        when(col("id") >= 25, col("id") * 2).as("m"))
      .repartitionByRange(4, col("k"))
      .write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
  }

  private def kept(root: String, pred: org.apache.spark.sql.Column)
      : (Int, Int) = {
    val (k, total) = TableLog.prunedFiles(spark, s"$root/t", pred)
    (k.size, total)
  }

  private def lossless(root: String,
      pred: org.apache.spark.sql.Column): Unit = {
    val got = TableLog.scanWhere(spark, s"$root/t", pred)
      .select("k").as[Long].collect().sorted.toSeq
    val want = TableLog.read(spark, s"$root/t").filter(pred)
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == want, s"scanWhere diverges for $pred: $got vs $want")
  }

  test("point and range predicates prune to the matching files") {
    val root = Files.createTempDirectory("fstats").toString
    plant(root)
    assert(kept(root, col("k") === 57) == (1, 4))
    assert(kept(root, col("k") === 57 && col("k") > 0) == (1, 4))
    assert(kept(root, col("k") > 1000) == (0, 4))
    assert(kept(root, col("k").isin(3, 98))._1 == 2)
    assert(kept(root, lit(10) <= col("k") && col("k") < 26)._1 == 2)
    // string stats: unsigned-UTF-8 range order
    assert(kept(root, col("v") === "name007") == (1, 4))
    assert(kept(root, col("v") < "name000") == (0, 4))
    // null-count pruning: m is null exactly in the first file
    assert(kept(root, col("m").isNull) == (1, 4))
    assert(kept(root, col("m") === 60)._1 == 1) // all-null file excluded
    // disjunctions compose: might(a OR b) = might(a) ∨ might(b)
    assert(kept(root, col("k") === 5 || col("k") === 95)._1 == 2)
    assert(kept(root, col("k") === 5 || col("k") % 7 === 0)._1 == 4,
      "an opaque OR side must keep every file")
    assert(kept(root, !col("m").isNull)._1 == 3) // NOT(IS NULL) flips
    Seq(col("k") === 57, col("k") > 1000, col("v") === "name007",
      col("m").isNull, col("m").isNotNull, col("m") === 60,
      lit(10) <= col("k") && col("k") < 26,
      col("k") === 5 || col("k") === 95,
      col("k").isin(3, 98)).foreach(lossless(root, _))
  }

  test("statsCandidates bound the upsert probe; pruned ≡ full probe") {
    val root = Files.createTempDirectory("fstats-probe").toString
    plant(root)
    val chg = Seq((57L, "renamed", 5000L), (500L, "ins", 1L))
      .toDF("k", "v", "m")
    // k=57 lives in one range file; k=500 is past every range (an
    // insert — touches nothing); the probe subset is that ONE file
    val cands = TableLog.statsCandidates(spark, s"$root/t", "k",
      chg.select("k"))
    assert(cands.size == 1, s"$cands")
    // the all-null m file is provably key-free; m=60 maps to one file
    assert(TableLog.statsCandidates(spark, s"$root/t", "m",
      Seq(60L).toDF("m")).size == 1)
    // unsupported key typing keeps every file (sound fallback)
    assert(TableLog.statsCandidates(spark, s"$root/t", "nope",
      Seq(1L).toDF("nope")).size == 4)
    // merge with the pruned probe ≡ merge with the full probe
    chg.write.parquet(s"$root/chg")
    val files = TableLog.snapshotFiles(spark, s"$root/t")
    val (st1, unt1) = graft.operators.Upsert.mergeShared(spark, files,
      s"$root/chg", s"$root/out1", Seq("k"))
    val (st2, unt2) = graft.operators.Upsert.mergeShared(spark, files,
      s"$root/chg", s"$root/out2", Seq("k"), probeFiles = Some(cands))
    assert(st1 == st2 && unt1.toSet == unt2.toSet, s"$st1 vs $st2")
    val r1 = spark.read.parquet(s"$root/out1").select("k", "v")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val r2 = spark.read.parquet(s"$root/out2").select("k", "v")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(r1 == r2 && r2.exists(_ == (500L, "ins")), s"$r1 vs $r2")
  }

  test("unsupported conjuncts are ignored, never unsound") {
    val root = Files.createTempDirectory("fstats-resid").toString
    plant(root)
    // k % 2 is not a pruneable shape: conjunct ignored, the k-range
    // conjunct still prunes, and the FULL predicate re-applies
    assert(kept(root, col("k") % 2 === 1 && col("k") === 57) == (1, 4))
    lossless(root, col("k") % 2 === 1 && col("k") === 57)
    // fractional literal against integral stats compares exactly
    assert(kept(root, col("k") > lit(98.5))._1 == 1)
    lossless(root, col("k") > lit(98.5))
  }

  test("files without stats are always kept (legacy log)") {
    val root = Files.createTempDirectory("fstats-legacy").toString
    plant(root)
    // strip every stats line from the v0 record, as a pre-r18 log
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dp = new org.apache.hadoop.fs.Path(
      s"$root/t/_graft_log/v0000000000.delta")
    val stripped = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dp.toUri.getPath)), "UTF-8")
      .linesIterator.filterNot(_.startsWith("stats="))
      .mkString("", "\n", "\n")
    fs.delete(dp, false)
    val out = fs.create(dp, false)
    out.write(stripped.getBytes("UTF-8")); out.close()
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/t/_graft_log/v0000000000.checkpoint.parquet"), false)
    TableLog.dropCheckpointCache()
    assert(kept(root, col("k") === 57) == (4, 4),
      "a stats-free log must keep every file")
    lossless(root, col("k") === 57)
  }

  test("stats follow maintenance commits; DVs apply to pruned scans") {
    val root = Files.createTempDirectory("fstats-commit").toString
    plant(root)
    // a keyed upsert rewrites one file; its stats re-record, carried
    // files keep theirs, and the NEW value is found via pruning
    Seq((57L, "renamed", 5000L)).toDF("k", "v", "m")
      .write.parquet(s"$root/chg")
    val (_, unt) = graft.operators.Upsert.mergeShared(spark,
      TableLog.snapshotFiles(spark, s"$root/t"), s"$root/chg",
      s"$root/stage", Seq("k"))
    TableLog.commit(spark, s"$root/t", s"$root/stage", "upsert",
      expectedHead = Some(0), carry = unt)
    assert(kept(root, col("m") === 5000L)._1 == 1)
    assert(kept(root, col("v") === "renamed")._1 == 1)
    lossless(root, col("m") === 5000L)
    // merge-on-read delete: the pruned scan must apply the DV
    TableLog.deleteWhere(spark, s"$root/t", col("k") === 57)
    assert(TableLog.scanWhere(spark, s"$root/t",
      col("v") === "renamed").count() == 0L)
    lossless(root, col("k") > 50)
    // and expire past v0 lands a floor checkpoint CARRYING stats
    TableLog.expire(spark, s"$root/t", retainLast = 1, minAgeMs = 0L)
    TableLog.dropCheckpointCache()
    assert(kept(root, col("m") === 5000L)._1 == 1,
      "floor checkpoint must carry the stats lines")
  }
}
