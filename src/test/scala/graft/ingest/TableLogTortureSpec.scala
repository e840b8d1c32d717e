package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Adversarial drives of the r16 incremental log:
  *  - a REAL same-head commit race across threads — the read-back
  *    protocol must let exactly one writer win, loudly fail the rest,
  *    and leave a linear, fully-readable history (the r15 advice's
  *    silent-lost-commit scenario, exercised rather than argued);
  *  - a randomized commit/carry/expire fuzz checked against an
  *    in-memory model — resolution must stay exact across checkpoint
  *    boundaries, zero-copy carries, and moving retention floors. */
class TableLogTortureSpec extends SparkSuite {

  import spark.implicits._

  test("racing same-head committers: one winner, losers loud, history linear") {
    val root = Files.createTempDirectory("tablelog-race").toString
    Seq((0L, "base")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    val writers = 6
    (0 until writers).foreach { i =>
      Seq((100L + i, s"w$i")).toDF("k", "v").coalesce(1)
        .write.parquet(s"$root/stage$i")
    }
    // all six observed head v0; a barrier maximizes true overlap
    val barrier = new java.util.concurrent.CyclicBarrier(writers)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutor(pool)
    val outcomes = try Await.result(Future.sequence(
      (0 until writers).map(i => Future {
        barrier.await()
        try Right(TableLog.commit(spark, s"$root/t", s"$root/stage$i",
          s"w$i", expectedHead = Some(0)))
        catch { case e: Throwable => Left(e.getMessage) }
      })), 120.seconds)
    finally pool.shutdown()
    val wins = outcomes.collect { case Right(v) => v }
    assert(wins == Seq(1) || wins.size == 1,
      s"expected exactly one winner at v1: $outcomes")
    // every loser failed LOUDLY with a conflict-shaped message
    outcomes.collect { case Left(m) => m }.foreach(m =>
      assert(m.contains("conflict") || m.contains("rename") ||
        m.contains("overwrote"), m))
    // the published head is the winner's content, readable, linear
    val (deltas, _) = (TableLog.head(spark, s"$root/t"),
      TableLog.history(spark, s"$root/t"))
    assert(deltas.contains(1))
    val head = TableLog.read(spark, s"$root/t")
      .select("k", "v").as[(Long, String)].collect().toSeq
    assert(head.size == 1 && head.head._2.startsWith("w"), s"$head")
    val winner = TableLog.actions(spark, s"$root/t").last._2
    assert(head.head._2 == winner,
      s"head rows ${head} vs recorded action $winner — a lost commit")
    // losers' moved files are never-referenced orphans: invisible to
    // readers, swept once aged (minAge 0 here)
    val st = TableLog.expire(spark, s"$root/t", retainLast = 2,
      minAgeMs = 0L)
    assert(st.filesDropped >= writers - 1 - 1,
      s"orphans not swept: $st")
    assert(TableLog.read(spark, s"$root/t")
      .select("v").as[String].collect().toSeq == Seq(winner))
  }

  test("disjoint writers both land via rebase; overlap still conflicts") {
    val root = Files.createTempDirectory("tablelog-rebase").toString
    spark.range(10).select(col("id").as("k"),
        concat(lit("old"), col("id")).as("v"), lit(1L).as("ver"))
      .repartitionByRange(2, col("k")).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    val v0files = TableLog.snapshotFiles(spark, s"$root/t")

    // both writers read v0; A touches the low file (k=1), B the high
    // file (k=7) — disjoint touched sets
    def stage(n: String, k: Long, ver: Long): Seq[String] = {
      Seq((k, n, ver)).toDF("k", "v", "ver").write
        .parquet(s"$root/chg$n")
      val (st, unt) = graft.operators.Upsert.mergeShared(spark,
        v0files, s"$root/chg$n", s"$root/stage$n", Seq("k"),
        versionCol = Some("ver"))
      assert(st.filesRewritten == 1, s"$st")
      unt
    }
    val untA = stage("A", 1L, 2L)
    val untB = stage("B", 7L, 2L)
    assert(TableLog.commit(spark, s"$root/t", s"$root/stageA", "a",
      expectedHead = Some(0), carry = untA) == 1)
    // without rebase, B's stale expectedHead is a loud conflict
    val ex0 = intercept[IllegalArgumentException] {
      TableLog.commit(spark, s"$root/t", s"$root/stageB", "b",
        expectedHead = Some(0), carry = untB)
    }
    assert(ex0.getMessage.contains("conflict"), ex0.getMessage)
    // with rebase, B lands on the NEW head carrying A's rewrite
    assert(TableLog.commit(spark, s"$root/t", s"$root/stageB", "b",
      expectedHead = Some(0), carry = untB, rebase = true) == 2)
    val head = TableLog.read(spark, s"$root/t")
      .select("k", "v").as[(Long, String)].collect().sortBy(_._1).toSeq
    val want = (0L until 10L).map {
      case 1L => (1L, "A"); case 7L => (7L, "B")
      case k => (k, s"old$k")
    }
    assert(head == want, s"$head")

    // overlapping writers: C and D both rewrite the low file at v2 —
    // D's rebase must refuse (its rewrite read rows C replaced)
    val v2files = TableLog.snapshotFiles(spark, s"$root/t")
    def stage2(n: String, k: Long): Seq[String] = {
      Seq((k, n, 3L)).toDF("k", "v", "ver").write
        .parquet(s"$root/chg$n")
      graft.operators.Upsert.mergeShared(spark, v2files, s"$root/chg$n",
        s"$root/stage$n", Seq("k"), versionCol = Some("ver"))._2
    }
    // SAME key: both rewrites read (and replace) the file holding
    // k=2 — the canonical stale-read overlap
    val untC = stage2("C", 2L)
    val untD = stage2("D", 2L)
    assert(TableLog.commit(spark, s"$root/t", s"$root/stageC", "c",
      expectedHead = Some(2), carry = untC) == 3)
    val ex = intercept[IllegalArgumentException] {
      TableLog.commit(spark, s"$root/t", s"$root/stageD", "d",
        expectedHead = Some(2), carry = untD, rebase = true)
    }
    assert(ex.getMessage.contains("rebase conflict"), ex.getMessage)
    // and an expired expected head cannot rebase (its touched set is
    // unknowable) — loud, not silent
    TableLog.expire(spark, s"$root/t", retainLast = 2, minAgeMs = 0L)
    val ex2 = intercept[IllegalArgumentException] {
      TableLog.commit(spark, s"$root/t", s"$root/stageD", "d",
        expectedHead = Some(0), carry = untD, rebase = true)
    }
    assert(ex2.getMessage.contains("expired"), ex2.getMessage)
  }

  test("six disjoint rebasing writers racing one head ALL land") {
    val root = Files.createTempDirectory("tablelog-rebase-race").toString
    val writers = 6
    spark.range(1000).select(col("id").as("k"),
        concat(lit("old"), col("id")).as("v"), lit(1L).as("ver"))
      .repartitionByRange(8, col("k")).write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    val v0files = TableLog.snapshotFiles(spark, s"$root/t")
    // each writer rewrites ONE distinct file (keys 125 apart land in
    // different range files)
    val unts = (0 until writers).map { i =>
      Seq((i * 125L + 10L, s"w$i", 2L)).toDF("k", "v", "ver")
        .write.parquet(s"$root/chg$i")
      val (st, unt) = graft.operators.Upsert.mergeShared(spark,
        v0files, s"$root/chg$i", s"$root/stage$i", Seq("k"),
        versionCol = Some("ver"))
      assert(st.filesRewritten == 1, s"writer $i: $st")
      unt
    }
    val barrier = new java.util.concurrent.CyclicBarrier(writers)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutor(pool)
    val outcomes = try Await.result(Future.sequence(
      (0 until writers).map(i => Future {
        barrier.await()
        try Right(TableLog.commit(spark, s"$root/t", s"$root/stage$i",
          s"w$i", expectedHead = Some(0), carry = unts(i),
          rebase = true))
        catch { case e: Throwable => Left(e.getMessage) }
      })), 180.seconds)
    finally pool.shutdown()
    // with disjoint touched sets EVERY writer lands (entry rebase or
    // publish-race retry), versions linear 1..6, no lost update
    val wins = outcomes.collect { case Right(v) => v }.sorted
    assert(wins == (1 to writers), s"$outcomes")
    val head = TableLog.read(spark, s"$root/t")
      .select("k", "v").as[(Long, String)].collect().toMap
    (0 until writers).foreach(i =>
      assert(head(i * 125L + 10L) == s"w$i",
        s"writer $i's update lost: ${head.filter(_._2.startsWith("w"))}"))
    assert(head.size == 1000 &&
      head.count(_._2.startsWith("w")) == writers)
  }

  test("randomized commit/carry/expire fuzz vs an in-memory model") {
    val root = Files.createTempDirectory("tablelog-fuzz").toString
    val rnd = new scala.util.Random(42)
    Seq((0L, "r0")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$root/t")
    TableLog.init(spark, s"$root/t")
    // model: per retained version, the multiset of rows; per live
    // file name, its single row (every staged write is one row in
    // one file, so carry selection maps exactly)
    var fileRows = TableLog.history(spark, s"$root/t").head.files
      .map(_ -> (0L, "r0")).toMap
    var model = Map(0 -> Seq((0L, "r0")))
    var head = 0
    (1 to 24).foreach { i =>
      val current = TableLog.history(spark, s"$root/t")
        .find(_.version == head).get.files
      // carry a random subset of the head's files, stage one new row
      val carried = current.filter(_ => rnd.nextBoolean())
      Seq((i.toLong, s"r$i")).toDF("k", "v").coalesce(1)
        .write.parquet(s"$root/stage$i")
      val v = TableLog.commit(spark, s"$root/t", s"$root/stage$i",
        s"c$i", expectedHead = Some(head),
        carry = carried.map(n => s"$root/t/$n"))
      val newNames = TableLog.history(spark, s"$root/t")
        .find(_.version == v).get.files.filterNot(carried.contains)
      assert(newNames.size == 1, s"v$v adds: $newNames")
      fileRows += newNames.head -> (i.toLong, s"r$i")
      model += v -> (carried.map(fileRows) :+ (i.toLong, s"r$i"))
      head = v
      // occasional expire with a random retention window
      if (rnd.nextInt(4) == 0) {
        val retain = 1 + rnd.nextInt(3)
        TableLog.expire(spark, s"$root/t", retain, minAgeMs = 0L)
        val kept = model.keys.toSeq.sorted.takeRight(retain)
        model = model.view.filterKeys(kept.contains).toMap
      }
      // verify a random retained version resolves to the model rows
      val probe = model.keys.toSeq(rnd.nextInt(model.size))
      val got = TableLog.read(spark, s"$root/t", Some(probe))
        .select("k", "v").as[(Long, String)].collect().sorted.toSeq
      assert(got == model(probe).sorted,
        s"v$probe: got $got want ${model(probe).sorted} (op $i)")
    }
    // closing sweep: every retained version still exact
    model.keys.toSeq.sorted.foreach { v =>
      val got = TableLog.read(spark, s"$root/t", Some(v))
        .select("k", "v").as[(Long, String)].collect().sorted.toSeq
      assert(got == model(v).sorted, s"final v$v mismatch")
    }
  }
}
