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
