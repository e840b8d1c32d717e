package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming MinHash near-dup stage: near-duplicates dropped ACROSS
  * micro-batches via the bucket-claim registry, state bounded by the
  * watermark horizon (old claims expire), registry compaction, and
  * end-to-end wiring through CorpusPipeline.startNearDup. */
class NearDupStageSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  private def longText(seed: String): String =
    (1 to 100).map(i => s"$seed$i").mkString(" ")

  /** ~97% shingle-identical: one token changed mid-document. */
  private def nearDupOf(text: String): String = {
    val t = text.split(" "); t(50) = "CHANGED"; t.mkString(" ")
  }

  test("near-dups drop across micro-batches; state expires at the horizon") {
    import spark.implicits._
    val reg = Files.createTempDirectory("ndr").toString + "/registry"
    val stage = NearDupStage(reg, watermarkMs = 10 * 60000L)
    val alpha = longText("alpha")

    // epoch 0: two distinct docs, plus an IN-batch near-dup of alpha
    val b0 = Seq(
      (1L, ts(0), alpha, "crawl"),
      (2L, ts(1), nearDupOf(alpha), "crawl"),   // in-batch near-dup → drop
      (3L, ts(2), longText("beta"), "crawl"))
      .toDF("doc_id", "ts", "text", "source")
    assert(stage.process(b0, 0L).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 3L))

    // epoch 1 (inside the watermark): cross-batch near-dup of alpha
    // drops; a fresh doc survives
    val b1 = Seq(
      (4L, ts(5), nearDupOf(alpha), "feed"),    // cross-batch near-dup
      (5L, ts(6), longText("gamma"), "feed"))
      .toDF("doc_id", "ts", "text", "source")
    assert(stage.process(b1, 1L).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(5L))

    // epoch 2: far in the future — alpha's claims are now BELOW the
    // horizon, so its near-dup is (deliberately) kept: bounded state
    val b2 = Seq(
      (6L, ts(90), nearDupOf(alpha), "crawl"),
      (7L, ts(91), longText("gamma"), "crawl")) // gamma claim also expired
      .toDF("doc_id", "ts", "text", "source")
    assert(stage.process(b2, 2L).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(6L, 7L))

    // epoch 3: near-dup of the RE-ADMITTED doc 6 drops again
    val b3 = Seq((8L, ts(92), nearDupOf(longText("alpha")), "crawl"))
      .toDF("doc_id", "ts", "text", "source")
    assert(stage.process(b3, 3L).count() == 0)

    // compaction drops sub-horizon claims but keeps live ones
    stage.compact(spark)
    val live = spark.read.parquet(s"$reg/epoch=-1")
    assert(live.count() > 0)
    assert(live.filter(org.apache.spark.sql.functions.col("ts") < ts(80))
      .count() == 0, "sub-horizon claims must be gone after compact")
    // post-compact: collision checking still works
    val b4 = Seq((9L, ts(93), nearDupOf(longText("gamma")), "crawl"))
      .toDF("doc_id", "ts", "text", "source")
    assert(stage.process(b4, 4L).count() == 0)
  }

  test("epoch replay is idempotent: re-running a batch can't self-collide") {
    import spark.implicits._
    val reg = Files.createTempDirectory("ndr-replay").toString + "/registry"
    val stage = NearDupStage(reg, watermarkMs = 10 * 60000L)
    val b0 = Seq((1L, ts(0), longText("delta"), "crawl"))
      .toDF("doc_id", "ts", "text", "source")
    assert(stage.process(b0, 0L).count() == 1)
    // replay of the same epoch (crash before checkpoint commit): the
    // claims it wrote must not drop its own docs
    assert(stage.process(b0, 0L).count() == 1)
  }

  test("end-to-end: quality filter → LSH dedup → chunks land in parquet") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ndr-e2e").toString
    val in = MemoryStream[(Long, Timestamp, String, String)](spark)
    val alpha = longText("alpha")
    in.addData(
      (1L, ts(0), alpha, "crawl"),              // kept: 3 chunks
      (2L, ts(1), nearDupOf(alpha), "crawl"),   // near-dup → dropped
      (3L, ts(2), "tiny", "crawl"),             // quality-filtered
      (4L, ts(3), longText("beta"), "feed"))    // kept: 3 chunks
    val q = CorpusPipeline.startNearDup(
      in.toDF().toDF("doc_id", "ts", "text", "source"),
      s"$dir/out", s"$dir/ckpt", s"$dir/registry",
      watermark = "10 minutes", trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$dir/out")
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toSeq
    assert(out.map(_._1).distinct.sorted == Seq(1L, 4L))
    assert(out.count(_._1 == 1L) == 3 && out.count(_._1 == 4L) == 3)
  }

  test("auto-compaction folds old epochs but never the replayable newest") {
    import spark.implicits._
    val reg = Files.createTempDirectory("ndr-auto").toString + "/registry"
    val stage = NearDupStage(reg, watermarkMs = 60 * 60000L, compactEvery = 2)
    def batch(id: Long, minute: Int, seed: String) =
      Seq((id, ts(minute), longText(seed), "crawl"))
        .toDF("doc_id", "ts", "text", "source")
    assert(stage.process(batch(1L, 0, "alpha"), 0L).count() == 1)
    assert(stage.process(batch(2L, 1, "beta"), 1L).count() == 1)
    assert(stage.process(batch(3L, 2, "gamma"), 2L).count() == 1) // compacts
    val dirs = new java.io.File(reg).listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).sorted.toSeq
    assert(dirs == Seq("epoch=-1", "epoch=2"),
      s"epochs 0/1 fold, newest survives: $dirs")
    // replay of the newest epoch can't self-collide (its claims were NOT
    // folded into the base)
    assert(stage.process(batch(3L, 2, "gamma"), 2L).count() == 1)
    // and claims folded into the base still drop near-dups
    assert(stage.process(
      Seq((4L, ts(3), nearDupOf(longText("alpha")), "crawl"))
        .toDF("doc_id", "ts", "text", "source"), 3L).count() == 0)
  }

  /** A doc's (band, band_hash) set, replicating the stage's banding
    * (nPerm=32, bands=8 ⇒ rows=4) so tests can reason about collisions. */
  private def bandSet(text: String): Set[(Int, Long)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Seq(text).toDF("text")
      .select(graft.functions.TextFunctions.minhashSig(
        graft.functions.TextFunctions.shingles3(col("text")), 32).as("sig"))
      .select(posexplode(expr(
        "transform(sequence(0, 7), b -> xxhash64(slice(sig, int(b) * 4 + 1, 4)))")))
      .as[(Int, Long)].collect().toSet
  }

  test("docs dropped by the registry claim nothing in-batch either") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val reg = Files.createTempDirectory("ndr-fresh").toString + "/registry"
    val stage = NearDupStage(reg, watermarkMs = 10 * 60000L)

    // doc2 will collide with the registry on band 0 only; doc3 is a
    // perturbation of doc2 chosen (deterministic search) so that it
    // shares >=1 band with doc2 but NOT doc2's band-0 hash — its only
    // collision is with a doc the registry already dropped
    val doc2Text = longText("omega")
    val b2 = bandSet(doc2Text)
    val claim0 = b2.find(_._1 == 0).get
    val doc3Text = (0 until 100).iterator.map { i =>
      val t = doc2Text.split(" "); t(i) = s"PERTURB$i"; t.mkString(" ")
    }.find { c =>
      val b3 = bandSet(c)
      !b3.contains(claim0) && (b3 & b2).exists(_._1 != 0)
    }.getOrElse(fail("no discriminating perturbation found"))

    // registry claims exactly doc2's band-0 bucket (as if an earlier doc
    // had claimed it)
    Seq((claim0._1, claim0._2, ts(0)))
      .toDF("band", "band_hash", "ts")
      .write.parquet(s"$reg/epoch=0")

    val b1 = Seq(
      (2L, ts(1), doc2Text, "crawl"),  // drops: registry collision
      (3L, ts(2), doc3Text, "crawl"))  // collides only with dropped doc2
      .toDF("doc_id", "ts", "text", "source")
    assert(stage.process(b1, 1L).select("doc_id").as[Long].collect().toSeq
      == Seq(3L),
      "a registry-dropped doc must not suppress its in-batch peers")
    // and the survivor's claims were written (it now owns its buckets)
    assert(spark.read.parquet(s"$reg/epoch=1").count() > 0)
  }

  test("repeated compactions promote fresh negative bases before deleting") {
    import spark.implicits._
    val reg = Files.createTempDirectory("ndr-recompact").toString + "/registry"
    val stage = NearDupStage(reg, watermarkMs = 60 * 60000L, compactEvery = 2)
    def batch(id: Long, minute: Int, seed: String) =
      Seq((id, ts(minute), longText(seed), "crawl"))
        .toDF("doc_id", "ts", "text", "source")
    assert(stage.process(batch(1L, 0, "alpha"), 0L).count() == 1)
    assert(stage.process(batch(2L, 1, "beta"), 1L).count() == 1)
    assert(stage.process(batch(3L, 2, "gamma"), 2L).count() == 1) // → epoch=-1
    assert(stage.process(batch(4L, 3, "delta"), 3L).count() == 1)
    assert(stage.process(batch(5L, 4, "zeta"), 4L).count() == 1)  // → epoch=-2
    val dirs = new java.io.File(reg).listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).sorted.toSeq
    assert(dirs == Seq("epoch=-2", "epoch=4"),
      s"second compaction folds the first base into a fresh one: $dirs")
    // claims from every folded generation are still live
    assert(stage.process(
      Seq((6L, ts(5), nearDupOf(longText("alpha")), "crawl"))
        .toDF("doc_id", "ts", "text", "source"), 5L).count() == 0)
    assert(stage.process(
      Seq((7L, ts(6), nearDupOf(longText("delta")), "crawl"))
        .toDF("doc_id", "ts", "text", "source"), 6L).count() == 0)
  }

  test("restart on the same checkpoint neither loses nor duplicates") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ndr-restart").toString
    val in = MemoryStream[(Long, Timestamp, String, String)](spark)
    val alpha = longText("alpha")
    in.addData((1L, ts(0), alpha, "crawl"))
    def run(): Unit = {
      val q = CorpusPipeline.startNearDup(
        in.toDF().toDF("doc_id", "ts", "text", "source"),
        s"$dir/out", s"$dir/ckpt", s"$dir/registry",
        watermark = "10 minutes", trigger = Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    run()
    // second run, same checkpoint: resumes AFTER doc 1, near-dup of it
    // (arriving in a later batch, new query instance) still drops
    in.addData(
      (2L, ts(4), nearDupOf(alpha), "feed"),
      (3L, ts(5), longText("epsilon"), "feed"))
    run()
    val out = spark.read.parquet(s"$dir/out")
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toSeq
    assert(out.map(_._1).distinct.sorted == Seq(1L, 3L))
    // no duplicated chunks for doc 1 (it was not reprocessed)
    assert(out.count(_._1 == 1L) == 3)
  }

  test("processWith: a failing sink still lands the claims, then " +
      "propagates — and the epoch replays cleanly") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val reg = Files.createTempDirectory("ndw").toString + "/registry"
    val stage = NearDupStage(reg, watermarkMs = 10 * 60000L)
    val b0 = Seq(
      (1L, ts(0), longText("alpha"), "crawl"),
      (2L, ts(1), longText("beta"), "crawl"))
      .toDF("doc_id", "ts", "text", "source")
    val boom = intercept[RuntimeException] {
      stage.processWith(b0, 0L) { _ =>
        throw new RuntimeException("sink exploded")
      }
    }
    assert(boom.getMessage == "sink exploded")
    // the overlapped claim write was awaited, not abandoned: epoch 0's
    // claims exist on disk (harmless — the replay overwrites them)
    val fs = new Path(reg).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$reg/epoch=0")))
    // the engine replays the epoch after the failure; the survivors the
    // retry sees must be the same batch, NOT self-collided against the
    // crashed attempt's claims
    var kept: Seq[Long] = Seq.empty
    stage.processWith(b0, 0L) { s =>
      kept = s.select("doc_id").as[Long].collect().sorted.toSeq
    }
    assert(kept == Seq(1L, 2L))
    // and the cross-batch path still works on top of the replayed claims
    val b1 = Seq(
      (3L, ts(3), longText("alpha"), "feed"), // dup of claimed doc 1
      (4L, ts(4), longText("gamma"), "feed"))
      .toDF("doc_id", "ts", "text", "source")
    var kept1: Seq[Long] = Seq.empty
    stage.processWith(b1, 1L) { s =>
      kept1 = s.select("doc_id").as[Long].collect().sorted.toSeq
    }
    assert(kept1 == Seq(4L))
  }

  test("interval parsing") {
    assert(CorpusPipeline.parseMs("10 minutes") == 600000L)
    assert(CorpusPipeline.parseMs("1 hour") == 3600000L)
    assert(CorpusPipeline.parseMs("500 milliseconds") == 500L)
  }

  test("fused minhashSig3 is value-identical to minhashSig(shingles3)") {
    // the stage (and the batch LSH queries) switched to the fused
    // expression for throughput; this pins that no signature — hence no
    // keep/drop decision — can differ from the composed form, across the
    // edge cases: <3 tokens (whole-doc shingle), consecutive/leading/
    // trailing spaces (empty tokens), unicode, empty string, null
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two", "single", "", "  ", "a  b c   d", " leading space",
      "trailing space ", "ünïcødé tøkens héré again",
      Seq.tabulate(200)(i => s"tok$i").mkString(" "), null
    )
    val df = texts.toDF("text")
    val both = df.select(
      graft.functions.TextFunctions.minhashSig(
        graft.functions.TextFunctions.shingles3(col("text")), 32).as("a"),
      graft.functions.TextFunctions.minhashSig3(col("text"), 32).as("b"))
      .as[(Option[Seq[Long]], Option[Seq[Long]])].collect()
    both.zip(texts).foreach { case ((a, b), t) =>
      assert(a == b, s"signature mismatch for ${Option(t).map(_.take(30))}")
    }
  }
}
