package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming corpus ingestion: quality filter → watermarked exact dedup →
  * chunking → parquet, end-to-end off a MemoryStream. */
class CorpusPipelineSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def longText(seed: String): String =
    (1 to 100).map(i => s"$seed$i").mkString(" ") // 100 tokens -> 3 chunks

  test("filters, dedups within watermark, chunks, and lands in parquet") {
    import spark.implicits._
    val root = Files.createTempDirectory("corpus-out").toString
    val ckpt = Files.createTempDirectory("corpus-ckpt").toString
    val in = MemoryStream[(Long, Timestamp, String, String)](spark)
    // MemoryStream: data BEFORE start
    in.addData(
      (1L, ts(0), longText("alpha"), "crawl"),   // kept: 3 chunks
      (2L, ts(1), longText("alpha"), "crawl"),   // exact dup of 1 -> dropped
      (3L, ts(2), "tiny", "crawl"),              // quality: too short
      (4L, ts(3), "dup dup dup dup dup dup dup dup", "crawl"), // repetitive
      (5L, ts(4), longText("beta"), "feed")      // kept: 3 chunks
    )
    val q = CorpusPipeline.start(
      in.toDF().toDF("doc_id", "ts", "text", "source"),
      root, ckpt, watermark = "10 minutes",
      trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)
    val out = spark.read.parquet(root)
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Long, String)].collect().toSeq.sortBy(r => (r._1, r._2))
    // 100 tokens / stride 48: starts 1, 49, 97 -> 3 chunks per kept doc
    assert(out.map(_._1).distinct == Seq(1L, 5L))
    assert(out.count(_._1 == 1L) == 3 && out.count(_._1 == 5L) == 3)
    // chunk 1 is the full 64-token window; chunk 3 the 4-token tail
    val c1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3.split(" ").length)
    assert(c1 == Seq(64, 52, 4))
    // doc 2 (the in-watermark duplicate) is gone
    assert(!out.exists(_._1 == 2L))
  }

  test("learned quality gate drops low-scoring docs before dedup state") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // offline model on the planted corruption task (the q_quality_
    // classifier construction), then streamed docs gate on its score
    val labeled = graft.queries.Pipeline.qualityLabeled(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val feats = graft.operators.QualityClassifier.featurize(labeled, 512)
      .cache()
    val model =
      graft.operators.QualityClassifier.train(feats, 512, iters = 6, lr = 4.0)
    feats.unpersist()

    val root = Files.createTempDirectory("qgate-out").toString
    val ckpt = Files.createTempDirectory("qgate-ckpt").toString
    val in = MemoryStream[(Long, Timestamp, String, String)](spark)
    val clean = longText("alpha") // vocabulary unseen -> near-zero score…
    // …so gate at the corpus's own positive/corrupted separating margin:
    // use two REAL docs, one original and one corrupted twin
    val pair = labeled.filter(col("orig") === 7)
      .select("doc_id", "label", "text").collect()
    val posText = pair.find(_.getInt(1) == 1).get.getString(2)
    val negText = pair.find(_.getInt(1) == 0).get.getString(2)
    in.addData((1L, ts(0), posText, "crawl"), (2L, ts(1), negText, "crawl"),
      (3L, ts(2), clean, "crawl"))
    val q = CorpusPipeline.start(
      in.toDF().toDF("doc_id", "ts", "text", "source"),
      root, ckpt, watermark = "10 minutes",
      trigger = Trigger.AvailableNow(),
      qualityModel = Some((model, 0L)))
    q.awaitTermination(120000)
    val kept = spark.read.parquet(root).select("doc_id")
      .as[Long].collect().toSet
    assert(kept.contains(1L), "real doc dropped by the gate")
    assert(!kept.contains(2L), "corrupted twin passed the gate")
  }

  test("cascade-over-stream: streamed near-dup survivors re-cluster " +
      "identically to the direct survivor corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("cos-out").toString
    val docsRoot = Files.createTempDirectory("cos-docs").toString
    val ckpt = Files.createTempDirectory("cos-ckpt").toString
    val reg = Files.createTempDirectory("cos-reg").toString + "/registry"

    // three epochs of traffic with near-dups WITHIN and ACROSS epochs:
    //  epoch 0: 1 (alpha), 2 (near-dup of alpha) -> 2 drops in-batch
    //  epoch 1: 3 (beta), 4 (near-dup of ALPHA)  -> 4 drops cross-batch
    //  epoch 2: 5 (gamma), 6 (near-dup of beta), 7 (delta cluster seed),
    //           8 (near-dup of delta)            -> 6, 8 drop
    def nearDup(t: String): String = {
      val w = t.split(" "); w(50) = "CHANGED"; w.mkString(" ")
    }
    val alpha = longText("alpha"); val beta = longText("beta")
    val gamma = longText("gamma"); val delta = longText("delta")
    val epochs = Seq(
      Seq((1L, ts(0), alpha, "crawl"), (2L, ts(1), nearDup(alpha), "crawl")),
      Seq((3L, ts(2), beta, "feed"), (4L, ts(3), nearDup(alpha), "feed")),
      Seq((5L, ts(4), gamma, "crawl"), (6L, ts(5), nearDup(beta), "crawl"),
        (7L, ts(6), delta, "feed"), (8L, ts(7), nearDup(delta), "feed")))
    val in = MemoryStream[(Long, Timestamp, String, String)](spark)
    for (batch <- epochs) {
      in.addData(batch: _*)
      val q = CorpusPipeline.startNearDup(
        in.toDF().toDF("doc_id", "ts", "text", "source"),
        root, ckpt, reg, watermark = "10 minutes",
        trigger = Trigger.AvailableNow(), docsRoot = Some(docsRoot))
      q.awaitTermination(120000)
    }

    // the streamed survivor corpus is exactly input minus the dropped docs
    val survivors = spark.read.parquet(docsRoot)
    val keptIds = survivors.select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptIds == Seq(1L, 3L, 5L, 7L))

    // periodic re-clustering: the batch LSH cascade runs over the
    // PARQUET survivor corpus the stream produced...
    val streamed = graft.queries.Llm.lshCascade(survivors)
      .as[(Long, Long)].collect().toSeq.sorted
    // ...and must agree with the same cascade over the direct in-memory
    // survivor frame (full input semi-joined to the stage's keeps) —
    // pinning that the epoch-dir parquet round-trip, the chunk-free doc
    // sink, and replay overwrites neither lose nor duplicate anything
    // the cascade sees
    val full = epochs.flatten.toDF("doc_id", "ts", "text", "source")
    val direct = graft.queries.Llm.lshCascade(
      full.join(survivors.select("doc_id"), Seq("doc_id"), "left_semi"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(streamed == direct)
    // survivors are mutually non-near-dup, so every cluster is a singleton
    assert(streamed == Seq((1L, 1L), (3L, 3L), (5L, 5L), (7L, 7L)))

    // the chunked training sink saw the same docs
    val chunkIds = spark.read.parquet(root).select("doc_id")
      .distinct().as[Long].collect().sorted.toSeq
    assert(chunkIds == keptIds)
  }

  test("bag dedup collapses token-permuted duplicates exact dedup keeps") {
    import spark.implicits._
    val root = Files.createTempDirectory("corpus-bag").toString
    val ckpt = Files.createTempDirectory("corpus-bag-ckpt").toString
    val text = longText("gamma")
    val permuted = text.split(" ").reverse.mkString(" ")
    val in = MemoryStream[(Long, Timestamp, String, String)](spark)
    in.addData(
      (1L, ts(0), text, "crawl"),
      (2L, ts(1), permuted, "crawl"),           // same bag, different order
      (3L, ts(2), longText("delta"), "crawl"))  // different bag
    val q = CorpusPipeline.start(
      in.toDF().toDF("doc_id", "ts", "text", "source"),
      root, ckpt, watermark = "10 minutes",
      trigger = Trigger.AvailableNow(), bagDedup = true)
    q.awaitTermination(120000)
    val kept = spark.read.parquet(root).select("doc_id").distinct()
      .as[Long].collect().sorted.toSeq
    // the permuted copy deduped away; the distinct bag survives
    assert(kept == Seq(1L, 3L))
  }

  test("tokenizer stage: streamed chunk ids equal the batch encode") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("corpus-tok").toString
    val ckpt = Files.createTempDirectory("corpus-tok-ckpt").toString
    // train the model OFFLINE on a small corpus (the production shape:
    // the stream applies a frozen vocabulary, never re-trains)
    val trainDocs = Seq(
      (0L, longText("alpha")), (1L, longText("beta")))
      .toDF("doc_id", "text")
    val merges = graft.operators.Bpe.train(trainDocs, nMerges = 20)
    val model = graft.operators.Bpe.rankModel(merges, trainDocs)
    val in = MemoryStream[(Long, Timestamp, String, String)](spark)
    in.addData(
      (1L, ts(0), longText("alpha"), "crawl"),
      (2L, ts(1), longText("beta"), "feed"))
    val q = CorpusPipeline.start(
      in.toDF().toDF("doc_id", "ts", "text", "source"),
      root, ckpt, watermark = "10 minutes",
      trigger = Trigger.AvailableNow(), tokenizer = Some(model))
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(root)
      .select("doc_id", "chunk_id", "chunk_text", "ids")
      .as[(Long, Long, String, Seq[Int])].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(streamed.nonEmpty && streamed.forall(_._4.nonEmpty))
    // the streamed ids are exactly the batch kernel's encode of the
    // same chunk text — one tokenizer, two execution modes
    val batch = graft.operators.Bpe.encodeIds(
      streamed.map(r => (r._1 * 1000 + r._2, r._3))
        .toDF("doc_id", "text"), model)
      .as[(Long, Seq[Int])].collect().toMap
    streamed.foreach { case (d, c, _, ids) =>
      assert(ids == batch(d * 1000 + c), s"doc $d chunk $c ids diverge")
    }
  }

  test("unigram tokenizer drops into the same stage (RowTokenizer)") {
    import spark.implicits._
    val root = Files.createTempDirectory("corpus-uni").toString
    val ckpt = Files.createTempDirectory("corpus-uni-ckpt").toString
    val trainDocs = Seq(
      (0L, longText("alpha")), (1L, longText("beta")))
      .toDF("doc_id", "text")
    val model = graft.operators.Unigram.modelOf(
      graft.operators.Unigram.train(trainDocs, vocabSize = 60,
        maxPieceLen = 4, seedSize = 120))
    val in = MemoryStream[(Long, Timestamp, String, String)](spark)
    in.addData(
      (1L, ts(0), longText("alpha"), "crawl"),
      (2L, ts(1), longText("beta"), "feed"))
    val q = CorpusPipeline.start(
      in.toDF().toDF("doc_id", "ts", "text", "source"),
      root, ckpt, watermark = "10 minutes",
      trigger = Trigger.AvailableNow(), tokenizer = Some(model))
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(root)
      .select("doc_id", "chunk_id", "chunk_text", "ids")
      .as[(Long, Long, String, Seq[Int])].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(streamed.nonEmpty && streamed.forall(_._4.nonEmpty))
    val batch = graft.operators.Unigram.encodeIds(
      streamed.map(r => (r._1 * 1000 + r._2, r._3))
        .toDF("doc_id", "text"), model)
      .as[(Long, Seq[Int])].collect().toMap
    streamed.foreach { case (d, c, _, ids) =>
      assert(ids == batch(d * 1000 + c), s"doc $d chunk $c ids diverge")
    }
  }
}
