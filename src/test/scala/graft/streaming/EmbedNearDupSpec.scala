package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSuite

/** Streaming embedding near-dup stage: semantic duplicates dropped
  * across micro-batches via IVF-cell claims with EXACT cosine verify —
  * SemDedup's decision rule under NearDupStage's registry/watermark
  * contract. */
class EmbedNearDupSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  // 4 orthogonal unit centroids — a fixed coarse model
  private val centroids: Array[Array[Float]] =
    Array.tabulate(4, 4)((i, j) => if (i == j) 1f else 0f)

  private def unit(xs: Double*): Seq[Float] = {
    val n = math.sqrt(xs.map(x => x * x).sum)
    xs.map(x => (x / n).toFloat)
  }

  private val alpha = unit(1, 0, 0, 0)
  private val alphaDup = unit(0.99, 0.141, 0, 0)    // cos ≈ 0.990
  private val alphaCellMate = unit(0.8, 0.6, 0, 0)  // same cell, cos 0.8
  private val beta = unit(0, 1, 0.1, 0)

  private def stageOn(dir: String) = EmbedNearDupStage(dir,
    watermarkMs = 10 * 60000L, centroids = centroids, tau = 0.9)

  test("semantic dups drop across batches; sub-tau cell mates survive") {
    import spark.implicits._
    val reg = Files.createTempDirectory("endr").toString + "/registry"
    val stage = stageOn(reg)

    // epoch 0: alpha, an IN-batch semantic dup of it, a doc sharing
    // alpha's cell but BELOW tau (must survive — a shared cell is only
    // a candidate, the exact dot is the decision), and a distinct doc
    val b0 = Seq(
      (1L, ts(0), alpha),
      (2L, ts(1), alphaDup),      // in-batch: cos 0.99 ≥ 0.9 → drop
      (3L, ts(2), alphaCellMate), // same cell, cos 0.8 < 0.9 → keep
      (4L, ts(3), beta))
      .toDF("doc_id", "ts", "embedding")
    assert(stage.process(b0, 0L).select("doc_id").as[Long].collect()
      .sorted.toSeq == Seq(1L, 3L, 4L))

    // epoch 1 (inside the watermark): cross-batch dup of alpha drops,
    // a fresh doc survives
    val b1 = Seq(
      (5L, ts(5), alphaDup),
      (6L, ts(6), unit(0, 0, 1, 0)))
      .toDF("doc_id", "ts", "embedding")
    assert(stage.process(b1, 1L).select("doc_id").as[Long].collect()
      .sorted.toSeq == Seq(6L))

    // epoch 2, far past the watermark: alpha's claim expired at the
    // horizon — the same embedding now survives (bounded state)
    val b2 = Seq((7L, ts(60), alphaDup))
      .toDF("doc_id", "ts", "embedding")
    assert(stage.process(b2, 2L).select("doc_id").as[Long].collect()
      .toSeq == Seq(7L))
  }

  test("epoch replay is idempotent: re-running a batch can't self-collide") {
    import spark.implicits._
    val reg = Files.createTempDirectory("endr-replay").toString + "/registry"
    val stage = stageOn(reg)
    val b0 = Seq((1L, ts(0), alpha), (2L, ts(1), beta))
      .toDF("doc_id", "ts", "embedding")
    assert(stage.process(b0, 0L).count() == 2)
    // crash-replay of the SAME epoch: mode=overwrite rewrites its own
    // claims; prior-epoch-only reads keep the batch from seeing itself
    assert(stage.process(b0, 0L).select("doc_id").as[Long].collect()
      .sorted.toSeq == Seq(1L, 2L))
  }

  test("dropped docs claim nothing: chains resolve greedy-by-id") {
    import spark.implicits._
    val reg = Files.createTempDirectory("endr-chain").toString + "/registry"
    val stage = stageOn(reg)
    // epoch 0 claims alpha
    assert(stage.process(Seq((1L, ts(0), alpha))
      .toDF("doc_id", "ts", "embedding"), 0L).count() == 1)
    // epoch 1: doc 2 drops against the registry (cross-batch); doc 3 is
    // a dup of DOC 2 but not of alpha — since dropped docs claim
    // nothing and don't suppress in-batch, doc 3's fate depends only on
    // doc 2's presence in the fresh set: doc 2 was cross-dropped, so
    // doc 3 survives iff it has no OTHER verified neighbor
    val nearAlpha = unit(0.99, 0.141, 0, 0)     // dup of alpha → drops
    val farFromAlpha = unit(0.6, 0.8, 0, 0)     // cos(alpha)=0.6 < tau
    val b1 = Seq((2L, ts(5), nearAlpha), (3L, ts(6), farFromAlpha))
      .toDF("doc_id", "ts", "embedding")
    assert(stage.process(b1, 1L).select("doc_id").as[Long].collect()
      .sorted.toSeq == Seq(3L))
  }

  test("end-to-end: streaming embed dedup lands survivors in parquet") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("endr-e2e").toString
    val in = MemoryStream[(Long, Timestamp, Seq[Float])](spark)
    in.addData(
      (1L, ts(0), alpha),
      (2L, ts(1), alphaDup),   // semantic dup → dropped
      (3L, ts(2), beta))
    val q = CorpusPipeline.startEmbedNearDup(
      in.toDF().toDF("doc_id", "ts", "embedding"),
      s"$dir/out", s"$dir/ckpt", s"$dir/registry",
      centroids = centroids, tau = 0.9,
      watermark = "10 minutes", trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$dir/out")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 3L))
  }

  test("compaction folds epochs without losing live claims") {
    import spark.implicits._
    val reg = Files.createTempDirectory("endr-compact").toString + "/registry"
    val stage = stageOn(reg)
    assert(stage.process(Seq((1L, ts(0), alpha))
      .toDF("doc_id", "ts", "embedding"), 0L).count() == 1)
    assert(stage.process(Seq((2L, ts(1), beta))
      .toDF("doc_id", "ts", "embedding"), 1L).count() == 1)
    stage.compact(spark)
    // alpha's claim survived the fold: a dup of it still drops
    assert(stage.process(Seq((3L, ts(2), alphaDup))
      .toDF("doc_id", "ts", "embedding"), 2L).count() == 0)
  }
}
