package graft.multimodal

import graft.SparkSuite
import Media._

/** Multimodal plumbing spec: schema, partition mapping, flatMap fan-out,
  * metadata pruning. The codec leaf is the documented stub. */
class MediaSpec extends SparkSuite {

  private def sampleMedia = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0L until 40L).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val payload = Array.fill((50 + rnd.nextInt(200)))(rnd.nextInt().toByte)
      MediaRow(i, kind, payload,
        MediaMeta(width = 100 + (i % 10).toInt * 50,
          height = 80 + (i % 7).toInt * 40,
          sampleRate = 16000, durationMs = 1000 * (i % 5)))
    }.toDS().repartition(4)
  }

  test("extractFeatures: fixed-width vectors, deterministic, distributed") {
    val feats = extractFeatures(sampleMedia, dim = 32).collect()
    assert(feats.length == 40)
    assert(feats.forall(_.features.length == 32))
    assert(feats.forall(_.dim == 32))
    // deterministic across runs (stub codec is pure in the payload)
    val again = extractFeatures(sampleMedia, dim = 32).collect()
    assert(feats.sortBy(_.media_id).map(_.features.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.features.toSeq).toSeq)
    // features bounded per the stub contract
    assert(feats.forall(_.features.forall(f => f >= -1.0f && f <= 1.0f)))
  }

  test("resizeImages filters kind and preserves ids") {
    import spark.implicits._
    val out = resizeImages(sampleMedia, 8, 8)
    val ids = out.select("media_id").as[Long].collect().sorted.toSeq
    assert(ids == (0L until 40L).filter(_ % 3 == 0))
    assert(out.select("resized").as[Array[Byte]].collect()
      .forall(b => b.length <= 64 && b.nonEmpty))
  }

  test("sampleFrames: one row per frame (flatMap fan-out)") {
    val frames = sampleFrames(sampleMedia, n = 4).collect()
    val videoIds = (0L until 40L).filter(_ % 3 == 2)
    assert(frames.length == videoIds.size * 4)
    assert(frames.groupBy(_.media_id).forall(_._2.map(_.frame_idx).sorted
      .toSeq == Seq(0, 1, 2, 3)))
  }

  test("extracted features flow into the similarity search path") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // decode → features → brute-force cosine top-k, the same operator
    // pipeline the text/embedding path uses (graft.functions.Vectors)
    val feats = extractFeatures(sampleMedia, dim = 16)
      .select(col("media_id"), col("features"))
    val q = feats.filter(col("media_id") === 0)
      .select(col("features").as("qvec"))
    val topk = feats.crossJoin(broadcast(q))
      .filter(col("media_id") =!= 0)
      .select(col("media_id"),
        graft.functions.Vectors.dot(col("features"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("media_id").asc)
      .limit(5)
      .as[(Long, Double)].collect()
    assert(topk.length == 5)
    assert(topk.map(_._2).toSeq == topk.map(_._2).sorted.reverse.toSeq)
  }

  test("metadata predicate prunes without touching payloads") {
    val df = sampleMedia.toDF()
    val big = selectLargeImages(df, minPixels = 100000)
    assert(big.count() > 0)
    // the predicate must reference only meta/kind — check the plan reads
    // as a pushable filter over the scan, not a post-decode filter
    val plan = big.queryExecution.optimizedPlan.toString()
    assert(plan.contains("meta") && !plan.toLowerCase.contains("mappartitions"))
  }
}
