package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier
import graft.queries.Pipeline

/** Developer tool: learned-quality-filter scale sweep — training
  * seconds/iteration and scoring docs/s on a synthetic Zipf corpus
  * (ProfileBpe's lexicon/profile) with planted corruption labels.
  * `args`: [nDocs] [buckets] [iters].
  *
  * The claims this measures (PLANS round 9):
  *  - per-iteration cost is ONE pass over the cached feature frame
  *    (broadcast weights out, ≤B+1 gradient rows back) — iteration
  *    time should scale linearly in docs and be flat in iteration
  *    index;
  *  - held-out accuracy on the corruption task at every size (the
  *    planted ground truth scales with the corpus).
  */
object ProfileQuality {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-quality")
    val nDocs = args.headOption.map(_.toLong).getOrElse(100000L)
    val buckets = args.lift(1).map(_.toInt).getOrElse(1 << 16)
    val iters = args.lift(2).map(_.toInt).getOrElse(6)

    // partitions sized for the cached-pairs frame: ~8k docs/partition
    // keeps a task's pinned cache block + agg pages inside the local
    // heap share (see ProfileBpe.docs scaladoc)
    val parts = math.max(32, (nDocs / 8000L).toInt)
    val all = Pipeline.qualityLabeled(ProfileBpe.docs(spark, nDocs, parts))
    val isTest = pmod(xxhash64(lit(3), col("orig")), lit(5)) === 0

    val t0 = System.nanoTime()
    val feats = QualityClassifier
      .featurizePacked(all.filter(!isTest), buckets).persist()
    val nFeat = feats.count()
    val tFeat = (System.nanoTime() - t0) / 1e9
    println(f"[profile-quality] docs=$nDocs buckets=$buckets " +
      f"featurizePacked=${tFeat}%.1fs docRows=$nFeat")

    val tTrain0 = System.nanoTime()
    val wPrev = QualityClassifier.trainPacked(feats, buckets, iters, lr = 4.0)
    val tTrain = (System.nanoTime() - tTrain0) / 1e9
    println(f"[profile-quality] train ${iters} iters=${tTrain}%.1fs " +
      f"(${tTrain / iters}%.2fs/iter)")

    val tS0 = System.nanoTime()
    // scoring is the in-row kernel: map-only, no featurize, no shuffle
    val scored = QualityClassifier.scoreKernel(all.filter(isTest), wPrev)
      .select(col("label"), col("predicted"))
    val agg = scored.agg(
      count(lit(1)).as("n"),
      sum(when(col("label") === col("predicted"), 1L).otherwise(0L))
        .as("ok")).collect().head
    val tScore = (System.nanoTime() - tS0) / 1e9
    val n = agg.getLong(0)
    val acc = agg.getLong(1).toDouble / n
    println(f"[profile-quality] score $n docs in ${tScore}%.1fs " +
      f"(${n / tScore}%.0f docs/s) heldOutAcc=$acc%.4f")
    feats.unpersist()
    spark.stop()
  }
}
