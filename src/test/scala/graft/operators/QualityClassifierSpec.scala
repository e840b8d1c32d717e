package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The learned quality filter's two contracts:
  *  1. determinism — distributed full-batch GD is bit-identical to the
  *     classical single-threaded loop (trainLocal), under any
  *     partitioning, because every cross-row reduction is a long sum
  *     (the BPE/PageRank discipline applied to gradient descent);
  *  2. it learns — held-out accuracy on the planted corruption task
  *     (real docs vs suffix-corrupted twins) is pinned.
  */
class QualityClassifierSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private val buckets = 512

  private def labeled =
    graft.queries.Pipeline.qualityLabeled(
      spark.read.parquet(s"$sf/documents.parquet"))

  test("distributed training is bit-identical to the classical loop") {
    val feats = QualityClassifier.featurize(labeled, buckets).cache()
    try {
      val dist = QualityClassifier.train(feats, buckets, iters = 3, lr = 4.0)
      val local =
        QualityClassifier.trainLocal(feats, buckets, iters = 3, lr = 4.0)
      assert(dist.weightsU.sameElements(local.weightsU))
      assert(dist.weightsU.exists(_ != 0L), "training moved no weight")

      // partitioning invariance: a hostile layout (13 partitions keyed by
      // nothing) must not change a single fixed-point weight
      val scrambled = QualityClassifier
        .train(feats.repartition(13), buckets, iters = 3, lr = 4.0)
      assert(scrambled.weightsU.sameElements(dist.weightsU))
    } finally feats.unpersist()
  }

  test("packed path == exploded path: features as multisets, weights bit-for-bit") {
    import org.apache.spark.sql.functions.explode
    import spark.implicits._
    val all = labeled
    val exploded = QualityClassifier.featurize(all, buckets)
      .select("doc_id", "label", "len", "bucket", "cnt")
      .as[(Long, Int, Long, Int, Long)].collect().sorted.toSeq
    val packed = QualityClassifier.featurizePacked(all, buckets).cache()
    try {
      val unpacked = packed
        .select(col("doc_id"), col("label"), col("len"),
          explode(col("pairs")).as("p"))
        .select(col("doc_id"), col("label"), col("len"),
          col("p.bucket"), col("p.cnt"))
        .as[(Long, Int, Long, Int, Long)].collect().sorted.toSeq
      assert(unpacked == exploded, "packed featurize diverged")

      val viaPacked =
        QualityClassifier.trainPacked(packed, buckets, iters = 3, lr = 4.0)
      val feats = QualityClassifier.featurize(all, buckets).cache()
      val viaJoin =
        try QualityClassifier.train(feats, buckets, iters = 3, lr = 4.0)
        finally feats.unpersist()
      assert(viaPacked.weightsU.sameElements(viaJoin.weightsU))
    } finally packed.unpersist()
  }

  test("kernel scoring == join-path scoring bit-for-bit, incl. edge text") {
    import spark.implicits._
    val all = labeled
    val feats = QualityClassifier.featurize(all, buckets).cache()
    try {
      val model = QualityClassifier.train(feats, buckets, iters = 3, lr = 4.0)
      val joinPath = QualityClassifier.score(feats, model)
        .select("doc_id", "score_u").as[(Long, Long)].collect().toMap
      val kernel = QualityClassifier.scoreKernel(all, model)
        .select("doc_id", "score_u").as[(Long, Long)].collect().toMap
      assert(kernel == joinPath)

      // tokenization edge shapes: empty text, lone/multiple/trailing
      // spaces — split(" ", -1) semantics must agree between the paths
      val edges = Seq("", " ", "a", "a b", "a  b", "a b ", "  ", "a b  c ")
        .zipWithIndex.map { case (t, i) => (i.toLong, t, 0) }
        .toDF("doc_id", "text", "label")
      val ej = QualityClassifier
        .score(QualityClassifier.featurize(edges, buckets), model)
        .select("doc_id", "score_u").as[(Long, Long)].collect().toMap
      val ek = QualityClassifier.scoreKernel(edges, model)
        .select("doc_id", "score_u").as[(Long, Long)].collect().toMap
      assert(ek == ej, s"edge-shape divergence: $ek vs $ej")
    } finally feats.unpersist()
  }

  test("CLI train/score round-trips the model bit-for-bit end-to-end") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qc").toString
    val all = labeled.cache()
    all.filter(col("label") === 1).select("doc_id", "text")
      .write.parquet(s"$dir/pos")
    all.filter(col("label") === 0)
      .select((col("doc_id") - (1L << 40)).as("doc_id"), col("text"))
      .write.parquet(s"$dir/neg")
    graft.CliMain.main(Array("quality", "train", s"$dir/pos", s"$dir/neg",
      s"$dir/model", "--buckets", "512", "--iters", "3"))
    val back = QualityClassifier.load(spark, s"$dir/model")
    assert(back.buckets == 512 && back.weightsU.exists(_ != 0L))
    graft.CliMain.main(Array("quality", "score", s"$dir/pos",
      s"$dir/model", s"$dir/scored"))
    val scored = spark.read.parquet(s"$dir/scored")
    assert(scored.count() == all.filter(col("label") === 1).count())
    // positives trained against their corrupted twins score positive
    val accPos = scored.filter(col("predicted") === 1).count().toDouble /
      scored.count()
    info(s"CLI-scored positive rate on positives: $accPos")
    assert(accPos >= 0.9)
    all.unpersist()
  }

  test("held-out accuracy on the planted corruption task") {
    val all = labeled
    val isTest = pmod(xxhash64(lit(3), col("orig")), lit(5)) === 0
    val feats =
      QualityClassifier.featurize(all.filter(!isTest), buckets).cache()
    try {
      val model = QualityClassifier.train(feats, buckets, iters = 6, lr = 4.0)
      val scored = QualityClassifier
        .score(QualityClassifier.featurize(all.filter(isTest), buckets), model)
        .select(col("label"), col("predicted"), col("score_u"))
        .collect()
      assert(scored.nonEmpty)
      // predicted is definitionally the sign of the fixed-point score
      scored.foreach(r =>
        assert(r.getInt(1) == (if (r.getLong(2) > 0) 1 else 0)))
      val acc = scored.count(r => r.getInt(0) == r.getInt(1)).toDouble /
        scored.length
      info(s"held-out accuracy: $acc over ${scored.length} docs")
      assert(acc >= 0.9, s"accuracy $acc below pin")
    } finally feats.unpersist()
  }
}
