package graft.operators

import graft.SparkSuite

/** Property fuzz for the scoring-kernel ≡ join-path contract: random
  * texts over a hostile alphabet (multi-spaces, empty tokens, unicode,
  * long runs) must score identically through the in-row kernel and the
  * featurize → broadcast-join → aggregate path — the split semantics,
  * hash composition, and double-op order have no room to diverge. */
class QcFuzzSpec extends SparkSuite {

  test("kernel == join path on 300 adversarial random texts") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    val alphabet = Vector("a", "bb", "ccc", "é", "é", "zq",
      " ", "  ", "", "\u4e2d\u6587", "x y")
    val texts = (0 until 300).map { i =>
      (0 until rnd.nextInt(30))
        .map(_ => alphabet(rnd.nextInt(alphabet.size)))
        .mkString(" ")
    }
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, 0) }
      .toDF("doc_id", "text", "label")
    val buckets = 256
    // a nonzero model so divergence in any bucket is visible
    val feats = QualityClassifier.featurize(docs, buckets).cache()
    try {
      val model = QualityClassifier.train(feats, buckets, iters = 2, lr = 4.0)
      val joinPath = QualityClassifier.score(feats, model)
        .select("doc_id", "score_u").as[(Long, Long)].collect().toMap
      val kernel = QualityClassifier.scoreKernel(docs, model)
        .select("doc_id", "score_u").as[(Long, Long)].collect().toMap
      assert(kernel.size == 300 && kernel == joinPath)
    } finally feats.unpersist()
  }
}
