package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The Bloom decontamination contracts: membership is a strict superset
  * (zero false negatives — structural), the false-positive rate is at
  * the textbook epsilon, and the query's per-doc counts dominate the
  * exact q_contamination counts while agreeing almost everywhere. */
class BloomSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private val mBits = 1L << 16
  private val k = 4

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  private def benchGrams = {
    import graft.queries.Pipeline
    docs.filter(col("doc_id") < 20)
      .select(explode(Pipeline.bigrams).as("bigram")).distinct()
  }

  test("zero false negatives: every inserted gram passes the filter") {
    val bench = benchGrams.cache()
    try {
      val filt = Bloom.build(bench, "bigram", mBits, k)
      val n = bench.count()
      val passed = Bloom.mightContain(filt, bench, "bigram", mBits, k).count()
      assert(passed == n, s"$passed of $n inserted grams passed")
    } finally bench.unpersist()
  }

  test("false-positive rate is at the textbook epsilon") {
    val bench = benchGrams.cache()
    try {
      val filt = Bloom.build(bench, "bigram", mBits, k).cache()
      val n = bench.count()
      // 20k probe strings disjoint from any real bigram by construction
      val absent = spark.range(20000)
        .select(concat(lit("absent-"), col("id")).as("bigram"))
      val fps = Bloom.mightContain(filt, absent, "bigram", mBits, k).count()
      val eps = math.pow(1.0 - math.exp(-k.toDouble * n / mBits), k)
      val rate = fps.toDouble / 20000
      info(s"n=$n eps=$eps measured=$rate")
      // 3x + additive slack: 20k probes put ~sqrt(20000*eps) of noise on
      // the estimate; the pin is "right order of magnitude", the
      // zero-false-negative test above is the hard guarantee
      assert(rate <= 3 * eps + 0.001, s"FP rate $rate vs eps $eps")
    } finally { bench.unpersist() }
  }

  test("save/load round-trips the filter bit-for-bit") {
    import spark.implicits._
    val bench = benchGrams
    val filt = Bloom.build(bench, "bigram", mBits, k)
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    Bloom.save(filt, dir)
    val back = Bloom.load(spark, dir)
    assert(back.as[(Long, Long)].collect().sortBy(_._1).toSeq ==
      filt.as[(Long, Long)].collect().sortBy(_._1).toSeq)
  }

  test("per-doc counts dominate the exact contamination counts") {
    import spark.implicits._
    val qs = graft.queries.Pipeline.queries
    val exact = qs("q_contamination")(spark, sf)
      .as[(Long, Long)].collect().toMap
    val bloom = qs("q_contamination_bloom")(spark, sf)
      .as[(Long, Long)].collect().toMap
    // superset: every exactly-contaminated doc is flagged at >= its count
    exact.foreach { case (doc, cnt) =>
      assert(bloom.getOrElse(doc, 0L) >= cnt,
        s"doc $doc: bloom ${bloom.get(doc)} < exact $cnt")
    }
    // and the FP inflation is small: total flagged within 5% + 5 grams
    val exTot = exact.values.sum
    val blTot = bloom.values.sum
    info(s"exact total=$exTot bloom total=$blTot")
    assert(blTot <= exTot * 1.05 + 5, s"bloom $blTot vs exact $exTot")
  }
}
