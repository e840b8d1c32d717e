package graft.queries

import graft.SparkSuite

/** Semantics pins for the quality family beyond the oracle hash-match. */
class QualitySpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("quality_normalize: CDF laws per source") {
    import spark.implicits._
    val rows = Quality.queries("q_quality_normalize")(spark, sf)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    // a percentile is a fraction of the source in micro-units
    assert(rows.forall(r => r._4 >= 0L && r._4 <= 1000000L))
    rows.groupBy(_._2).foreach { case (src, g) =>
      // the source's minimum length ranks 0
      val minLen = g.map(_._3).min
      assert(g.filter(_._3 == minLen).forall(_._4 == 0L), src)
      // monotone: longer docs never rank below shorter ones, ties share
      val byLen = g.groupBy(_._3).view.mapValues(_.map(_._4).distinct).toMap
      byLen.values.foreach(prs => assert(prs.size == 1, s"$src tie split"))
      val ordered = byLen.toSeq.sortBy(_._1).map(_._2.head)
      assert(ordered == ordered.sorted, s"$src not monotone")
      // the max length's rank is (n - ties_at_max)/(n-1) ≤ 1e6 and,
      // with a unique max, exactly 1e6
      val maxLen = g.map(_._3).max
      if (g.count(_._3 == maxLen) == 1 && g.size > 1)
        assert(g.find(_._3 == maxLen).get._4 == 1000000L, src)
    }
    // cross-source comparability: every source uses the full scale
    // direction (its own min at 0), regardless of raw length ranges
    assert(rows.groupBy(_._2).forall(_._2.exists(_._4 == 0L)))
  }

  test("calibJoin: wide CDF frames route to shuffle-hash, narrow broadcast") {
    import org.apache.spark.sql.functions._
    // ~60k distinct bins (continuous signal, pre-quantized per the join
    // contract) with the ceiling forced low → the broadcast would be
    // the 100 TB hazard (2^20 bins × sources), so the join must route
    // SHUFFLE_HASH with the value frame as the build side
    val docs = spark.range(0, 60000, 1, 8)
      .select(col("id").as("doc_id"),
        concat(lit("src"), pmod(col("id"), lit(3))).as("source"),
        Quality.cdfBin(pmod(xxhash64(col("id")), lit(500000L)))
          .as("score"))
    val wide = Quality.calibJoin(docs, signal = "score",
      broadcastRows = 1000L)
    assert(wide.count() == 60000L) // row-preserving either way
    val widePlan = wide.queryExecution.executedPlan.toString()
    assert(widePlan.contains("ShuffledHashJoin"),
      s"wide calibration frame lost its SHJ route:\n${widePlan.take(2000)}")
    // a coarse signal (~50 bins) stays on the broadcast path
    val coarse = docs.withColumn("score",
      Quality.cdfBin(pmod(col("doc_id"), lit(50))))
    val narrow = Quality.calibJoin(coarse, signal = "score")
    assert(narrow.count() == 60000L)
    assert(narrow.queryExecution.executedPlan.toString()
      .contains("BroadcastHashJoin"), "narrow frame stopped broadcasting")
  }

  test("sourceCdf: value frame bounded for CONTINUOUS signals (r14)") {
    import org.apache.spark.sql.functions._
    // a continuous double score: ~every row a distinct raw value, range
    // far beyond the bin cap and dipping below 0 — the 100 TB shape
    // that collapsed the unquantized broadcast (VERDICT r13 #1)
    val docs = spark.range(0, 60000, 1, 8)
      .select(col("id").as("doc_id"),
        concat(lit("src"), pmod(col("id"), lit(3))).as("source"),
        ((pmod(xxhash64(col("id")), lit(3000000L)) - lit(100000L))
          .cast("double") * lit(1.000001)).as("score"))
    val cdf = Quality.sourceCdf(docs, signal = "score").cache()
    val perSrc = cdf.groupBy("source")
      .agg(count(lit(1)).as("n"), min("score").as("lo"),
        max("score").as("hi"), max("n_src").as("n_src"))
      .collect()
    perSrc.foreach { r =>
      // the bound BY CONSTRUCTION: ≤ CdfBins value rows per source,
      // every bin inside [0, CdfBins)
      assert(r.getAs[Long]("n") <= Quality.CdfBins, r.toString)
      assert(r.getAs[Long]("lo") >= 0L, r.toString)
      assert(r.getAs[Long]("hi") < Quality.CdfBins, r.toString)
      // every doc of the source is accounted for in the CDF mass
      assert(r.getAs[Long]("n_src") == 20000L, r.toString)
    }
    // quantization actually compressed: raw values are ~all distinct,
    // the clamp folds everything ≥ cap into one bin per source
    val rawDistinct = docs.select("score").distinct().count()
    val binDistinct = cdf.select("score").distinct().count()
    assert(rawDistinct > 2 * binDistinct,
      s"quantizer stopped compressing: raw=$rawDistinct bins=$binDistinct")
    // CDF law survives quantization: below is strictly monotone in the
    // bin within each source and below + own-bin mass ≤ n_src
    cdf.collect().groupBy(_.getAs[String]("source")).foreach {
      case (src, g) =>
        val ordered = g.sortBy(_.getAs[Long]("score"))
          .map(_.getAs[Long]("below")).toSeq
        assert(ordered == ordered.sorted && ordered.distinct == ordered,
          s"$src below not strictly monotone")
    }
    cdf.unpersist()
  }
}
