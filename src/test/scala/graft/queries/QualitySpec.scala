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
}
