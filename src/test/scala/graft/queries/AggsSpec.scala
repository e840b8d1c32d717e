package graft.queries

import graft.SparkSuite

/** Pins the non-oracled aggregate: HLL++ approx_count_distinct accuracy
  * (sketches differ across engines — no DuckDB hash-match possible). */
class AggsSpec extends SparkSuite {

  test("approx_count_distinct within configured rsd of exact") {
    import spark.implicits._
    val rows = Aggs.queries("q_agg_approx")(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, approx, exact) =>
      val err = math.abs(approx.toDouble - exact) / exact
      assert(err <= 0.05, s"flag=$flag approx=$approx exact=$exact err=$err")
    }
  }
}
