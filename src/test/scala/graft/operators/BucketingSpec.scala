package graft.operators

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** The property bucketing buys: a fact⋈fact equi-join with NO exchange on
  * either side, and results identical to the shuffle plan. */
class BucketingSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed orders⋈lineitem joins shuffle-free with identical results") {
    val l = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    Bucketing.writeBucketed(l, "li_b", "l_orderkey", buckets = 8)
    Bucketing.writeBucketed(o, "ord_b", "l_orderkey", buckets = 8)
    try {
      val joined = Bucketing.bucketedJoin(spark, "li_b", "ord_b", "l_orderkey")
      assert(Bucketing.isShuffleFree(joined),
        s"bucketed join still shuffles:\n${
          joined.queryExecution.executedPlan.toString().take(2000)}")
      // same rows as the plain (shuffling) join
      val plain = l.join(o, "l_orderkey")
      assert(joined.count() == plain.count())
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
      // groupBy on the bucket key also avoids the exchange
      val agg = spark.table("li_b").groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q"))
      assert(Bucketing.isShuffleFree(agg),
        "bucketed groupBy gained an exchange")
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
