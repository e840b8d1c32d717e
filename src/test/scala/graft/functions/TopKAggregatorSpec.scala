package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import TopKAggregator.Scored

/** Typed top-k Aggregator equals the windowed row_number form. */
class TopKAggregatorSpec extends SparkSuite {

  test("per-group top-3 matches window row_number") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")

    // typed Aggregator path
    val agg = TopKAggregator.topK(3).toColumn
    val typed = orders
      .select(col("o_custkey"),
        struct(col("o_orderkey").as("id"), col("o_totalprice").as("score"))
          .as("s"))
      .as[(Long, Scored)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("top"))
      .flatMap { case (cust, top) => top.map(s => (cust, s.id, s.score)) }
      .collect().toSet

    // windowed reference
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)].collect().toSet

    assert(typed == windowed)
  }
}
