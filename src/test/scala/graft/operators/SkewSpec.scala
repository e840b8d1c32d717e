package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Salted aggregation correctness: results equal the direct (unsalted)
  * aggregation on a skewed key distribution. */
class SkewSpec extends SparkSuite {

  private def skewed = {
    import spark.implicits._
    // hot key 0 holds 90% of rows
    (0 until 20000).map { i =>
      val k = if (i % 10 != 0) 0L else (i % 97).toLong
      (k, i.toLong)
    }.toDF("user_id", "v").repartition(8)
  }

  test("saltedAgg equals direct aggregation") {
    import spark.implicits._
    val direct = skewed.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        min("v").as("mn"), max("v").as("mx"))
      .orderBy("user_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val salted = Skew.saltedAgg(skewed, col("user_id"), saltBuckets = 16,
        Seq("n" -> Skew.CountRows(), "s" -> Skew.SumOf(col("v")),
          "mn" -> Skew.MinOf(col("v")), "mx" -> Skew.MaxOf(col("v"))))
      .orderBy("key")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(salted == direct)
  }

  test("saltedTopK equals direct window top-k") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("v").desc, col("user_id").asc)
    val direct = skewed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .orderBy("user_id", "v")
      .as[(Long, Long)].collect().toSeq
    val salted = Skew.saltedTopK(skewed, col("user_id"),
        col("v").desc, k = 3, saltBuckets = 8)
      .orderBy("user_id", "v")
      .as[(Long, Long)].collect().toSeq
    assert(salted == direct)
  }
  test("exact-duplicate hot-key rows spread across salt buckets") {
    import spark.implicits._
    // 512 IDENTICAL rows: a row-content-only salt would put them all in
    // one bucket, degenerating the mitigation for its target workload
    val dup = Seq.fill(512)((0L, 7L)).toDF("user_id", "v").repartition(8)
    val n = dup.select(Skew.saltOf(dup, 16).as("s")).distinct().count()
    assert(n > 1, s"expected duplicates spread over >1 salt bucket, got $n")
    // and the aggregate over pure duplicates is still exact
    val agg = Skew.saltedAgg(dup, col("user_id"), 16,
        Seq("n" -> Skew.CountRows(), "sum_v" -> Skew.SumOf(col("v"))))
      .as[(Long, Long, Long)].collect().toSeq
    assert(agg == Seq((0L, 512L, 512L * 7L)))
  }

}
