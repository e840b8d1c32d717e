package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** GlobalWindow: the scale-safe global row_number/ntile must be VALUE-
  * identical to Spark's single-partition built-ins (the built-in is the
  * executable spec), and its plan must never contain the
  * Exchange-SinglePartition the built-in global window plans. */
class GlobalWindowSpec extends SparkSuite {

  import spark.implicits._

  // deliberately awkward sizes: 4 test shuffle partitions, counts that
  // don't divide evenly, duplicate sort values needing the tiebreaker
  private def corpus(n: Int) =
    (1 to n).map(i => (i.toLong, (i * 37 % 11).toLong))
      .toDF("id", "v")

  private val order = Seq(col("v").asc, col("id").asc)

  test("rowNumber matches the single-partition built-in") {
    for (n <- Seq(1, 5, 97)) {
      val df = corpus(n)
      val got = GlobalWindow.rowNumber(df, order, out = "rn")
        .select("id", "rn").as[(Long, Long)].collect().toMap
      val want = df.select(col("id"),
          row_number().over(Window.orderBy(order: _*)).as("rn"))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"n=$n")
    }
  }

  test("ntile matches the single-partition built-in, k dividing and not") {
    for (n <- Seq(1, 3, 97, 100); k <- Seq(1, 3, 4, 7)) {
      val df = corpus(n)
      val got = GlobalWindow.ntile(df, k, order, out = "t")
        .select("id", "t").as[(Long, Int)].collect().toMap
      val want = df.select(col("id"),
          ntile(k).over(Window.orderBy(order: _*)).as("t"))
        .as[(Long, Int)].collect().toMap
      assert(got == want, s"n=$n k=$k")
    }
  }

  test("n < k: every row is its own tile (DIV-by-zero branch unreached)") {
    val got = GlobalWindow.ntile(corpus(3), 8, order, out = "t")
      .select("id", "t").as[(Long, Int)].collect().toMap
    val want = corpus(3).select(col("id"),
        ntile(8).over(Window.orderBy(order: _*)).as("t"))
      .as[(Long, Int)].collect().toMap
    assert(got == want)
  }

  test("empty input yields an empty frame with the output column") {
    val out = GlobalWindow.ntile(corpus(0), 4, order, out = "t")
    assert(out.columns.contains("t"))
    assert(out.count() == 0L)
  }

  test("plan guard: no Exchange SinglePartition anywhere in the plan") {
    val df = GlobalWindow.ntile(corpus(97), 4, order, out = "t")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global ntile planned a single-partition exchange:\n$plan")
    // and the declared query keeps the same shape
    val q = graft.SparkEntry.queries("q_win_ntile")(
      spark, "/root/testdata/sf0.001")
    val qPlan = q.queryExecution.executedPlan.toString
    assert(!qPlan.contains("SinglePartition"),
      s"q_win_ntile planned a single-partition exchange:\n$qPlan")
  }
}
