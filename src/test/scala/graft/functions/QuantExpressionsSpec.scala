package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Kernel-level guards for the quantization expressions: the interpreted
  * eval path (codegen fallback) must agree with the codegen path, and
  * the documented tie/ordering contracts hold on constructed inputs. */
class QuantExpressionsSpec extends SparkSuite {

  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType}

  private def litF(xs: Seq[Float]) = Literal.create(xs, ArrayType(FloatType))

  test("PqCodes: interpreted eval equals the codegen'd column result") {
    import spark.implicits._
    // 2 subspaces of 2 dims, 2 codewords each: cb[m][k][sub] flat
    val cb = Array[Float](
      0f, 0f, /* m0 k0 */ 1f, 1f, /* m0 k1 */
      5f, 5f, /* m1 k0 */ 9f, 9f /* m1 k1 */)
    val df = Seq(
      (1L, Seq(0.1f, 0.1f, 8.9f, 9.2f)), // → codes (0, 1)
      (2L, Seq(0.9f, 1.1f, 5.1f, 4.9f))  // → codes (1, 0)
    ).toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
      QuantExpressions.pqCodes(col("embedding"), cb, m = 2, k = 2, sub = 2)
        .as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got(1L) == Seq(0, 1) && got(2L) == Seq(1, 0))

    // interpreted path (what a CodegenFallback consumer would run)
    val expr = PqCodes(litF(Seq(0.1f, 0.1f, 8.9f, 9.2f)), cb, 2, 2, 2)
    val arr = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(arr.toIntArray().toSeq == Seq(0, 1))
  }

  test("PqCodes: equal distances pick the lower codeword id") {
    // both codewords identical → every distance ties → code 0
    val cb = Array[Float](3f, 3f, 3f, 3f)
    val expr = PqCodes(litF(Seq(1f, 2f)), cb, m = 1, k = 2, sub = 2)
    val arr = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(arr.toIntArray().toSeq == Seq(0))
  }

  test("NearestCells: descending-dot order, interpreted == codegen") {
    import spark.implicits._
    // 3 cells in 2-d: dots with (1,0) are 1.0, 0.0, 0.5
    val cents = Array[Float](1f, 0f, 0f, 1f, 0.5f, 0.5f)
    val df = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val got = df.select(
      QuantExpressions.nearestCells(col("embedding"), cents, k = 3, dim = 2,
        p = 2).as("cells"))
      .as[Seq[Int]].head()
    assert(got == Seq(0, 2), s"expected cells (0, 2) by dot, got $got")
    val expr = NearestCells(litF(Seq(1f, 0f)), cents, 3, 2, 2)
    val arr = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(arr.toIntArray().toSeq == Seq(0, 2))
  }

  test("AdcScore sums the looked-up table cells; interpreted == codegen") {
    import spark.implicits._
    val df = Seq((Seq(1, 0), Seq(Seq(10.0, 20.0), Seq(30.0, 40.0))))
      .toDF("codes", "tbl")
    val viaCol = df.select(
      QuantExpressions.adcScore(col("codes"), col("tbl")).as("s"))
      .as[Double].head()
    assert(viaCol == 50.0) // tbl[0][1] + tbl[1][0] = 20 + 30
    val expr = AdcScore(
      Literal.create(Seq(1, 0), ArrayType(IntegerType)),
      Literal.create(Seq(Seq(10.0, 20.0), Seq(30.0, 40.0)),
        ArrayType(ArrayType(DoubleType))))
    assert(expr.eval(null) == 50.0)
  }
}
