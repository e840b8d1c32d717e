package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Count-min sketch guarantees, pinned against exact counts: estimates
  * never undercount, the ε·N bound holds, and shard sketches merge to
  * the whole-corpus sketch (the property that makes it distributable). */
class SketchSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private val D = 4
  private val W = 1024

  private def tokens = spark.read.parquet(s"$sf/documents.parquet")
    .select(explode(split(col("text"), " ")).as("token"))

  test("estimates overcount only, within the eps*N bound") {
    import spark.implicits._
    val exact = tokens.groupBy("token").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val sketch = Sketch.countMin(tokens, "token", D, W)
    val est = Sketch.estimate(sketch, tokens.distinct(), "token", D, W)
      .as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet)
    val epsN = math.ceil(math.E / W * n).toLong
    est.foreach { case (t, e) =>
      assert(e >= exact(t), s"CMS undercounted '$t': $e < ${exact(t)}")
      assert(e - exact(t) <= epsN,
        s"'$t' overcount ${e - exact(t)} beyond eps*N = $epsN")
    }
  }

  test("shard sketches merge bucketwise to the whole-corpus sketch") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def tok(f: org.apache.spark.sql.DataFrame) =
      f.select(explode(split(col("text"), " ")).as("token"))
    val sA = Sketch.countMin(tok(docs.filter(col("doc_id") % 2 === 0)),
      "token", D, W)
    val sB = Sketch.countMin(tok(docs.filter(col("doc_id") % 2 === 1)),
      "token", D, W)
    val merged = sA.union(sB).groupBy("r", "bucket")
      .agg(sum("c").as("c"))
      .as[(Int, Long, Long)].collect().toSet
    val whole = Sketch.countMin(tokens, "token", D, W)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("the sketch is bounded by d*w rows however large the input") {
    val sketch = Sketch.countMin(tokens, "token", D, W)
    assert(sketch.count() <= D.toLong * W)
  }
}
