package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** span_hashes contract: the O(1)-per-window rolling recurrence equals
  * the direct polynomial evaluated from scratch per window (the
  * subtraction of the leading term is where an arithmetic slip would
  * silently corrupt every later window), plus shape edge cases. */
class SpanHashesSpec extends SparkSuite {

  private val B = 1099511628211L

  private def xx(s: String): Long =
    MinHashSignature.hash64(org.apache.spark.unsafe.types.UTF8String
      .fromString(s))

  private def direct(tokens: Seq[String], n: Int): Seq[Long] =
    tokens.map(xx).sliding(n).map(_.foldLeft(0L)((w, h) => w * B + h)).toSeq

  test("rolling recurrence equals the from-scratch polynomial") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0 until 50).map { i =>
      (i.toLong, Array.fill(3 + rnd.nextInt(40))(s"t${rnd.nextInt(20)}"))
    }
    val got = docs.toDF("doc_id", "ts")
      .select(col("doc_id"), TextFunctions.spanHashes(col("ts"), 8).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    docs.foreach { case (id, ts) =>
      val expect =
        if (ts.length < 8) Seq.empty[Long] else direct(ts.toSeq, 8)
      assert(got(id) == expect, s"doc $id (${ts.length} tokens)")
    }
  }

  test("short inputs yield no spans; equal spans collide across docs") {
    import spark.implicits._
    val df = Seq(
      (1L, Array("a", "b", "c")),                     // < n → empty
      (2L, Array("x", "y", "z", "w", "a", "b")),
      (3L, Array("q", "x", "y", "z", "w", "a", "b"))) // shares a 5-span
      .toDF("doc_id", "ts")
      .select(col("doc_id"), explode(
        TextFunctions.spanHashes(col("ts"), 5)).as("h"))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!rows.exists(_._1 == 1L))
    val h2 = rows.filter(_._1 == 2L).map(_._2).toSet
    val h3 = rows.filter(_._1 == 3L).map(_._2).toSet
    assert(h2.intersect(h3).nonEmpty, "shared span did not collide")
  }
}
