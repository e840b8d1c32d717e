package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The shared banding helper's contract: candidates behave correctly at
  * EVERY legal band count (identical sets always collide, disjoint sets
  * never), and illegal (perms, bands) pairs fail at construction — the
  * silent-zero-recall failure mode a slice off-by-one or a rows=0
  * degenerate would produce is exactly what these guard. */
class LshSpec extends SparkSuite {

  test("identical sets collide at every banding; disjoint sets never") {
    import spark.implicits._
    val docs = Seq(
      (1L, Array("a", "b", "c", "d")),
      (2L, Array("a", "b", "c", "d")), // identical → must always pair
      (3L, Array("w", "x", "y", "z"))) // disjoint → must never pair
      .toDF("doc_id", "sset")
    for (b <- Seq(1, 2, 4, 8, 16, 32)) {
      val c = Lsh.bandCandidates(docs, b).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(c.contains((1L, 2L)), s"identical sets missed at bands=$b")
      assert(!c.exists(p => p._1 == 3L || p._2 == 3L),
        s"disjoint set paired at bands=$b")
    }
  }

  test("illegal (perms, bands) pairs fail at construction") {
    intercept[IllegalArgumentException](Lsh.bandHashesExpr(32, 5))
    intercept[IllegalArgumentException](Lsh.bandHashesExpr(32, 0))
    intercept[IllegalArgumentException](Lsh.bandHashesExpr(32, 64))
  }
}
