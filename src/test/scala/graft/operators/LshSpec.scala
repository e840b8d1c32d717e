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

  // --- sweep regression guards (PLANS.md round-6 5M-doc sweep; verdict
  // r6 task 6), at spec scale on the shared planted boiler fixture.

  test("sweep guard: 16×2 banding goes quadratic on boilerplate; " +
      "8×4 stays bounded and keeps the planted recall") {
    // The sweep's boiler-1M cell at 16 bands × 2 rows DIED (>79 GB
    // spill, ~10¹¹ candidates): narrow rows drop the collision floor
    // below the boilerplate background similarity and the naive
    // quadratic is reborn through the banding. 8×4's floor sits above
    // the background, so its candidates stay near the planted pairs.
    // Deterministic: minhash is xxhash-seeded — these counts are
    // constants of the fixture.
    val n = 200
    val docs = BoilerCorpus.planted(spark, n).localCheckpoint()
    val c8 = Lsh.bandCandidates(docs, 8).count()
    val c16 = Lsh.bandCandidates(docs, 16).count()
    val allPairs = n.toLong * (n - 1) / 2
    assert(c16 >= allPairs / 10,
      s"16×2 lost its boiler-blindness signature: $c16 of $allPairs — " +
        "if banding changed, re-measure the sweep before relaxing this")
    assert(c16 >= 10 * c8,
      s"candidate blowup 8×4→16×2 vanished: $c8 → $c16")
    assert(c8 <= 5L * n,
      s"8×4 candidates no longer bounded near the planted pairs: $c8")
    // recall floor: well-above-threshold planted dups (J ≈ 0.82) must
    // collide at 8×4 (sweep: 99.2% recall on clean corpora)
    val pairs8 = Lsh.bandCandidates(docs, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = BoilerCorpus.plantedPairs(n)
    val recall = (planted & pairs8).size.toDouble / planted.size
    assert(recall >= 0.95,
      s"8×4 recall on J≈0.82 planted dups fell to $recall")
  }

  test("sweep guard: band self-join stays SHUFFLE_HASH under AQE") {
    // same promotion hazard as ppjoin's joins: the band table is
    // corpus-scaled delta-compressing longs — exactly what AQE's
    // compressed-bytes estimate mis-sizes. Assert on the FINAL adaptive
    // plan (post-execution), where promotion would have happened.
    val docs = BoilerCorpus.planted(spark, 200).localCheckpoint()
    val df = Lsh.bandCandidates(docs, 8)
    df.count()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("ShuffledHashJoin"),
      s"band self-join lost its SHUFFLE_HASH pin:\n${plan.take(2000)}")
    assert(!plan.contains("BroadcastHashJoin"),
      s"AQE promoted the band table to broadcast:\n${plan.take(2000)}")
  }
}
