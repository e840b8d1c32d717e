package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.Vectors

/** SemDeDup invariants vs the exact embedding near-dup ground truth:
  * precision is structural (every drop is justified by a real exact
  * pair), recall is measured and pinned. */
class SemDedupSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private val tau = 0.4

  private def embeddings = spark.read.parquet(s"$sf/embeddings.parquet")

  /** Exact brute-force near-dup pairs at tau (id_a < id_b). */
  private def exactPairs: Set[(Long, Long)] = {
    import spark.implicits._
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .filter(Vectors.dot(col("va"), col("vb")) >= tau)
      .select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSet
  }

  test("every drop is justified by an exact pair (precision 1.0); recall holds") {
    import spark.implicits._
    val out = SemDedup.semDedup(embeddings, k = 16, iters = 2, tau = tau,
      probes = 3)
      .as[(Long, Long, Boolean)].collect()
    val exact = exactPairs

    // precision: a dropped vector's representative must be a REAL exact
    // neighbor below it — SemDeDup may only drop true duplicates
    out.filter(!_._3).foreach { case (v, rep, _) =>
      assert(rep < v, s"rep $rep not below $v")
      assert(exact.contains((rep, v)),
        s"dropped $v against $rep, but they are not an exact pair")
    }

    // recall: of the vectors the exact greedy would drop (those with ANY
    // lower exact neighbor), how many did SemDeDup drop?
    val exactDropped = exact.map(_._2)
    val dropped = out.filter(!_._3).map(_._1).toSet
    assert(dropped.subsetOf(exactDropped))
    val recall = dropped.size.toDouble / math.max(exactDropped.size, 1)
    info(f"semdedup drop recall: ${dropped.size}/${exactDropped.size} = $recall%.3f")
    assert(recall >= 0.80,
      f"cluster-boundary recall collapsed: $recall%.3f " +
        s"(${dropped.size}/${exactDropped.size})")
  }

  test("rep/kept are consistent and output is deterministic") {
    import spark.implicits._
    val o1 = SemDedup.semDedup(embeddings, k = 16, iters = 2, tau = tau,
      probes = 3)
      .as[(Long, Long, Boolean)].collect().toSeq
    o1.foreach { case (v, rep, kept) =>
      assert(kept == (v == rep))
      assert(rep <= v)
    }
    assert(o1.map(_._1).distinct.size == o1.size, "one row per vector")
    val o2 = SemDedup.semDedup(embeddings, k = 16, iters = 2, tau = tau,
      probes = 3)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(o1 == o2)
  }
}
