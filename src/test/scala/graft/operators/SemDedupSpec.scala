package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.Vectors

/** SemDeDup invariants vs the exact embedding near-dup ground truth:
  * precision is structural (every claimed group refines an exact
  * cluster), recall is measured and pinned. */
class SemDedupSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private val tau = 0.4

  private def embeddings = spark.read.parquet(s"$sf/embeddings.parquet")

  /** Exact transitive closure at tau: brute-force pairs → CC comp map. */
  private def exactComp: Map[Long, Long] = {
    import spark.implicits._
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val edges = a.join(b, col("id_a") < col("id_b"))
      .filter(Vectors.dot(col("va"), col("vb")) >= tau)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
  }

  test("groups refine exact clusters (precision 1.0) and recall holds") {
    import spark.implicits._
    val out = SemDedup.semDedup(embeddings, k = 16, iters = 2, tau = tau,
      probes = 3)
      .as[(Long, Long, Boolean)].collect()
    val exact = exactComp

    // precision: a semantic group never merges vectors the EXACT
    // closure keeps apart — every found group maps into one exact comp
    out.groupBy(_._2).filter(_._2.length >= 2).foreach { case (cl, members) =>
      val comps = members.map(v => exact.getOrElse(v._1, v._1)).toSet
      assert(comps.size == 1,
        s"group $cl spans exact clusters $comps — a false merge")
    }

    // recall: fraction of exactly-duplicated vectors (non-singleton in
    // the exact closure) that SemDeDup also flags as duplicates.
    val exactSizes = exact.values.groupBy(identity).map { case (c, vs) => (c, vs.size) }
    val exactDups = exact.collect {
      case (v, c) if exactSizes(c) >= 2 => v
    }.toSet
    val foundSizes = out.groupBy(_._2).map { case (c, vs) => (c, vs.length) }
    val foundDups = out.collect {
      case (v, c, _) if foundSizes(c) >= 2 => v
    }.toSet
    assert(foundDups.subsetOf(exactDups), "flagged a non-duplicate")
    val recall = foundDups.size.toDouble / math.max(exactDups.size, 1)
    info(f"semdedup recall: ${foundDups.size}/${exactDups.size} = $recall%.3f")
    assert(recall >= 0.80,
      f"cluster-boundary recall collapsed: $recall%.3f " +
        s"(${foundDups.size}/${exactDups.size})")
  }

  test("survivors are the group minimum and output is deterministic") {
    import spark.implicits._
    val o1 = SemDedup.semDedup(embeddings, k = 16, iters = 2, tau = tau)
      .as[(Long, Long, Boolean)].collect().toSeq
    // kept ⇔ vec_id == cluster, and the cluster id is a member (the min)
    o1.foreach { case (v, c, kept) => assert(kept == (v == c)) }
    o1.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._1).min == c, s"cluster id $c is not the min member")
    }
    val o2 = SemDedup.semDedup(embeddings, k = 16, iters = 2, tau = tau)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(o1 == o2)
  }
}
