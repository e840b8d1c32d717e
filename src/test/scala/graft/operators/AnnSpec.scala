package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** IVF ANN invariants: deterministic index, exact scoring inside probed
  * cells, useful recall vs the brute-force oracle. */
class AnnSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def embeddings = spark.read.parquet(s"$sf/embeddings.parquet")

  test("index is deterministic and partitions the corpus") {
    import spark.implicits._
    val i1 = Ann.buildIvf(embeddings, k = 16, iters = 2)
    val i2 = Ann.buildIvf(embeddings, k = 16, iters = 2)
    val a1 = i1.assignments.select("vec_id", "cell_id")
      .as[(Long, Int)].collect().toMap
    val a2 = i2.assignments.select("vec_id", "cell_id")
      .as[(Long, Int)].collect().toMap
    assert(a1 == a2)
    assert(a1.size == 500)               // every vector assigned once
    assert(a1.values.toSet.size > 1)     // non-degenerate clustering
  }

  test("probed search reaches useful recall vs brute force") {
    import spark.implicits._
    val index = Ann.buildIvf(embeddings, k = 16, iters = 2)
    val queries = embeddings.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val ivf = Ann.search(index, queries, topK = 10, nprobe = 6)
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val exact = graft.queries.Llm.queries("q_ann_cosine_topk")(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recalls = exact.keys.toSeq.map { q =>
      ivf.getOrElse(q, Set.empty).intersect(exact(q)).size / 10.0
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.5, s"avg recall $avg too low (probing 6/16 cells)")
    // everything IVF returns is exactly scored → any overlap has the
    // same cos as brute force (checked implicitly by identical vec_dot)
  }
}
