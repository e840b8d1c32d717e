package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Connected-components correctness: compared against a driver-side
  * union-find oracle on seeded random graphs, plus the adversarial
  * long-chain case pointer jumping exists for. */
class DedupSpec extends SparkSuite {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = min member id, which union-by-min maintains
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("property: matches union-find on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 120
      val edges = Seq.fill(90)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val got = Dedup.connectedComponents(
          edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      val want = unionFind(n, edges)
      got.foreach { case (id, comp) =>
        assert(comp == want(id), s"node $id: got $comp want ${want(id)}")
      }
    }
  }

  test("size-gated components: both paths produce identical labels") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val n = 150
    val edges = Seq.fill(110)(
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val df = edges.toDF("src", "dst")
    // local union-find path (under the gate)
    val local = Dedup.components(df).as[(Long, Long)].collect().toMap
    // forced distributed path (gate at 0)
    val dist = Dedup.components(df, localEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(local == dist, "gated paths diverged")
    val want = unionFind(n, edges)
    local.foreach { case (id, comp) => assert(comp == want(id)) }
  }

  test("long chain: every node reaches the chain head") {
    import spark.implicits._
    val chain = (0L until 200L).map(i => (i, i + 1))
    val got = Dedup.connectedComponents(chain.toDF("src", "dst"))
      .agg(countDistinct(col("comp")), min("comp"), count(lit(1)))
      .as[(Long, Long, Long)].head()
    assert(got == ((1L, 0L, 201L))) // one component, labeled by the head
  }

  test("star contraction ≡ union-find on the structured-id graph") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the id layout that exposed the old pointer-jumping loop (r15:
    // >25 rounds needed, silent mislabels at the bound) — the sparse
    // co-purchase graph's part keys; alternating star contraction
    // must match driver union-find exactly within the default bound
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .filter(col("l_quantity") > 45.0)
      .select(col("l_orderkey"), col("l_partkey"))
    val pairs = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").cast("long").as("src"),
        col("b.l_partkey").cast("long").as("dst"))
      .distinct().localCheckpoint()
    val dist = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val uf = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    assert(dist == uf,
      s"${dist.count(k => dist(k._1) != uf(k._1))} labels diverged")
  }

  test("non-convergence fails loudly, never returns wrong labels") {
    import spark.implicits._
    // r15: the loop previously RETURNED at maxIter with whatever
    // labels it had (991 silent mislabels on the sparse co-purchase
    // graph at sf0.1, caught by the q_graph_components oracle) — a
    // bound too tight for the graph must throw instead
    val chain = (0L until 200L).map(i => (i, i + 1))
    val ex = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain.toDF("src", "dst"), maxIter = 1)
        .count()
    }
    assert(ex.getMessage.contains("did not converge"), ex.getMessage)
  }
}
