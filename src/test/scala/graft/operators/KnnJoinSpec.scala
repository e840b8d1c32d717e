package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.MinHashSignature.splitmix64

/** kNN-join contract: full probe is EXACTLY the brute-force kNN graph
  * (the candidate set is the whole corpus), partial probes hold a
  * measured recall floor on the isotropic testdata, and thresholded
  * clustering recovers planted cluster structure. */
class KnnJoinSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def embeddings = spark.read.parquet(s"$sf/embeddings.parquet")

  /** Driver-side exact kNN with the SAME accumulation order as the
    * codegen'd dot (ascending index, double accumulator). */
  private def bruteForce(vecs: Array[(Long, Array[Float])],
      topK: Int): Map[Long, Seq[Long]] =
    vecs.map { case (qid, qv) =>
      val scored = vecs.filter(_._1 != qid).map { case (vid, v) =>
        var s = 0.0
        var i = 0
        while (i < v.length) { s += qv(i).toDouble * v(i); i += 1 }
        (vid, s)
      }
      val top = scored.sortWith { case ((id1, s1), (id2, s2)) =>
        if (s1 != s2) s1 > s2 else id1 < id2
      }.take(topK).map(_._1).toSeq
      (qid, top)
    }.toMap

  test("full probe equals the brute-force kNN graph exactly") {
    import spark.implicits._
    val kCells = 8
    val got = KnnJoin.knnGraph(embeddings, topK = 5, kCells = kCells,
      iters = 2, probes = kCells)
      .select("q_id", "rnk", "vec_id")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val exact = bruteForce(
      embeddings.select("vec_id", "embedding")
        .as[(Long, Array[Float])].collect(), topK = 5)
    assert(got.keySet == exact.keySet)
    got.foreach { case (q, nn) =>
      assert(nn == exact(q), s"query $q: $nn vs exact ${exact(q)}")
    }
  }

  test("2-probe recall on the isotropic corpus holds its floor") {
    import spark.implicits._
    val got = KnnJoin.knnGraph(embeddings, topK = 5, kCells = 8,
      iters = 2, probes = 2)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = bruteForce(
      embeddings.select("vec_id", "embedding")
        .as[(Long, Array[Float])].collect(), topK = 5)
    val recall = exact.map { case (q, nn) =>
      (got.getOrElse(q, Set.empty) & nn.toSet).size.toDouble / nn.size
    }.sum / exact.size
    info(f"knn 2/8-probe recall@5: $recall%.3f")
    // isotropic embeddings are IVF's worst case (no cluster structure
    // to exploit — the AnnSpec scan-fraction baseline): the pin is
    // measured-floor + clear dominance over the 2/8 = 25% scan
    // fraction a random probe would get
    assert(recall >= 0.50, f"recall $recall%.3f under the floor")
    assert(recall >= 1.5 * 2.0 / 8.0,
      f"recall $recall%.3f does not beat the scan-fraction baseline")
  }

  test("thresholded clustering recovers planted clusters; noise isolates") {
    import spark.implicits._
    // 3 tight planted clusters of 20 + 5 isolated vectors, unit-norm
    val dim = 8
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val rows = (0 until 65).map { i =>
      val v =
        if (i < 60) {
          val c = i / 20 // cluster id 0..2
          Array.tabulate(dim) { d =>
            (if (d == c) 10.0 else 0.0) +
              (splitmix64(i.toLong * dim + d) % 100) / 1000.0
          }
        } else Array.tabulate(dim) { d =>
          // isolated: dominant in a dimension of its own (3 + i - 60)
          (if (d == 3 + i - 60) 10.0 else 0.0) +
            (splitmix64(i.toLong * dim + d) % 100) / 1000.0
        }
      (i.toLong, unit(v))
    }
    val emb = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    val clusters = KnnJoin.knnClusters(emb, topK = 4, kCells = 4,
      tau = 0.99, iters = 3, probes = 4)
      .as[(Long, Long)].collect().toMap
    // each planted cluster collapses to one label; labels differ
    val labels = (0 until 3).map(c =>
      (0 until 20).map(i => clusters(c * 20L + i)).toSet)
    labels.zipWithIndex.foreach { case (l, c) =>
      assert(l.size == 1, s"cluster $c split: $l")
    }
    assert(labels.flatten.toSet.size == 3, "planted clusters merged")
    // isolated vectors stay singletons (their own ids)
    (60L until 65L).foreach(i =>
      assert(clusters(i) == i, s"noise vector $i joined ${clusters(i)}"))
  }

  test("nn-descent lifts low-probe recall; the exact graph is a fixed point") {
    import spark.implicits._
    val exact = bruteForce(
      embeddings.select("vec_id", "embedding")
        .as[(Long, Array[Float])].collect(), topK = 5)
    def recallOf(g: org.apache.spark.sql.DataFrame): Double = {
      val got = g.select("q_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (q, nn) =>
        (got.getOrElse(q, Set.empty) & nn.toSet).size.toDouble / nn.size
      }.sum / exact.size
    }
    // descend at a WIDER working k (the standard NN-Descent move: a
    // k-sized neighbor list explores k² candidates/round — too narrow
    // on weakly-clustered data), then cut to the target k by rank
    val rough = KnnJoin.knnGraph(embeddings, topK = 15, kCells = 8,
      iters = 2, probes = 2)
    val r0 = recallOf(rough.filter(col("rnk") <= 5))
    val refined = KnnJoin.refine(rough, embeddings, topK = 15, rounds = 3)
      .filter(col("rnk") <= 5)
    val r2 = recallOf(refined)
    info(f"nn-descent recall@5: $r0%.3f -> $r2%.3f after 3 rounds at k=15")
    assert(r2 >= r0 + 0.15,
      f"descent did not lift recall: $r0%.3f -> $r2%.3f")
    assert(r2 >= 0.85, f"refined recall floor: $r2%.3f")

    // the exact graph is a fixed point: refining it returns it unchanged
    val full = KnnJoin.knnGraph(embeddings, topK = 5, kCells = 8,
      iters = 2, probes = 8)
    val again = KnnJoin.refine(full, embeddings, topK = 5, rounds = 1)
    assert(again.collect().toSeq == full.collect().toSeq,
      "refining the exact graph changed it")
  }

  test("the graph is deterministic across runs") {
    val a = KnnJoin.knnGraph(embeddings, topK = 3, kCells = 8,
      iters = 2, probes = 2).collect().toSeq
    val b = KnnJoin.knnGraph(embeddings, topK = 3, kCells = 8,
      iters = 2, probes = 2).collect().toSeq
    assert(a == b)
  }
}
