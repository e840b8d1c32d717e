package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.Vectors

/** Product-quantization invariants: code contract, ADC recall vs the
  * exact cosine top-k, and encode determinism. */
class PqSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private val M = 16
  private val K = 16

  private def embeddings = spark.read.parquet(s"$sf/embeddings.parquet")

  test("codes are m small ints in range — the 32x compression contract") {
    import spark.implicits._
    val model = Pq.train(embeddings, m = M, k = K, iters = 2)
    assert(model.codebooks.length == M)
    assert(model.codebooks.forall(_.length == K))
    assert(model.codebooks.forall(_.forall(_.length == 64 / M)))
    val codes = Pq.encode(embeddings, model).as[(Long, Seq[Int])].collect()
    assert(codes.length == 500)
    codes.foreach { case (_, cs) =>
      assert(cs.length == M)
      assert(cs.forall(c => c >= 0 && c < K))
    }
    // non-degenerate: the corpus doesn't collapse to one code word
    assert(codes.map(_._2).distinct.length > 100,
      "quantizer collapsed — codes carry no information")
  }

  test("shortlist recall and exact-rerank recall@10 vs exact cosine") {
    import spark.implicits._
    val model = Pq.train(embeddings, m = M, k = K, iters = 2)
    val codes = Pq.encode(embeddings, model)
    val queries = embeddings.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))

    val e = embeddings.select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val exact = e.join(queries)
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        Vectors.dot(col("embedding"), col("qvec")).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet

    // stage 1: does the ADC shortlist keep the true neighbors?
    val shortlist = Pq.search(codes, model, queries, topK = 50)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val shortRecall = (shortlist & exact).size.toDouble / exact.size
    info(f"pq shortlist(50) recall of exact top-10: $shortRecall%.3f")

    // stage 2: end-to-end rerank — recall is set by the shortlist, the
    // exact re-rank cannot lose anything the shortlist kept
    val reranked = Pq.searchRerank(codes, model, embeddings, queries,
      topK = 10, shortlist = 50)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(reranked.size == 50, "5 queries x top-10 exactly")
    val recall = (reranked & exact).size.toDouble / exact.size
    info(f"pq rerank recall@10: ${(reranked & exact).size}/${exact.size} = $recall%.3f")
    assert(recall >= shortRecall - 1e-9,
      "exact re-rank may not lose shortlisted true neighbors")
    assert(recall >= 0.80,
      f"rerank recall collapsed: $recall%.3f — shortlist lost the neighborhood")
  }

  test("IVFPQ: probing all cells equals flat PQ; partial probes keep recall") {
    import spark.implicits._
    val idx = Pq.buildIvfPq(embeddings, kCells = 16, m = M, k = K, iters = 2)
    val queries = embeddings.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))

    // nprobe = kCells ⇒ every cell scanned ⇒ identical to the flat
    // codes scan with the same shortlist + rerank
    val full = Pq.searchIvfPq(idx, queries, embeddings, topK = 10,
      nprobe = 16, shortlist = 50).as[(Long, Int, Long, Double)].collect().toSeq
    val model = Pq.train(embeddings, m = M, k = K, iters = 2)
    val codes = Pq.encode(embeddings, model)
    val flat = Pq.searchRerank(codes, model, embeddings, queries,
      topK = 10, shortlist = 50).as[(Long, Int, Long, Double)].collect().toSeq
    assert(full == flat, "full-probe IVFPQ must equal the flat PQ search")

    // partial probes: scan 6/16 of the corpus, keep most of the recall
    val probed = Pq.searchIvfPq(idx, queries, embeddings, topK = 10,
      nprobe = 6, shortlist = 50)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val exact = embeddings.select(col("vec_id"), col("embedding"))
      .join(queries)
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        Vectors.dot(col("embedding"), col("qvec")).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (probed & exact).size.toDouble / exact.size
    info(f"ivfpq recall@10 (nprobe 6/16): ${(probed & exact).size}/${exact.size} = $recall%.3f")
    // the testdata embeddings are ISOTROPIC unit vectors (label centroid
    // norms ≈ 0.14, within-spread ≈ 0.99 — no real cluster structure),
    // so probing 6/16 balanced Voronoi cells measures pure boundary
    // locality: the pin is a wide margin over the 6/16 = 0.375
    // scan-fraction baseline, not a near-1.0 recall (round 8's 0.94 was
    // one lucky cell configuration of the old first-k init; recall on
    // structureless data swings 0.6-0.95 across equally-good
    // clusterings). AnnSpec's planted-cluster test pins the ≥0.9 case
    // where structure actually exists.
    assert(recall >= 0.55,
      f"probed recall $recall%.3f too close to the 0.375 scan-fraction baseline")
  }

  test("IVFPQ append with frozen models equals assigned-at-build-time") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-app")
      .toString + "/idx"
    val first = embeddings.filter(col("vec_id") < 250)
    val rest = embeddings.filter(col("vec_id") >= 250)
    val idx = Pq.buildIvfPq(first, kCells = 8, m = M, k = K, iters = 2)
    Pq.writeIvfPq(idx, dir)
    Pq.appendToIvfPq(spark, dir, rest)
    val grown = Pq.loadIvfPq(spark, dir)
    assert(grown.assignments.count() == 500)
    assert(grown.model.codebooks.flatten.flatten.toSeq ==
      idx.model.codebooks.flatten.flatten.toSeq,
      "append must not touch the codebooks")
    // appended codes equal the frozen-model encode of those vectors
    val gotCodes = grown.assignments.filter(col("vec_id") >= 250)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    val wantCodes = Pq.encode(
      rest.select(col("vec_id"), col("embedding")), idx.model)
      .as[(Long, Seq[Int])].collect().toMap
    assert(gotCodes == wantCodes)
  }

  test("training and encoding are deterministic") {
    import spark.implicits._
    val m1 = Pq.train(embeddings, m = M, k = K, iters = 2)
    val m2 = Pq.train(embeddings, m = M, k = K, iters = 2)
    assert(m1.codebooks.flatten.flatten.toSeq == m2.codebooks.flatten.flatten.toSeq)
    val c1 = Pq.encode(embeddings, m1).as[(Long, Seq[Int])].collect().toMap
    val c2 = Pq.encode(embeddings, m2).as[(Long, Seq[Int])].collect().toMap
    assert(c1 == c2)
  }
}
