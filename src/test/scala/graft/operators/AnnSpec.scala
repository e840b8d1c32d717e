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

  test("materialized index prunes a probe to its cells' files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString + "/idx"
    Ann.writeIvf(Ann.buildIvf(embeddings, k = 16, iters = 2), dir)
    // layout: one partition dir per cell
    val cellDirs = new java.io.File(s"$dir/assignments").listFiles()
      .filter(_.getName.startsWith("cell_id=")).map(_.getName).toSeq
    assert(cellDirs.size > 1)
    // a 2-cell probe is partition-pruned at PLANNING time: the predicate
    // sits in PartitionFilters, and the scan's selected file partitions
    // are exactly the probed cells
    val probe = spark.read.parquet(s"$dir/assignments")
      .filter(col("cell_id").isin(3, 7))
    val scan = probe.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.nonEmpty, "probe must prune at planning time")
    probe.collect() // execute so the scan's file metrics are populated
    val probedFiles = Seq(3, 7).map(c =>
      new java.io.File(s"$dir/assignments/cell_id=$c").listFiles()
        .count(_.getName.endsWith(".parquet"))).sum
    assert(scan.metrics("numFiles").value == probedFiles,
      s"scan read ${scan.metrics("numFiles").value} files, " +
        s"but the probed cells hold $probedFiles")
    // and the loaded index searches identically to the in-memory one
    val queries = embeddings.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val fromDisk = Ann.search(Ann.loadIvf(spark, dir), queries, 5, 4)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val fromMem = Ann.search(Ann.buildIvf(embeddings, k = 16, iters = 2),
      queries, 5, 4).as[(Long, Int, Long, Double)].collect().toSeq
    assert(fromDisk == fromMem)
  }

  test("append with frozen centroids equals assigned-at-build-time") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf-app")
      .toString + "/idx"
    // build on the first half, append the second half
    val first = embeddings.filter(col("vec_id") < 250)
    val rest = embeddings.filter(col("vec_id") >= 250)
    val idx = Ann.buildIvf(first, k = 8, iters = 2)
    Ann.writeIvf(idx, dir)
    Ann.appendToIvf(spark, dir, rest)
    val appended = Ann.loadIvf(spark, dir)
    assert(appended.assignments.count() == 500)
    assert(appended.centroids.flatten.toSeq == idx.centroids.flatten.toSeq,
      "append must not touch the model")
    // the appended rows carry exactly the frozen-model assignment the
    // build would have produced for them
    val gotCells = appended.assignments.filter(col("vec_id") >= 250)
      .select("vec_id", "cell_id").as[(Long, Int)].collect().toMap
    val wantCells = Ann.assignByJoinForTest(
      rest.select(col("vec_id"), col("embedding")), idx.centroids)
      .select("vec_id", "cell_id").as[(Long, Int)].collect().toMap
    assert(gotCells == wantCells)
    // and search over the grown index sees the appended vectors
    val queries = rest.filter(col("vec_id") < 260)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val res = Ann.search(appended, queries, topK = 5, nprobe = 8)
      .select("vec_id").as[Long].collect()
    assert(res.exists(_ >= 250), "appended vectors never surfaced")
  }

  test("kernel and join assignment agree on exact ties (lowest cell)") {
    import spark.implicits._
    // two IDENTICAL centroids: every dot ties, both paths must pick
    // cell 0 — the gate (KernelStateLimitFloats) switches paths, so a
    // tie-break mismatch would break append ≡ assigned-at-build-time
    val centroids = Array(Array(1f, 0f), Array(1f, 0f))
    val corpus = Seq((1L, Seq(0.5f, 0.5f)), (2L, Seq(-1f, 3f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    val viaJoin = Ann.assignByJoinForTest(corpus, centroids)
      .select("vec_id", "cell_id").as[(Long, Int)].collect().toMap
    assert(viaJoin.values.forall(_ == 0), s"join path: $viaJoin")
    val viaKernel = corpus.withColumn("cell_id",
      element_at(graft.functions.QuantExpressions.nearestCells(
        col("embedding"), centroids.flatten, 2, 2, 1), 1))
      .select("vec_id", "cell_id").as[(Long, Int)].collect().toMap
    assert(viaKernel == viaJoin)
  }

  test("join-path assignment (large k) agrees with the inline expression") {
    import spark.implicits._
    // same centroids through both assignment shapes must agree — pin by
    // calling the private paths through buildIvf at k=16 (inline) vs a
    // forced join assignment on identical centroids
    val idx = Ann.buildIvf(embeddings, k = 16, iters = 1)
    val viaJoin = Ann.assignByJoinForTest(
      embeddings.select(col("vec_id"), col("embedding")), idx.centroids)
      .select("vec_id", "cell_id").as[(Long, Int)].collect().toMap
    val inline = idx.assignments.select("vec_id", "cell_id")
      .as[(Long, Int)].collect().toMap
    assert(viaJoin == inline)
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

  test("seeded init survives a source-sorted corpus (planted clusters)") {
    import spark.implicits._
    // 16 tight planted clusters, vec_ids SORTED BY CLUSTER: ids 0-99
    // are all cluster 0, 100-199 cluster 1, ... — the degenerate case
    // for the round-8 "first k vectors" init (every centroid seeded
    // inside cluster 0). The hash-sampled k-means++ init must still
    // recover the structure: balanced cells, each cluster intact in one
    // cell, and near-perfect recall probing 2/16 cells.
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val centers = Array.fill(16)(Array.fill(16)(rnd.nextGaussian()))
    val rows = (0 until 1600).map { i =>
      val c = centers(i / 100)
      (i.toLong, unit(c.map(_ + 0.1 * rnd.nextGaussian())))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val idx = Ann.buildIvf(emb, k = 16, iters = 2)
    // balance: no cell grabs multiple planted clusters wholesale
    val sizes = idx.assignments.groupBy("cell_id").count()
      .as[(Int, Long)].collect().map(_._2)
    assert(sizes.max <= 2 * 100,
      s"degenerate cells: sizes ${sizes.sorted.reverse.take(4).mkString(",")}")
    // recall: one query per planted cluster, neighbors = same cluster
    val queries = emb.filter(col("vec_id") % 100 === 50)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val got = Ann.search(idx, queries, topK = 10, nprobe = 2)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
    val hits = got.count { case (q, v) => v / 100 == q / 100 }
    val recall = hits.toDouble / (16 * 10)
    assert(recall >= 0.9,
      f"planted-cluster recall $recall%.3f — init failed the sorted corpus")
  }
}
