package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.MinHashSignature.splitmix64

/** GraphAnn beam search: exhaustive-budget search on a connected graph
  * must equal brute force exactly; at a TIGHT budget on clustered data
  * it must beat the IVFPQ shortlist's recall at the same number of
  * exact-dot evaluations (the reason the graph shape exists); and the
  * whole pipeline is deterministic and persistable. */
class GraphAnnSpec extends SparkSuite {

  import spark.implicits._

  /** Planted-cluster corpus: `nClusters` tight clusters of `per`
    * unit-norm vectors (deterministic splitmix noise; `noiseDiv` sets
    * the noise amplitude — larger divisor = tighter clusters). */
  private def planted(nClusters: Int, per: Int, dim: Int,
      noiseDiv: Double = 1000.0) = {
    val rows = (0 until nClusters * per).map { i =>
      val c = i % nClusters
      val raw = Array.tabulate(dim) { d =>
        (if (d == c % dim) 8.0 else 0.0) +
          (splitmix64(i.toLong * dim + d) % 1000) / noiseDiv
      }
      val n = math.sqrt(raw.map(x => x * x).sum)
      (i.toLong, raw.map(x => (x / n).toFloat).toSeq)
    }
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
  }

  private def bruteForce(vecs: Array[(Long, Array[Float])], topK: Int,
      queryIds: Option[Set[Long]] = None): Map[Long, Seq[Long]] =
    vecs.filter(v => queryIds.forall(_.contains(v._1)))
      .map { case (qid, qv) =>
        val scored = vecs.filter(_._1 != qid).map { case (vid, v) =>
          var s = 0.0
          var i = 0
          while (i < v.length) { s += qv(i).toDouble * v(i); i += 1 }
          (vid, s)
        }
        (qid, scored.sortWith { case ((id1, s1), (id2, s2)) =>
          if (s1 != s2) s1 > s2 else id1 < id2
        }.take(topK).map(_._1).toSeq)
      }.toMap

  private def recallOf(got: Map[Long, Set[Long]],
      exact: Map[Long, Seq[Long]]): Double =
    exact.map { case (q, nn) =>
      (got.getOrElse(q, Set.empty) & nn.toSet).size.toDouble / nn.size
    }.sum / exact.size

  test("exhaustive budget on the isotropic corpus equals brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count().toInt
    // isotropic testdata → a degree-8 symmetrized kNN graph is
    // connected; with ef = n and unlimited rounds the beam visits every
    // reachable vector, so top-k IS brute force
    val idx = GraphAnn.build(emb, degree = 8, kCells = 8, iters = 2,
      probes = 2, descentRounds = 0)
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val got = GraphAnn.search(idx, emb, queries, topK = 5, ef = n,
        maxRounds = 50)
      .select("q_id", "rnk", "vec_id").as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val exact = bruteForce(emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect(), topK = 5)
    (0L until 8L).foreach { q =>
      assert(got(q) == exact(q), s"query $q: ${got(q)} vs ${exact(q)}")
    }
  }

  test("tight budget on clustered data: recall beats the IVFPQ shortlist") {
    // the regime where the graph shape EXISTS — hierarchical locality:
    // 5 superclusters (dominant dim, amplitude 8) x 5 subclusters
    // (continuous dense offsets, amplitude 0.5) x per-vector noise
    // (0.01). True neighbors are fine NOISE-level structure inside a
    // 600-member subcluster — far larger than the search budget. PQ
    // codebooks (k=16/subspace) resolve super- and mostly subcluster
    // projections, but the noise sits far below codeword resolution:
    // all 600 subcluster members quantize to near-identical codes, so
    // the ADC shortlist cut is blind exactly where the answer lives —
    // while exact-dot navigation sees the full hierarchy. This is the
    // production picture: fine neighborhood structure beneath coarse
    // quantization, competitor sets larger than any shortlist.
    val nSuper = 5
    val nSub = 5
    val per = 600 // per subcluster -> 15k vectors, subcluster >> budget
    val dim = 32
    val rows = (0 until nSuper * nSub * per).map { i =>
      val sup = i % nSuper
      val sub = (i / nSuper) % nSub
      val raw = Array.tabulate(dim) { d =>
        // CONTINUOUS subcluster offsets: 100 distinct values per
        // subspace dim — a ±0.5 sign pattern would hand PQ exactly
        // 2^4 = 16 patterns per 4-dim subspace, one per codeword
        (if (d == sup) 8.0 else 0.0) +
          (splitmix64((sup * 97L + sub) * dim + d) % 1000) / 1000.0 - 0.5 +
          (splitmix64(i.toLong * dim + d) % 1000) / 100000.0
      }
      val n = math.sqrt(raw.map(x => x * x).sum)
      (i.toLong, raw.map(x => (x / n).toFloat).toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .localCheckpoint()
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
      .localCheckpoint()
    val exact = bruteForce(emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect(), topK = 10,
      queryIds = Some((0L until 20L).toSet))

    val idx = GraphAnn.build(emb, degree = 8, kCells = 20, iters = 2,
      probes = 2, descentRounds = 2)
    val (res, scoredPairs) = GraphAnn.searchCounted(idx, emb, queries,
      topK = 10, ef = 16, maxRounds = 8)
    val gotGraph = res.select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rGraph = recallOf(gotGraph, exact)
    val nQueries = queries.count()
    val budget = math.max(10, (scoredPairs / nQueries).toInt)

    // IVFPQ at the SAME exact-dot budget: its only exact dots are the
    // shortlist rerank — shortlist = the graph's per-query scored pairs
    // (generous nprobe, so the comparison isolates the shortlist cut)
    val pq = Pq.buildIvfPq(emb, kCells = 20, m = 8, k = 16, iters = 2)
    val gotPq = Pq.searchIvfPq(pq, queries, emb, topK = 10, nprobe = 4,
        shortlist = budget)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rPq = recallOf(gotPq, exact)

    info(f"graph recall@10 $rGraph%.3f (${budget} dots/query) " +
      f"vs ivfpq shortlist recall@10 $rPq%.3f")
    assert(rGraph >= 0.90, f"graph recall floor: $rGraph%.3f")
    assert(rGraph >= rPq,
      f"graph $rGraph%.3f under ivfpq $rPq%.3f at equal budget")
  }

  test("append: new vectors join every layer they inhabit and are findable") {
    val all = planted(nClusters = 5, per = 50, dim = 16).localCheckpoint()
    // build on ~86%, append the rest; modulus 7 is coprime to the
    // 5-cluster assignment (i % 5), so appended vectors spread across
    // every cluster instead of forming one unreachable island
    val existing = all.filter(col("vec_id") % 7 =!= 1).localCheckpoint()
    val appended = all.filter(col("vec_id") % 7 === 1).localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("gapp").toString
    GraphAnn.write(GraphAnn.build(existing, degree = 6, kCells = 5,
      iters = 2, probes = 2, descentRounds = 1), dir)
    val before = GraphAnn.load(spark, dir)
    GraphAnn.append(spark, dir, appended, existing, degree = 6)
    val after = GraphAnn.load(spark, dir)
    // grow-in-place: the pre-existing edge rows are all still there
    before.layers.zip(after.layers).foreach { case (b, a) =>
      assert(b.count() <= a.count())
      assert(b.except(a).count() == 0, "append rewrote existing edges")
    }
    // entry order preserved, extended only by new top-layer members
    assert(after.entries.take(before.entries.length).toSeq ==
      before.entries.toSeq)
    val maxLevel = before.layers.size - 1
    val wantNewTop = appended.filter(
        pmod(xxhash64(col("vec_id")), lit(1L << (2 * maxLevel))) === 0)
      .select("vec_id").orderBy("vec_id").as[Long].collect().toSeq
    assert(after.entries.drop(before.entries.length).toSeq == wantNewTop)
    // every appended vector has out-edges in the base layer
    val withEdges = after.layers.head.select(col("src")).distinct()
      .as[Long].collect().toSet
    val appendedIds = appended.select("vec_id").as[Long].collect().toSet
    assert(appendedIds.subsetOf(withEdges),
      s"appended without edges: ${appendedIds -- withEdges}")
    // findable: searching the grown index with EXISTING queries at a
    // healthy beam recovers the full-corpus brute-force top-5 (which
    // includes appended vectors) at a solid recall
    val queries = all.filter(col("vec_id") < 10 && col("vec_id") % 7 =!= 1)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val qIds = queries.select("q_id").as[Long].collect().toSet
    val exact = bruteForce(all.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect(), topK = 5, Some(qIds))
    val got = GraphAnn.search(after, all, queries, topK = 5, ef = 16)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val r = recallOf(got, exact)
    val foundAppended = got.values.flatten.toSet & appendedIds
    info(f"post-append recall@5 $r%.3f; ${foundAppended.size} appended " +
      "vectors surfaced in results")
    assert(r >= 0.85, f"post-append recall floor: $r%.3f")
    assert(foundAppended.nonEmpty,
      "no appended vector ever surfaced — they are not reachable")
  }

  test("search is deterministic and survives the disk round-trip") {
    val emb = planted(nClusters = 5, per = 40, dim = 16).localCheckpoint()
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val idx = GraphAnn.build(emb, degree = 6, kCells = 5, iters = 2,
      probes = 2, descentRounds = 1)
    val a = GraphAnn.search(idx, emb, queries, topK = 5, ef = 8)
      .collect().toSeq
    val b = GraphAnn.search(idx, emb, queries, topK = 5, ef = 8)
      .collect().toSeq
    assert(a == b, "search is not deterministic")
    val dir = java.nio.file.Files.createTempDirectory("gann").toString
    GraphAnn.write(idx, dir)
    val loaded = GraphAnn.load(spark, dir)
    assert(loaded.entries.toSeq == idx.entries.toSeq)
    val c = GraphAnn.search(loaded, emb, queries, topK = 5, ef = 8)
      .collect().toSeq
    assert(c == a, "loaded index searches differently")
  }
}
