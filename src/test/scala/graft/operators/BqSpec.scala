package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** BQ: the packed-bit kernels must equal a naive reference bit-for-bit
  * (including non-multiple-of-8 dims), training must be
  * bit-deterministic under any partitioning (exact median is
  * order-free) and produce balanced bits, rerank must recover ranking
  * from 1-bit codes, and the kernels must stay on the codegen path. */
class BqSpec extends SparkSuite {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def embeddings = spark.read.parquet(s"$sf/embeddings.parquet")

  private def naiveEncode(v: Array[Float], thr: Array[Double]): Array[Byte] = {
    val out = new Array[Byte]((thr.length + 7) / 8)
    v.indices.foreach { d =>
      if (v(d) > thr(d)) out(d / 8) = (out(d / 8) | (1 << (d % 8))).toByte
    }
    out
  }

  private def naiveHamming(a: Array[Byte], b: Array[Byte]): Int =
    a.zip(b).map { case (x, y) => Integer.bitCount((x ^ y) & 0xff) }.sum

  test("kernels equal the naive reference bit-for-bit, dim % 8 != 0 too") {
    val rnd = new scala.util.Random(42)
    for (dim <- Seq(13, 64, 100)) {
      val thr = Array.fill(dim)(rnd.nextDouble() - 0.5)
      val vecs = (0L until 20L).map(i =>
        (i, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      val df = vecs.toDF("vec_id", "embedding")
        .select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding"))
      val got = Bq.encode(df, Bq.BqModel(thr))
        .as[(Long, Array[Byte])].collect().toMap
      vecs.foreach { case (id, v) =>
        assert(got(id).toSeq == naiveEncode(v, thr).toSeq, s"dim $dim id $id")
      }
      // hamming kernel vs naive, through the engine
      val pairs = df.select(col("vec_id").as("id_a"),
          graft.functions.BqExpressions.encode(col("embedding"), thr)
            .as("ca"))
        .crossJoin(df.select(col("vec_id").as("id_b"),
          graft.functions.BqExpressions.encode(col("embedding"), thr)
            .as("cb")))
        .select(col("id_a"), col("id_b"),
          graft.functions.BqExpressions.hamming(col("ca"), col("cb"))
            .as("h"))
        .as[(Long, Long, Int)].collect()
      pairs.foreach { case (a, b, h) =>
        val expect = naiveHamming(
          naiveEncode(vecs(a.toInt)._2, thr), naiveEncode(vecs(b.toInt)._2, thr))
        assert(h == expect, s"dim $dim pair ($a,$b)")
      }
    }
  }

  test("two-pass bounded-state train equals the driver-sorted exact " +
      "lower median (negatives, ties, constant dims, odd/even n)") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(9, 10, 101)) {
      val vecs = (0L until n.toLong).map { i =>
        (i, Array(
          rnd.nextFloat() * 4 - 2,             // mixed sign
          -math.abs(rnd.nextFloat()),          // all negative
          3.14f,                               // constant
          if (i % 2 == 0) 1.0f else -1.0f))    // heavy ties
      }
      val df = vecs.toDF("vec_id", "embedding")
        .select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding"))
        .repartition(3)
      val got = Bq.train(df).thresholds
      (0 until 4).foreach { d =>
        val sorted = vecs.map(_._2(d)).sorted
        val lowerMedian = sorted((n + 1) / 2 - 1).toDouble
        assert(got(d) == lowerMedian, s"n=$n dim $d: ${got(d)} vs " +
          s"$lowerMedian")
      }
    }
  }

  test("training is bit-deterministic under any partitioning and " +
      "median thresholds balance the bits") {
    val a = Bq.train(embeddings)
    val b = Bq.train(embeddings.repartition(7, col("vec_id")))
    assert(a.thresholds.toSeq == b.thresholds.toSeq)
    val n = embeddings.count()
    val codes = Bq.encode(embeddings, a)
    // per-dim popcount: the median threshold sets each bit on at most
    // half the corpus (strict > excludes the median value itself)
    val dim = a.dim
    val setBits = codes.as[(Long, Array[Byte])].collect()
      .map(_._2).foldLeft(new Array[Long](dim)) { (acc, code) =>
        (0 until dim).foreach { d =>
          if ((code(d / 8) & (1 << (d % 8))) != 0) acc(d) += 1
        }
        acc
      }
    setBits.zipWithIndex.foreach { case (c, d) =>
      val frac = c.toDouble / n
      assert(frac > 0.3 && frac <= 0.5 + 1e-9,
        f"dim $d bit set on ${frac * 100}%.1f%% of corpus")
    }
    // code width: 32x compression over float32
    val width = codes.select(length(col("code"))).as[Int].head()
    assert(width == (dim + 7) / 8)
  }

  test("rerank recovers ranking from 1-bit codes; bq-only is the cheap " +
      "coarse pass") {
    val model = Bq.train(embeddings)
    val codes = Bq.encode(embeddings, model).localCheckpoint()
    val queries = embeddings.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val vecs = embeddings.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val exact = vecs.filter(_._1 < 8).map { case (qid, qv) =>
      val scored = vecs.filter(_._1 != qid).map { case (vid, v) =>
        var s = 0.0
        var i = 0
        while (i < v.length) { s += qv(i).toDouble * v(i); i += 1 }
        (vid, s)
      }
      (qid, scored.sortWith { case ((id1, s1), (id2, s2)) =>
        if (s1 != s2) s1 > s2 else id1 < id2
      }.take(10).map(_._1).toSet)
    }.toMap
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (q, nn) =>
        (got.getOrElse(q, Set.empty) & nn).size.toDouble / nn.size
      }.sum / exact.size
    }
    val rBq = recall(Bq.search(codes, model, queries, topK = 10))
    val rRerank = recall(
      Bq.searchRerank(codes, model, embeddings, queries, 10, 100))
    info(f"bq-only recall@10 $rBq%.3f, rerank(100) recall@10 $rRerank%.3f")
    // the isotropic testdata is the curse-of-dimensionality hard case
    // (the GraphAnn finding: uniform random vectors give any 1-bit /
    // sublinear method almost nothing to grip); these are honest
    // measured floors for THAT regime — the clustered test below pins
    // the regime real embedding spaces are in
    assert(rBq >= 0.20, f"bq-only recall floor: $rBq%.3f")
    assert(rRerank >= 0.80, f"rerank recall floor: $rRerank%.3f")
  }

  test("clustered corpus (the real-embedding regime): 1-bit codes carry " +
      "the cluster structure; rerank is near-exact") {
    import graft.functions.MinHashSignature.splitmix64
    // centroids are random SIGN PATTERNS over all dims — the geometry
    // real embedding clusters have (direction spread across many
    // dimensions), and the one binarization can see. A single-spike
    // corpus (the GraphAnn planted shape) is adversarial for 1-bit
    // codes: one informative dim among 32 leaves cluster separation
    // at ~0.5 bits against a ~2.8-bit noise std.
    val nClusters = 20
    val per = 200
    val dim = 32
    val rows = (0 until nClusters * per).map { i =>
      val c = i % nClusters
      val raw = Array.tabulate(dim) { d =>
        (if (splitmix64(c.toLong * dim + d) % 2 == 0) 1.0 else -1.0) +
          ((splitmix64(i.toLong * dim + d) % 1000) / 1000.0 - 0.5) * 0.6
      }
      val n = math.sqrt(raw.map(x => x * x).sum)
      (i.toLong, raw.map(x => (x / n).toFloat).toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .localCheckpoint()
    val model = Bq.train(emb)
    val codes = Bq.encode(emb, model).localCheckpoint()
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val exact = vecs.filter(_._1 < 8).map { case (qid, qv) =>
      val scored = vecs.filter(_._1 != qid).map { case (vid, v) =>
        var s = 0.0
        var i = 0
        while (i < v.length) { s += qv(i).toDouble * v(i); i += 1 }
        (vid, s)
      }
      (qid, scored.sortWith { case ((id1, s1), (id2, s2)) =>
        if (s1 != s2) s1 > s2 else id1 < id2
      }.take(10).map(_._1).toSet)
    }.toMap
    // shortlist must cover the hamming TIE-SET: 1-bit codes resolve
    // which cluster, not rank within it — all ~200 same-cluster codes
    // sit at hamming ~0, so the shortlist has to span the cluster for
    // rerank to see the true neighbors (the BQ oversampling rule:
    // shortlist >= expected cluster/tie size, here 250 > 200)
    val got = Bq.searchRerank(codes, model, emb, queries, 10, 250)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rec = exact.map { case (q, nn) =>
      (got.getOrElse(q, Set.empty) & nn).size.toDouble / nn.size
    }.sum / exact.size
    info(f"clustered rerank(250) recall@10 $rec%.3f")
    assert(rec >= 0.90, f"clustered recall floor: $rec%.3f")
  }

  test("persistence round-trips the model bits and the search results") {
    val dir = java.nio.file.Files.createTempDirectory("bq").toString
    val model = Bq.train(embeddings)
    val codes = Bq.encode(embeddings, model)
    Bq.writeBq(model, codes, dir)
    val (model2, codes2) = Bq.loadBq(spark, dir)
    assert(model2.thresholds.toSeq == model.thresholds.toSeq)
    val queries = embeddings.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val a = Bq.searchRerank(codes, model, embeddings, queries, 10, 50)
      .collect().toSeq
    val b = Bq.searchRerank(codes2, model2, embeddings, queries, 10, 50)
      .collect().toSeq
    assert(a == b)
  }

  test("kernels are codegen (no fallback) and the generated Java compiles") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenFallback, GenerateMutableProjection}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val fallback = classOf[CodegenFallback]
    assert(!fallback.isAssignableFrom(classOf[graft.functions.BqEncode]))
    assert(!fallback.isAssignableFrom(classOf[graft.functions.BqHamming]))
    val thr = Array(0.0, 0.0, 0.0)
    val a = Literal.create(Seq(0.5f, -1.0f, 1.0f), ArrayType(FloatType))
    val b = Literal.create(Seq(-0.5f, 1.0f, 1.0f), ArrayType(FloatType))
    val proj = GenerateMutableProjection.generate(Seq(
      graft.functions.BqHamming(
        graft.functions.BqEncode(a, thr), graft.functions.BqEncode(b, thr))))
    val row = proj(org.apache.spark.sql.catalyst.InternalRow.empty)
    assert(row.getInt(0) == 2) // dims 0 and 1 flip, dim 2 agrees
  }
}
