package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** SQ8: the per-dim error bound must hold exactly (it is the point of
  * a uniform grid), training must be bit-deterministic under any
  * partitioning (min/max is order-free), rerank recall must be
  * near-lossless at modest shortlists, and the kernels must stay on
  * the codegen path. */
class SqSpec extends SparkSuite {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def embeddings = spark.read.parquet(s"$sf/embeddings.parquet")

  private def bruteForce(vecs: Array[(Long, Array[Float])], topK: Int)
      : Map[Long, Seq[Long]] =
    vecs.map { case (qid, qv) =>
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

  test("round-trip error is bounded by delta/2 per dim; constant dims exact") {
    val rows = Seq(
      (1L, Seq(0.0f, -1.0f, 7.0f)),
      (2L, Seq(1.0f, 1.0f, 7.0f)),
      (3L, Seq(0.25f, 0.33f, 7.0f)),
      (4L, Seq(0.77f, -0.5f, 7.0f)))
    val emb = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val model = Sq.train(emb)
    // dim 2 is constant → delta 0, decodes exactly
    assert(model.vdelta(2) == 0f)
    val decoded = Sq.encode(emb, model)
      .select(col("vec_id"),
        graft.functions.SqExpressions.decode(col("code"),
          model.vmin, model.vdelta).as("dec"))
      .as[(Long, Seq[Float])].collect().toMap
    rows.foreach { case (id, orig) =>
      val dec = decoded(id)
      orig.zip(dec).zipWithIndex.foreach { case ((o, d), pos) =>
        val tol = model.vdelta(pos) / 2f + 1e-6f
        assert(math.abs(o - d) <= tol,
          s"vec $id dim $pos: $o vs $d (delta ${model.vdelta(pos)})")
      }
    }
    // grid corners are exact: min and max of each dim round-trip
    assert(decoded(1L)(1) == -1.0f && decoded(2L)(1) == 1.0f)
  }

  test("training is bit-deterministic under any partitioning") {
    val a = Sq.train(embeddings)
    val b = Sq.train(embeddings.repartition(7, col("vec_id")))
    assert(a.vmin.toSeq == b.vmin.toSeq)
    assert(a.vdelta.toSeq == b.vdelta.toSeq)
  }

  test("rerank recall is near-lossless; SQ-only ranking already strong") {
    val model = Sq.train(embeddings)
    val codes = Sq.encode(embeddings, model).localCheckpoint()
    val queries = embeddings.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val exact = bruteForce(embeddings.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect(), topK = 10)
      .view.filterKeys(_ < 8).toMap
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (q, nn) =>
        (got.getOrElse(q, Set.empty) & nn.toSet).size.toDouble / nn.size
      }.sum / exact.size
    }
    val rSq = recall(Sq.search(codes, model, queries, topK = 10))
    val rRerank = recall(
      Sq.searchRerank(codes, model, embeddings, queries, 10, 30))
    info(f"sq-only recall@10 $rSq%.3f, rerank(30) recall@10 $rRerank%.3f")
    assert(rSq >= 0.80, f"sq-only recall floor: $rSq%.3f")
    assert(rRerank >= 0.95, f"rerank recall floor: $rRerank%.3f")
  }

  test("persistence round-trips the model bits and the search results") {
    val model = Sq.train(embeddings)
    val codes = Sq.encode(embeddings, model)
    val dir = java.nio.file.Files.createTempDirectory("sq").toString
    Sq.writeSq(model, codes, dir)
    val (back, codesBack) = Sq.loadSq(spark, dir)
    assert(back.vmin.toSeq == model.vmin.toSeq)
    assert(back.vdelta.toSeq == model.vdelta.toSeq)
    val queries = embeddings.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val a = Sq.search(codes, model, queries, 5).collect().toSeq
    val b = Sq.search(codesBack, back, queries, 5).collect().toSeq
    assert(a == b)
  }

  test("kernels are codegen (no fallback) and the generated Java compiles") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenFallback, GenerateMutableProjection}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val fallback = classOf[CodegenFallback]
    assert(!fallback.isAssignableFrom(classOf[graft.functions.SqEncode]))
    assert(!fallback.isAssignableFrom(classOf[graft.functions.SqDecode]))
    assert(!fallback.isAssignableFrom(classOf[graft.functions.SqDot]))
    val vmin = Array(0f, 0f)
    val vdelta = Array(1f / 255f, 2f / 255f)
    val vec = Literal.create(Seq(0.5f, 1.0f), ArrayType(FloatType))
    val enc = graft.functions.SqEncode(vec, vmin, vdelta)
    val proj = GenerateMutableProjection.generate(Seq(
      graft.functions.SqDot(enc, vec, vmin, vdelta),
      graft.functions.SqDecode(enc, vmin, vdelta)))
    val row = proj(org.apache.spark.sql.catalyst.InternalRow.empty)
    // dot(x, decode(encode(x))) ≈ |x|² within the grid tolerance
    assert(math.abs(row.getDouble(0) - 1.25) < 0.01)
    assert(row.getArray(1).numElements() == 2)
  }

  test("ivf-sq: full probe with deep shortlist equals the flat rerank; " +
      "probed recall holds; disk round-trip; frozen-model append") {
    import org.apache.spark.sql.functions.col
    val kCells = 8
    val idx = Sq.buildIvfSq(embeddings, kCells, iters = 2)
    val queries = embeddings.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    // full probe + corpus-deep shortlist => candidate set is the whole
    // corpus ranked by the SAME asymmetric dot => identical to the flat
    // searchRerank through the same model
    val n = embeddings.count().toInt
    val flat = Sq.searchRerank(Sq.encode(embeddings, idx.model), idx.model,
      embeddings, queries, topK = 10, shortlist = n).collect().toSeq
    val full = Sq.searchIvfSq(idx, queries, embeddings, topK = 10,
      nprobe = kCells, shortlist = n).collect().toSeq
    assert(full == flat, "full-probe IVF-SQ diverged from flat SQ")
    // probed search still recovers most of the full-probe answer
    val probed = Sq.searchIvfSq(idx, queries, embeddings, topK = 10,
      nprobe = 4, shortlist = 50)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val fullSet = full.map(r => (r.getLong(0), r.getLong(2))).toSet
    val rec = (probed & fullSet).size.toDouble / fullSet.size
    info(f"ivf-sq 4/$kCells%d-probe recall vs full: $rec%.3f")
    assert(rec >= 0.5, f"probed recall floor: $rec%.3f")
    // disk round-trip searches identically
    val dir = java.nio.file.Files.createTempDirectory("ivfsq").toString
    Sq.writeIvfSq(idx, dir)
    val back = Sq.loadIvfSq(spark, dir)
    val again = Sq.searchIvfSq(back, queries, embeddings, topK = 10,
      nprobe = kCells, shortlist = n).collect().toSeq
    assert(again == full)
    // append == assigned-at-build-time: cells AND codes identical
    val keep = embeddings.filter(col("vec_id") % 10 =!= 3)
    val extra = embeddings.filter(col("vec_id") % 10 === 3)
    val dir2 = java.nio.file.Files.createTempDirectory("ivfsq2").toString
    val small = Sq.buildIvfSq(keep, kCells, iters = 2)
    Sq.writeIvfSq(small, dir2)
    Sq.appendToIvfSq(spark, dir2, extra)
    val grown = Sq.loadIvfSq(spark, dir2)
    val wantAssign = Ann.nearestCell(
        extra.select(col("vec_id"), col("embedding")), small.centroids)
      .select(col("vec_id"), col("cell_id"),
        graft.functions.SqExpressions.encode(col("embedding"),
          small.model.vmin, small.model.vdelta).as("code"))
      .as[(Long, Int, Array[Byte])].collect()
      .map { case (v, c, b) => (v, c, b.toSeq) }.toSet
    val gotAssign = grown.assignments
      .join(extra.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .select(col("vec_id"), col("cell_id"), col("code"))
      .as[(Long, Int, Array[Byte])].collect()
      .map { case (v, c, b) => (v, c, b.toSeq) }.toSet
    assert(gotAssign == wantAssign, "appended rows differ from build-time")
    // wrong-layout refusal
    intercept[IllegalArgumentException] {
      val ivfDir = java.nio.file.Files.createTempDirectory("ivf").toString
      Ann.writeIvf(Ann.buildIvf(keep, kCells, 2), ivfDir)
      Sq.appendToIvfSq(spark, ivfDir, extra)
    }
  }
}
