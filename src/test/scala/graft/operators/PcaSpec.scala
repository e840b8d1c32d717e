package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.MinHashSignature.splitmix64

/** PCA invariants: orthonormal components, projected variance matching
  * the eigenvalues in descending order, recovery of a planted principal
  * direction, kernel-vs-local projection equality, and the house
  * determinism pin (repartitioning must not move a single bit of the
  * model). */
class PcaSpec extends SparkSuite {

  /** Deterministic anisotropic corpus: a dominant planted direction
    * (all-ones/√dim) with large amplitude, a second orthogonal
    * direction (+1/−1 alternating) with medium amplitude, plus small
    * per-dim noise — known principal axes with well-separated
    * spectrum. */
  private val dim = 16
  private def plantedCorpus(n: Int) = {
    import spark.implicits._
    (0 until n).map { vid =>
      val a = ((splitmix64(vid.toLong * 2 + 1) % 2000) / 100.0f) - 10.0f
      val b = ((splitmix64(vid.toLong * 2 + 2) % 1000) / 100.0f) - 5.0f
      val v = Array.tabulate(dim) { i =>
        val dir1 = 1.0f / math.sqrt(dim.toDouble).toFloat
        val dir2 = (if (i % 2 == 0) 1.0f else -1.0f) /
          math.sqrt(dim.toDouble).toFloat
        val noise = (splitmix64(vid.toLong * 100 + i) % 1000) / 10000.0f
        a * dir1 + b * dir2 + noise + 3.0f // +3: a non-zero mean to center
      }
      (vid.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
  }

  private lazy val corpus = plantedCorpus(2000).localCheckpoint()
  private lazy val model = Pca.train(corpus, kOut = 4)

  test("components are orthonormal") {
    for (r1 <- 0 until model.kOut; r2 <- r1 until model.kOut) {
      var s = 0.0
      var j = 0
      while (j < dim) {
        s += model.components(r1 * dim + j).toDouble *
          model.components(r2 * dim + j)
        j += 1
      }
      val want = if (r1 == r2) 1.0 else 0.0
      assert(math.abs(s - want) < 1e-5, s"W·Wᵀ[$r1][$r2] = $s")
    }
  }

  test("first component recovers the planted dominant direction") {
    // planted dir1 = all-ones/√dim; |cos| with component 0 must be ≈1
    val cos = (0 until dim)
      .map(j => model.components(j).toDouble / math.sqrt(dim.toDouble)).sum
    assert(math.abs(cos) > 0.999, s"cos(pc1, planted) = $cos")
    // canonical sign: dominant coordinate positive → cos is positive
    assert(cos > 0.0, "canonical sign should make the planted cos positive")
    // second component ⊥ first, aligned with the alternating direction
    val cos2 = (0 until dim).map(j => model.components(dim + j).toDouble *
      (if (j % 2 == 0) 1.0 else -1.0) / math.sqrt(dim.toDouble)).sum
    assert(math.abs(cos2) > 0.999, s"cos(pc2, planted2) = $cos2")
  }

  test("projected variance per component matches the eigenvalues, descending") {
    import spark.implicits._
    val pcs = Pca.project(corpus, model).select(col("pc"))
      .as[Array[Float]].collect()
    val n = pcs.length.toDouble
    for (r <- 0 until model.kOut) {
      val mean = pcs.map(_(r).toDouble).sum / n
      val v = pcs.map(p => (p(r) - mean) * (p(r) - mean)).sum / n
      assert(math.abs(v - model.evals(r)) < 0.01 * (model.evals(r) + 1.0),
        s"component $r: projected var $v vs eigenvalue ${model.evals(r)}")
      // projection is centered: per-component mean ≈ 0
      assert(math.abs(mean) < 1e-3, s"component $r mean $mean")
    }
    assert(model.evals.sliding(2).forall(w => w(0) >= w(1) - 1e-12),
      s"eigenvalues not descending: ${model.evals.mkString(",")}")
    assert(model.varianceExplained > 0.99,
      s"4 components should capture the 2-factor corpus: " +
        s"${model.varianceExplained}")
  }

  test("kernel projection ≡ local reference, bit-for-bit") {
    import spark.implicits._
    val got = Pca.project(corpus, model)
      .select(col("vec_id"), col("pc")).as[(Long, Array[Float])]
      .collect().toMap
    val raw = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    raw.foreach { case (vid, v) =>
      val want = Array.tabulate(model.kOut) { r =>
        var s = 0.0
        var j = 0
        while (j < dim) {
          s += model.components(r * dim + j).toDouble *
            (v(j).toDouble - model.mean(j))
          j += 1
        }
        s.toFloat
      }
      assert(java.util.Arrays.equals(got(vid), want),
        s"vec $vid: ${got(vid).mkString(",")} vs ${want.mkString(",")}")
    }
  }

  test("training is partitioning-independent bit-for-bit") {
    val m2 = Pca.train(corpus.repartition(7), kOut = 4)
    assert(java.util.Arrays.equals(model.components, m2.components))
    assert(java.util.Arrays.equals(model.mean, m2.mean))
    assert(java.util.Arrays.equals(model.evals, m2.evals))
  }

  test("model write → load round-trips bit-for-bit; CLI reduce lands both") {
    val dir = java.nio.file.Files.createTempDirectory("pca").toString
    Pca.write(spark, model, s"$dir/model")
    val back = Pca.load(spark, s"$dir/model")
    assert(java.util.Arrays.equals(model.components, back.components))
    assert(java.util.Arrays.equals(model.mean, back.mean))
    assert(java.util.Arrays.equals(model.evals, back.evals))
    assert((back.dim, back.kOut, back.totalVariance) ==
      ((model.dim, model.kOut, model.totalVariance)))
    // CLI path: reduce writes model + projected corpus
    corpus.write.mode("overwrite").parquet(s"$dir/emb")
    graft.CliMain.main(Array("reduce", s"$dir/emb", s"$dir/out",
      "--k", "4"))
    val cliModel = Pca.load(spark, s"$dir/out")
    assert(java.util.Arrays.equals(model.components, cliModel.components))
    val projected = spark.read.parquet(s"$dir/out/projected")
    assert(projected.count() == 2000)
    assert(projected.columns.toSeq == Seq("vec_id", "pc"))
  }
}
