package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.queries.Llm

/** The DBSCAN scale path: the IVF cell equi-join generator must be
  * EXACTLY the all-pairs ε-join at full probe (that identity is what
  * lets q_dbscan_ivf share q_dbscan's recursive-CTE oracle), degrade
  * gracefully under partial probes on clustered data, and never plan a
  * cartesian. */
class DbscanSpec extends SparkSuite {

  private val dim = 48

  /** Clustered unit vectors: kGroups planted directions, members
    * perturbed deterministically (ProfileEmbedDedup's generator shape,
    * inlined so the fixture is self-contained). */
  private def corpus(n: Int, kGroups: Int) = {
    import spark.implicits._
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def gauss(seed: Long): Double = {
      val u1 = ((mix(seed).abs % 1000000) + 1) / 1000001.0
      val u2 = (mix(seed * 31 + 7).abs % 1000000) / 1000000.0
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }
    val cents = Array.tabulate(kGroups) { c =>
      val v = Array.tabulate(dim)(j => gauss(c.toLong * 1009 + j))
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / nrm).toFloat)
    }
    (0 until n).map { i =>
      val g = (mix(i.toLong).abs % kGroups).toInt
      val v = Array.tabulate(dim)(j =>
        cents(g)(j) + 0.25 * gauss(i.toLong * 131 + j * 17))
      val nrm = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(x => (x / nrm).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
  }

  test("full-probe cell join ≡ all-pairs ε-join (the oracle-sharing identity)") {
    val emb = corpus(300, 6).localCheckpoint()
    val exact = pairSet(Dbscan.epsPairsExact(emb, eps = 0.35))
    val ivf = pairSet(
      Dbscan.epsPairsIvf(emb, eps = 0.35, kCells = 8, probes = 8))
    assert(ivf == exact,
      s"full probe diverged: ${ivf.size} vs ${exact.size} pairs, " +
        s"missing=${(exact -- ivf).take(5)} extra=${(ivf -- exact).take(5)}")
    assert(exact.nonEmpty, "degenerate fixture: no ε-pairs at all")
  }

  test("partial probes keep high edge recall on clustered data") {
    val emb = corpus(600, 8).localCheckpoint()
    val exact = pairSet(Dbscan.epsPairsExact(emb, eps = 0.45))
    // 2 of 8 cells scanned per query — ε-near pairs share coarse cells
    // on clustered data (the SemDedup regime), so recall stays high
    // while candidate volume drops 4×
    val got = pairSet(
      Dbscan.epsPairsIvf(emb, eps = 0.45, kCells = 8, probes = 2))
    assert(got.subsetOf(exact), "cell join invented a pair above ε")
    val recall = got.size.toDouble / exact.size
    assert(exact.size > 1000, s"fixture too sparse: ${exact.size} pairs")
    assert(recall >= 0.9, f"edge recall $recall%.3f < 0.9 " +
      s"(${got.size}/${exact.size})")
  }

  test("q_dbscan_ivf ≡ q_dbscan end-to-end on a written corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dbscan-ivf").toString
    corpus(250, 5).withColumn("label", lit(0))
      .write.parquet(s"$dir/embeddings.parquet")
    val base = Llm.queries("q_dbscan")(spark, dir)
      .as[(Long, Long, Int)].collect().toSeq
    val ivf = Llm.queries("q_dbscan_ivf")(spark, dir)
      .as[(Long, Long, Int)].collect().toSeq
    assert(ivf == base, "bucketed DBSCAN diverged from the baseline")
    // the labeling is non-trivial on this fixture: clusters exist
    assert(base.exists(_._3 == 1), "no cores — degenerate fixture")
    assert(base.map(_._2).distinct.size > 1, "single-cluster fixture")
  }

  test("q_dbscan_ivf plans no cartesian (the scale guard)") {
    val plan = graft.SparkEntry.queries("q_dbscan_ivf")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"ε-candidates regressed to a cartesian:\n${plan.take(3000)}")
  }
}
