package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Count-min sketch guarantees, pinned against exact counts: estimates
  * never undercount, the ε·N bound holds, and shard sketches merge to
  * the whole-corpus sketch (the property that makes it distributable). */
class SketchSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private val D = 4
  private val W = 1024

  private def tokens = spark.read.parquet(s"$sf/documents.parquet")
    .select(explode(split(col("text"), " ")).as("token"))

  test("estimates overcount only, within the eps*N bound") {
    import spark.implicits._
    val exact = tokens.groupBy("token").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val sketch = Sketch.countMin(tokens, "token", D, W)
    val est = Sketch.estimate(sketch, tokens.distinct(), "token", D, W)
      .as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet)
    val epsN = math.ceil(math.E / W * n).toLong
    est.foreach { case (t, e) =>
      assert(e >= exact(t), s"CMS undercounted '$t': $e < ${exact(t)}")
      assert(e - exact(t) <= epsN,
        s"'$t' overcount ${e - exact(t)} beyond eps*N = $epsN")
    }
  }

  test("shard sketches merge bucketwise to the whole-corpus sketch") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def tok(f: org.apache.spark.sql.DataFrame) =
      f.select(explode(split(col("text"), " ")).as("token"))
    val sA = Sketch.countMin(tok(docs.filter(col("doc_id") % 2 === 0)),
      "token", D, W)
    val sB = Sketch.countMin(tok(docs.filter(col("doc_id") % 2 === 1)),
      "token", D, W)
    val merged = sA.union(sB).groupBy("r", "bucket")
      .agg(sum("c").as("c"))
      .as[(Int, Long, Long)].collect().toSet
    val whole = Sketch.countMin(tokens, "token", D, W)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("the sketch is bounded by d*w rows however large the input") {
    val sketch = Sketch.countMin(tokens, "token", D, W)
    assert(sketch.count() <= D.toLong * W)
  }

  // ---- DDSketch ----------------------------------------------------

  private val Alpha = 0.01

  private def prices = spark.read.parquet(s"$sf/lineitem.parquet")
    .select(col("l_extendedprice").cast("double").as("v"))

  test("ddsketch quantiles hold the alpha relative-error guarantee") {
    import spark.implicits._
    val exact = prices.as[Double].collect().sorted
    val n = exact.length
    val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val sketch = Sketch.ddSketch(prices, "v", Alpha)
    val est = Sketch.ddQuantiles(sketch, Alpha, qs)
      .as[(Double, Double)].collect().toMap
    qs.foreach { q =>
      val x = exact(math.ceil(q * n).toInt - 1)
      val e = est(q)
      assert(math.abs(e - x) <= Alpha * x,
        s"q=$q: est $e vs exact $x beyond alpha*$x")
    }
  }

  test("ddsketch shards merge bucketwise to the whole sketch") {
    import spark.implicits._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"),
        col("l_extendedprice").cast("double").as("v"))
    val sA = Sketch.ddSketch(li.filter(col("l_orderkey") % 2 === 0), "v", Alpha)
    val sB = Sketch.ddSketch(li.filter(col("l_orderkey") % 2 === 1), "v", Alpha)
    val merged = sA.union(sB).groupBy("bucket").agg(sum("c").as("c"))
      .as[(Long, Long)].collect().toSet
    val whole = Sketch.ddSketch(prices, "v", Alpha)
      .as[(Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("ddsketch bucket count is log-bounded, not value-count-bounded") {
    val sketch = Sketch.ddSketch(prices, "v", Alpha)
    val gamma = (1 + Alpha) / (1 - Alpha)
    val mm = prices.agg(min("v"), max("v")).collect()(0)
    val bound = math.ceil(
      math.log(mm.getDouble(1) / mm.getDouble(0)) / math.log(gamma)) + 2
    assert(sketch.count() <= bound.toLong,
      s"${sketch.count()} buckets vs log bound $bound")
  }

  // ---- HyperLogLog -------------------------------------------------

  test("hll estimate lands within the standard-error band of exact") {
    import spark.implicits._
    val p = 12 // se ≈ 1.6%
    // corpus tokens (small cardinality — linear-counting regime)
    val exact = tokens.distinct().count()
    val est = Sketch.hllEstimate(Sketch.hll(tokens, "token", p), p)
    val err = math.abs(est - exact).toDouble / exact
    info(f"hll p=$p corpus: est $est vs exact $exact (err ${err * 100}%.2f%%)")
    assert(err <= 0.05, f"error ${err * 100}%.2f%% beyond 3x the 1.6%% se")
    // 200k synthetic distincts — the raw-estimate regime the corpus's
    // tiny vocabulary never reaches
    val big = spark.range(200000)
      .select(concat(lit("t"), col("id")).as("token"))
    val estBig = Sketch.hllEstimate(Sketch.hll(big, "token", p), p)
    val errBig = math.abs(estBig - 200000L).toDouble / 200000
    info(f"hll p=$p 200k: est $estBig (err ${errBig * 100}%.2f%%)")
    assert(errBig <= 0.05,
      f"200k error ${errBig * 100}%.2f%% beyond 3x the 1.6%% se")
  }

  test("hll shards merge by bucketwise max to the whole-corpus registers") {
    import spark.implicits._
    val p = 10
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def tok(f: org.apache.spark.sql.DataFrame) =
      f.select(explode(split(col("text"), " ")).as("token"))
    val sA = Sketch.hll(tok(docs.filter(col("doc_id") % 2 === 0)),
      "token", p)
    val sB = Sketch.hll(tok(docs.filter(col("doc_id") % 2 === 1)),
      "token", p)
    val merged = sA.union(sB).groupBy("bucket").agg(max("rho").as("rho"))
      .as[(Int, Int)].collect().toSet
    val whole = Sketch.hll(tokens, "token", p)
      .as[(Int, Int)].collect().toSet
    assert(merged == whole)
    // registers are bounded by 2^p however large the corpus
    assert(whole.size <= (1 << p))
  }

  test("hll small-range correction: tiny sets estimate near-exactly") {
    import spark.implicits._
    val tiny = (1 to 40).map(i => s"tok$i").toDF("token")
    val est = Sketch.hllEstimate(Sketch.hll(tiny, "token", 12), 12)
    assert(math.abs(est - 40L) <= 2, s"tiny-set estimate $est vs 40")
    intercept[IllegalArgumentException] { Sketch.hll(tiny, "token", 2) }
  }

  test("ddsketch ignores non-positive values and rejects bad alpha") {
    import spark.implicits._
    val vals = Seq(-3.0, 0.0, 1.0, 10.0).toDF("v")
    assert(Sketch.ddSketch(vals, "v", Alpha).agg(sum("c")).collect()(0)
      .getLong(0) == 2L)
    intercept[IllegalArgumentException] {
      Sketch.ddSketch(vals, "v", 1.5)
    }
    intercept[IllegalArgumentException] {
      Sketch.ddQuantiles(Sketch.ddSketch(vals, "v", Alpha), Alpha, Seq(0.0))
    }
  }

  // ---- Misra-Gries -------------------------------------------------

  test("mg summary: guaranteed superset with bounded undercount") {
    import spark.implicits._
    val k = 50
    val exact = tokens.groupBy("token").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val mg = Sketch.mgSummary(tokens, "token", k)
      .as[(String, Long)].collect().toMap
    // lower bounds never exceed truth; undercount bounded by N/(k+1)
    mg.foreach { case (t, cLow) =>
      assert(cLow <= exact(t), s"$t: $cLow over true ${exact(t)}")
      assert(exact(t) - cLow <= n / (k + 1) + 1,
        s"$t undercount ${exact(t) - cLow} breaks the N/(k+1) bound")
    }
    // every item above the threshold is present
    exact.foreach { case (t, c) =>
      if (c > n / (k + 1))
        assert(mg.contains(t), s"frequent $t (c=$c) missing from summary")
    }
  }

  test("mg two-pass exact heavy hitters equal the exact groupBy") {
    import spark.implicits._
    val want = {
      val cnt = tokens.groupBy("token").agg(count(lit(1)).as("c"))
      val n = tokens.count()
      cnt.filter(col("c") * 200 >= n).as[(String, Long)].collect().toSet
    }
    val got = Sketch.exactHeavyHitters(tokens, "token", 1, 200)
      .as[(String, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
    // exactness is partitioning-independent even though MG counts are not
    val gotRepart = Sketch.exactHeavyHitters(
      tokens.repartition(13), "token", 1, 200)
      .as[(String, Long)].collect().toSet
    assert(gotRepart == want)
  }

  test("kmv: exact below k, SE band above it, deterministic under " +
      "repartitioning") {
    import spark.implicits._
    val k = 1024
    // ≤ k distincts: the sketch IS the distinct hash set -> exact
    val small = spark.range(700).select(concat(lit("s"), col("id")).as("t"))
    assert(Sketch.kmvEstimate(Sketch.kmv(small, "t", k), k) == 700.0)
    // 50k distincts: relative error within 3x the 1/sqrt(k-2) SE
    val big = spark.range(50000).select(concat(lit("b"), col("id")).as("t"))
      .union(spark.range(10000).select(concat(lit("b"), col("id")).as("t")))
    val est = Sketch.kmvEstimate(Sketch.kmv(big, "t", k), k)
    val err = math.abs(est - 50000) / 50000.0
    info(f"kmv k=$k 50k: est $est%.0f (err ${err * 100}%.2f%%)")
    assert(err <= 3.0 / math.sqrt(k - 2.0), f"err ${err * 100}%.2f%%")
    // partitioning independence: the k smallest distinct hashes are a
    // set property — bit-identical sketch at any layout
    val a = Sketch.kmv(big.repartition(3), "t", k).as[Long].collect().toSeq
    val b = Sketch.kmv(big.repartition(17), "t", k).as[Long].collect().toSeq
    assert(a == b && a.length == k)
  }

  test("kmv merge is LOSSLESS: merged shard sketches equal the " +
      "whole-corpus sketch bit-for-bit") {
    import spark.implicits._
    val k = 256
    val whole = spark.range(20000)
      .select(concat(lit("m"), col("id")).as("t"))
    val left = spark.range(12000).select(concat(lit("m"), col("id")).as("t"))
    val right = spark.range(8000, 20000)
      .select(concat(lit("m"), col("id")).as("t")) // overlaps left
    val merged = Sketch.kmvMerge(
      Sketch.kmv(left, "t", k), Sketch.kmv(right, "t", k), k)
      .as[Long].collect().toSeq
    val direct = Sketch.kmv(whole, "t", k).as[Long].collect().toSeq
    assert(merged == direct)
  }

  test("kmv theta intersection and jaccard: the set ops HLL cannot " +
      "answer, exact in the small regime and banded in the large") {
    import spark.implicits._
    val k = 1024
    // small/exact: overlap 200, union 800 ≤ k — both ops degrade to
    // exact set arithmetic
    val a1 = spark.range(500).select(concat(lit("x"), col("id")).as("t"))
    val b1 = spark.range(300, 800)
      .select(concat(lit("x"), col("id")).as("t"))
    val ka1 = Sketch.kmv(a1, "t", k)
    val kb1 = Sketch.kmv(b1, "t", k)
    assert(Sketch.kmvIntersectEstimate(ka1, kb1, k) == 200.0)
    assert(math.abs(Sketch.kmvJaccard(ka1, kb1, k) - 200.0 / 800.0) < 1e-12)
    // large: |A| = |B| = 40k, overlap 20k, union 60k
    val a2 = spark.range(40000).select(concat(lit("y"), col("id")).as("t"))
    val b2 = spark.range(20000, 60000)
      .select(concat(lit("y"), col("id")).as("t"))
    val ka2 = Sketch.kmv(a2, "t", k)
    val kb2 = Sketch.kmv(b2, "t", k)
    val inter = Sketch.kmvIntersectEstimate(ka2, kb2, k)
    val jac = Sketch.kmvJaccard(ka2, kb2, k)
    val interErr = math.abs(inter - 20000) / 20000.0
    val jacErr = math.abs(jac - 20000.0 / 60000.0) / (20000.0 / 60000.0)
    info(f"kmv intersect est $inter%.0f (err ${interErr * 100}%.2f%%), " +
      f"jaccard $jac%.4f (err ${jacErr * 100}%.2f%%)")
    // intersection SE is on the coarser retained sample — allow 5x
    assert(interErr <= 5.0 / math.sqrt(k - 2.0))
    assert(jacErr <= 5.0 / math.sqrt(k - 2.0))
  }

  test("mg summary state is bounded by k rows per partition") {
    import spark.implicits._
    val big = spark.range(0L, 100000L)
      .selectExpr("concat('t', cast(id % 5000 as string)) as token")
      .repartition(8)
    val mg = Sketch.mgSummary(big, "token", 20)
    assert(mg.count() <= 20L * 8)
  }
}
