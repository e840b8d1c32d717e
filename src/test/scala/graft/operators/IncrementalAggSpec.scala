package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Incremental rollup maintenance: absorbing a raw delta into the
  * landed aggregate table ≡ the from-scratch rollup over the union
  * history, with only key-overlapping files rewritten. */
class IncrementalAggSpec extends SparkSuite {

  import spark.implicits._

  private val aggs = Seq[(String, Skew.ReAgg)](
    "n" -> Skew.CountRows(),
    "total" -> Skew.SumOf(col("amount")),
    "hi" -> Skew.MaxOf(col("amount")),
    "lo" -> Skew.MinOf(col("amount")))

  private def sorted(df: org.apache.spark.sql.DataFrame)
      : Seq[(Long, Long, Long, Long, Long)] =
    df.select("k", "n", "total", "hi", "lo")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("increment ≡ from-scratch rollup; only touched files rewrite") {
    val root = Files.createTempDirectory("incagg").toString
    // H1: 40 keys range-clustered into 4 files; amounts are integer
    // micro-units (the exactness contract)
    val h1 = spark.range(400).select((col("id") % 40).as("k"),
      (col("id") * 17 % 1000).as("amount"))
    // deterministic two-file layout: keys [0,20) and [20,40) — the
    // delta's keys live entirely in the first
    val landed = IncrementalAgg.rollup(h1, Seq("k"), aggs)
      .localCheckpoint()
    landed.filter(col("k") < 20).coalesce(1)
      .write.parquet(s"$root/table")
    landed.filter(col("k") >= 20).coalesce(1)
      .write.mode("append").parquet(s"$root/table")
    // delta: new events for keys 0..9 (first file's range) + new key 77
    val h2 = spark.range(50).select((col("id") % 10).as("k"),
        (col("id") * 31 % 1000 + 1000).as("amount"))
      .unionByName(Seq((77L, 5L)).toDF("k", "amount"))
    h2.write.parquet(s"$root/delta")
    val st = IncrementalAgg.increment(spark, s"$root/table",
      s"$root/delta", s"$root/out", Seq("k"), aggs)
    assert(st.filesRewritten == 1 && st.filesCopied == 1,
      s"pruning failed: $st")
    assert(st.keysMerged == 10 && st.keysInserted == 1, s"$st")
    val got = sorted(spark.read.parquet(s"$root/out"))
    val want = sorted(IncrementalAgg.rollup(h1.unionByName(h2),
      Seq("k"), aggs))
    assert(got == want, s"got=$got\nwant=$want")
    // the new key landed as its own group
    assert(got.exists(_ == ((77L, 1L, 5L, 5L, 5L))))
  }

  test("all-new keys append without touching any landed file") {
    val root = Files.createTempDirectory("incagg-new").toString
    val h1 = Seq((1L, 10L), (2L, 20L)).toDF("k", "amount")
    IncrementalAgg.rollup(h1, Seq("k"), aggs).coalesce(1)
      .write.parquet(s"$root/table")
    Seq((9L, 1L), (9L, 2L)).toDF("k", "amount")
      .write.parquet(s"$root/delta")
    val st = IncrementalAgg.increment(spark, s"$root/table",
      s"$root/delta", s"$root/out", Seq("k"), aggs)
    assert(st.filesRewritten == 0 && st.filesCopied == 1 &&
      st.keysMerged == 0 && st.keysInserted == 1, s"$st")
    assert(sorted(spark.read.parquet(s"$root/out")) ==
      Seq((1L, 1L, 10L, 10L, 10L), (2L, 1L, 20L, 20L, 20L),
        (9L, 2L, 3L, 2L, 1L)))
  }

  test("a landed table that is not the rollup shape is rejected") {
    val root = Files.createTempDirectory("incagg-shape").toString
    Seq((1L, 2L)).toDF("k", "wrong").write.parquet(s"$root/table")
    Seq((1L, 3L)).toDF("k", "amount").write.parquet(s"$root/delta")
    intercept[IllegalArgumentException] {
      IncrementalAgg.increment(spark, s"$root/table", s"$root/delta",
        s"$root/out", Seq("k"), aggs)
    }
  }
}
