package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Per-file Bloom skipping: lossless (lookup ≡ full scan, keys absent
  * everywhere included) and actually pruning (a key living in one file
  * reads one file). */
class FileSkipIndexSpec extends SparkSuite {

  import spark.implicits._

  test("lookup ≡ full scan; single-file keys read a single file") {
    val root = Files.createTempDirectory("skipidx").toString
    // clustered by k in 4 deterministic files; the INDEXED column v is
    // anti-correlated with the layout (v = 9999 - k), so min/max
    // pruning on k can never serve a v lookup — the bloom must
    (0 until 4).foreach { f =>
      spark.range(f * 250, (f + 1) * 250)
        .select(col("id").as("k"), (lit(9999) - col("id")).as("v"))
        .coalesce(1).write.mode("append").parquet(s"$root/t")
    }
    FileSkipIndex.build(spark, s"$root/t", "v", mBits = 1L << 16, k = 4)

    // point lookups across three files + a key absent everywhere
    val keys = Seq("9999", "9700", "9200", "123456")
    val got = FileSkipIndex.lookup(spark, s"$root/t", "v", keys)
      .select("k", "v").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val want = spark.read.parquet(s"$root/t")
      .filter(col("v").cast("string").isin(keys: _*))
      .select("k", "v").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(want.size == 3 && got == want, s"got=$got want=$want")

    // pruning: each present key lives in exactly one file — with
    // 250 keys/file in 2^16 bits the planted layout resolves to one
    // candidate (deterministic: xxhash64 is fixed)
    val one = FileSkipIndex.candidateFiles(spark, s"$root/t", "v",
      Seq("9999"))
    assert(one.size == 1, s"expected 1 candidate file, got $one")
    // the absent key prunes everything — zero files, zero rows
    assert(FileSkipIndex.candidateFiles(spark, s"$root/t", "v",
      Seq("123456")).isEmpty)
    val empty = FileSkipIndex.lookup(spark, s"$root/t", "v",
      Seq("123456"))
    assert(empty.count() == 0 &&
      empty.columns.toSeq == Seq("k", "v"))

    // no false negatives over EVERY key in the table (the guarantee,
    // not a sample): each key's candidate set contains its file
    val allCands = FileSkipIndex.candidateFiles(spark, s"$root/t", "v",
      (9000 to 9999).map(_.toString))
    val gotAll = FileSkipIndex.lookup(spark, s"$root/t", "v",
      (9000 to 9999).map(_.toString)).count()
    assert(gotAll == 1000L, s"lost rows to skipping: $gotAll")
    assert(allCands.size == 4)
  }

  test("duplicate lookup keys and shared probe bits stay lossless") {
    val root = Files.createTempDirectory("skipidx-dup").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$root/t")
    // tiny filter forces probe-bit collisions within a key
    FileSkipIndex.build(spark, s"$root/t", "v", mBits = 64, k = 6)
    val got = FileSkipIndex.lookup(spark, s"$root/t", "v",
      Seq("a", "a", "b"))
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L), s"$got")
  }
}
