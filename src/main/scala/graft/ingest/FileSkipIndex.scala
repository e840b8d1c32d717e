package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file Bloom sidecars — point-lookup file skipping on columns the
  * table is NOT clustered by. Range/z-order layouts (RangeSink,
  * ZOrder.compact, Hilbert) already prune the CLUSTERED key: a
  * min/max-disjoint file set makes the data-skipping story for range
  * predicates. A point lookup on any OTHER column still scans every
  * file at 100 TB; this index bounds it to the files whose Bloom
  * filter claims the key, with the filter's no-false-negative
  * guarantee making the pruning LOSSLESS (a skipped file provably
  * does not hold the key; a false positive only costs one extra file
  * read at the sidecar's measured ε).
  *
  * The sidecar is [[graft.operators.Bloom]]'s (word_idx, bits)
  * encoding grouped per file — one aggregation over the indexed
  * column (`input_file_name` is the grouping key, `bit_or` the fold,
  * so it partial-aggregates map-side like every sketch here), landed
  * as `<table>/_graft_index/<column>/` parquet + a 1-row meta frame
  * pinning (mBits, k). Values hash AS STRINGS (one canonical form —
  * the probe side must hash identically, and a long-vs-string
  * xxhash64 mismatch would be a silent always-miss).
  *
  * Probing never scans the table: the lookup keys (point lookups are
  * small by definition) explode to k probe bits, join the
  * metadata-sized sidecar per file, and a file is a candidate iff ALL
  * k bits are set for SOME key. [[lookup]] then reads candidates only
  * and applies the EXACT predicate — false positives die there.
  * Rebuild after maintenance passes (the sidecar is keyed by file
  * name; [[build]] overwrites). For a [[TableLog]]-versioned table,
  * index the CURRENT snapshot by passing its manifest's files to a
  * plain read first — building over the raw directory would index
  * every retained version's files. FileSkipIndexSpec pins losslessness
  * (lookup ≡ full scan, incl. keys absent everywhere) and the
  * single-file pruning on a planted layout. */
object FileSkipIndex {

  final case class Meta(column: String, mBits: Long, k: Int)

  private def indexDir(tableDir: String, column: String): String =
    s"$tableDir/_graft_index/$column"

  /** One aggregation pass: per-file Bloom words over the column. */
  def build(spark: SparkSession, tableDir: String, column: String,
      mBits: Long = 1L << 20, k: Int = 4): Unit = {
    require(mBits % 64 == 0 && mBits > 0 && k >= 1)
    import spark.implicits._
    spark.read.parquet(tableDir)
      .select(col(column).cast("string").as("g"))
      .withColumn("file", input_file_name())
      .select(col("file"), col("g"),
        explode(sequence(lit(0), lit(k - 1))).as("r"))
      .select(col("file"),
        pmod(xxhash64(col("r"), col("g")), lit(mBits)).as("bit"))
      .groupBy(col("file"), (col("bit") / 64).cast("long").as("word_idx"))
      .agg(expr("bit_or(shiftleft(1L, int(bit % 64)))").as("bits"))
      .write.mode("overwrite").parquet(indexDir(tableDir, column))
    Seq((column, mBits, k)).toDF("column", "mBits", "k")
      .write.mode("overwrite")
      .parquet(s"${indexDir(tableDir, column)}_meta")
  }

  def meta(spark: SparkSession, tableDir: String, column: String): Meta = {
    import spark.implicits._
    val Seq((c, m, k)) = spark.read
      .parquet(s"${indexDir(tableDir, column)}_meta")
      .as[(String, Long, Int)].collect().toSeq
    Meta(c, m, k)
  }

  /** Files that MIGHT hold any of `keys` — every file truly holding
    * one is returned (no false negatives); the table itself is never
    * scanned. */
  def candidateFiles(spark: SparkSession, tableDir: String,
      column: String, keys: Seq[String]): Seq[String] = {
    if (keys.isEmpty) return Seq.empty
    import spark.implicits._
    val m = meta(spark, tableDir, column)
    val idx = spark.read.parquet(indexDir(tableDir, column))
    val probes = keys.distinct.toDF("g")
      .select(col("g"), explode(sequence(lit(0), lit(m.k - 1))).as("r"))
      .select(col("g"), col("r"),
        pmod(xxhash64(col("r"), col("g")), lit(m.mBits)).as("bit"))
      .select(col("g"), col("r"),
        (col("bit") / 64).cast("long").as("word_idx"),
        expr("shiftleft(1L, int(bit % 64))").as("mask"))
    // a key hits a file iff EVERY one of its k probes is satisfied:
    // each (g, r) probe has exactly one word, and idx is unique per
    // (file, word), so satisfied probes count 1:1 — keeping r in the
    // frame matters, or two probes landing on the same bit would
    // collapse and under-count into a false negative
    idx.join(broadcast(probes), Seq("word_idx"))
      .filter((col("bits").bitwiseAND(col("mask"))) === col("mask"))
      .groupBy("file", "g").agg(count(lit(1)).as("hits"))
      .filter(col("hits") === m.k)
      .select("file").distinct()
      .as[String].collect().toSeq
  }

  /** Pruned point lookup: read candidate files only, then the exact
    * predicate (false positives die here; skipped files provably held
    * nothing). */
  def lookup(spark: SparkSession, tableDir: String, column: String,
      keys: Seq[String]): DataFrame = {
    val schema = spark.read.parquet(tableDir).schema
    val files = candidateFiles(spark, tableDir, column, keys)
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
      .filter(col(column).cast("string").isin(keys: _*))
  }
}
