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
  *
  * VERSIONED TABLES (r16): [[build]]/[[lookup]] take a PLAIN flat
  * directory and fail loudly on a [[TableLog]]-versioned one —
  * indexing the raw directory would fold every retained version's
  * files in and lookup would silently return superseded rows. Use
  * [[buildFiles]] over `TableLog.snapshotFiles`, [[refresh]] after a
  * maintenance commit (re-aggregates ONLY files the snapshot added —
  * the touched set is computed as sidecar∖snapshot, so it is the
  * provable delta, the zero-copy discipline applied to the index),
  * and [[lookupSnapshot]] to probe a snapshot under its recorded
  * schema. [[lookupSnapshot]] is lossless UNCONDITIONALLY (r17):
  * snapshot files the sidecar does not index cannot be proven
  * key-free, so they scan alongside the Bloom candidates — a missed
  * refresh or a time travel past the sidecar's coverage costs
  * pruning, never rows. FileSkipIndexSpec pins losslessness (lookup
  * ≡ full scan, incl. keys absent everywhere), the single-file
  * pruning on a planted layout, and refresh ≡ rebuild after an
  * upsert. */
object FileSkipIndex {

  final case class Meta(column: String, mBits: Long, k: Int)
  final case class RefreshStats(filesDropped: Int, filesIndexed: Int,
    filesKept: Int)

  private def indexDir(tableDir: String, column: String): String =
    s"$tableDir/_graft_index/$column"

  private def requireUnversioned(spark: SparkSession, tableDir: String,
      op: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(tableDir, "_graft_log")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!f.exists(p),
      s"$tableDir is TableLog-versioned: $op over the raw directory " +
        "would mix every retained version's files (silent stale/" +
        "duplicate rows); use buildFiles/refresh/lookupSnapshot with " +
        "the snapshot's file list instead")
  }

  /** The per-file Bloom aggregation over an explicit file list. */
  private def bloomRows(spark: SparkSession, files: Seq[String],
      column: String, mBits: Long, k: Int): DataFrame =
    spark.read.parquet(files: _*)
      .select(col(column).cast("string").as("g"))
      .withColumn("file", input_file_name())
      .select(col("file"), col("g"),
        explode(sequence(lit(0), lit(k - 1))).as("r"))
      .select(col("file"),
        pmod(xxhash64(col("r"), col("g")), lit(mBits)).as("bit"))
      .groupBy(col("file"), (col("bit") / 64).cast("long").as("word_idx"))
      .agg(expr("bit_or(shiftleft(1L, int(bit % 64)))").as("bits"))

  /** One aggregation pass: per-file Bloom words over the column of a
    * PLAIN flat table directory ([[buildFiles]] for versioned). */
  def build(spark: SparkSession, tableDir: String, column: String,
      mBits: Long = 1L << 20, k: Int = 4): Unit = {
    requireUnversioned(spark, tableDir, "build")
    buildFiles(spark, tableDir, column,
      graft.operators.Upsert.listFlat(spark, tableDir).map(_.toString),
      mBits, k)
  }

  /** Build the sidecar over an EXPLICIT file list — the
    * [[TableLog]] form: pass `TableLog.snapshotFiles(...)` so only
    * the CURRENT snapshot's files are indexed. */
  def buildFiles(spark: SparkSession, tableDir: String, column: String,
      files: Seq[String], mBits: Long = 1L << 20, k: Int = 4): Unit = {
    require(mBits % 64 == 0 && mBits > 0 && k >= 1)
    require(files.nonEmpty, "empty file list")
    import spark.implicits._
    bloomRows(spark, files, column, mBits, k)
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

  private def nameOf(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = substring_index(c, "/", -1)

  /** INCREMENTAL maintenance after a [[TableLog]] commit: keep
    * sidecar rows for files still in the head snapshot, drop rows for
    * files the snapshot no longer references, and aggregate ONLY the
    * snapshot's new files. The delta is computed from the sidecar
    * itself vs the snapshot list — provably the touched set, no
    * caller bookkeeping — so a maintenance pass that rewrote 2 of a
    * million files costs a 2-file aggregation, not a table rebuild
    * ([[buildFiles]] stays for full re-clustering). */
  def refresh(spark: SparkSession, tableDir: String, column: String,
      version: Option[Int] = None): RefreshStats = {
    import spark.implicits._
    val m = meta(spark, tableDir, column)
    // allowDvs: indexing raw files over active deletion vectors only
    // ADDS candidates (a DV'd row's key still hits its file's Bloom);
    // lookupSnapshot applies the DVs, so no deleted row escapes
    val snapshot = TableLog.snapshotFiles(spark, tableDir, version,
      allowDvs = true)
    val snapNames = snapshot.map(f =>
      new org.apache.hadoop.fs.Path(f).getName)
    val idx = spark.read.parquet(indexDir(tableDir, column))
    val indexedNames = idx.select(nameOf(col("file")).as("n"))
      .distinct().as[String].collect().toSet
    // kept rows via a JOIN against a names frame, never an
    // isin(snapNames: _*) literal list — at millions of files that
    // In-expression is O(table) plan size on the driver
    val keep = keptRows(spark, idx, snapNames)
    val added = snapshot.filterNot(f =>
      indexedNames.contains(new org.apache.hadoop.fs.Path(f).getName))
    val fresh =
      if (added.isEmpty) keep
      else keep.unionByName(
        bloomRows(spark, added, column, m.mBits, m.k))
    // the sidecar is metadata-sized: materialize before overwriting
    // the directory the plan reads from
    fresh.localCheckpoint()
      .write.mode("overwrite").parquet(indexDir(tableDir, column))
    RefreshStats(
      filesDropped = (indexedNames -- snapNames).size,
      filesIndexed = added.size,
      filesKept = (indexedNames & snapNames.toSet).size)
  }

  /** Sidecar rows whose file NAME is in `snapNames`, as a semi-join
    * against a names frame: a literal In-list would put one literal
    * per table file into the plan (driver-side O(table) at the
    * millions-of-files target). Package-private so the spec can pin
    * the plan shape. */
  private[ingest] def keptRows(spark: SparkSession, idx: DataFrame,
      snapNames: Seq[String]): DataFrame = {
    import spark.implicits._
    idx.join(snapNames.toDF("__snap_name"),
      nameOf(col("file")) === col("__snap_name"), "left_semi")
  }

  /** Refresh EVERY sidecar under `<tableDir>/_graft_index/` against
    * a snapshot (default head) — the post-commit hook the streaming
    * maintenance pipelines call so indexes follow the stream instead
    * of trailing it (lookups are lossless either way since r17; a
    * fresh sidecar just keeps them PRUNED). No-op without indexes. */
  def refreshAll(spark: SparkSession, tableDir: String,
      version: Option[Int] = None): Map[String, RefreshStats] = {
    val root = new org.apache.hadoop.fs.Path(tableDir, "_graft_index")
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(root)) Map.empty
    else f.listStatus(root).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(_.endsWith("_meta"))
      .map(c => c -> refresh(spark, tableDir, c, version)).toMap
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

  /** Pruned point lookup on a PLAIN flat table: read candidate files
    * only, then the exact predicate (false positives die here;
    * skipped files provably held nothing). */
  def lookup(spark: SparkSession, tableDir: String, column: String,
      keys: Seq[String]): DataFrame = {
    requireUnversioned(spark, tableDir, "lookup")
    val schema = spark.read.parquet(tableDir).schema
    val files = candidateFiles(spark, tableDir, column, keys)
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
      .filter(col(column).cast("string").isin(keys: _*))
  }

  /** Snapshot-scoped pruned lookup on a [[TableLog]]-versioned table:
    * candidates intersect THAT snapshot's file list (the sidecar may
    * trail the head by a maintenance pass, or a reader may time
    * travel — either way a candidate outside the snapshot must not be
    * read), and the scan runs under the snapshot's RECORDED schema so
    * pre-evolution files null-fill.
    *
    * LOSSLESS UNCONDITIONALLY (r17): a snapshot file the sidecar does
    * NOT index cannot be proven key-free — the Bloom's
    * no-false-negative guarantee only covers files it aggregated — so
    * every sidecar-unindexed snapshot file scans alongside the
    * candidates. A commit the caller forgot to [[refresh]] after, or
    * a time travel to a version whose files refresh dropped, degrades
    * to partial pruning — never to silently missing rows. */
  def lookupSnapshot(spark: SparkSession, tableDir: String,
      column: String, keys: Seq[String], version: Option[Int] = None)
      : DataFrame = {
    import spark.implicits._
    val snapshot = TableLog.snapshotFiles(spark, tableDir, version,
      allowDvs = true)
    val byName = snapshot.map(f =>
      new org.apache.hadoop.fs.Path(f).getName -> f).toMap
    val schema = TableLog.schemaOf(spark, tableDir, version).getOrElse(
      sys.error(s"$tableDir snapshot records no schema (empty init?)"))
    val cands = candidateFiles(spark, tableDir, column, keys)
      .flatMap(f => byName.get(new org.apache.hadoop.fs.Path(f).getName))
    // unprovable-absence files: in the snapshot, not in the sidecar —
    // scanned unconditionally (no candidate evidence exists for
    // them). Computed DISTRIBUTIVELY (r18): anti-join the
    // snapshot-names frame against the sidecar's file names and
    // collect only the unindexed REMAINDER — normally empty — never
    // the sidecar's full distinct name set, which is O(index files)
    // driver memory and a full sidecar scan on the hot lookup path
    // at the millions-of-files target.
    val unindexed = byName.keys.toSeq.toDF("__snap_name")
      .join(spark.read.parquet(indexDir(tableDir, column))
          .select(nameOf(col("file")).as("__snap_name")).distinct(),
        Seq("__snap_name"), "left_anti")
      .as[String].collect().toSeq.flatMap(byName.get)
    val reads =
      if (keys.isEmpty) Seq.empty else (cands ++ unindexed).toSeq.distinct
    if (reads.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      // merge-on-read compatible: apply the snapshot's active
      // deletion vectors before the exact predicate, so a lookup
      // never returns a row deleteWhere already deleted
      TableLog.antiJoinDvs(spark,
        spark.read.schema(schema).parquet(reads: _*),
        TableLog.snapshotDvs(spark, tableDir, version))
        .filter(col(column).cast("string").isin(keys: _*))
  }
}
