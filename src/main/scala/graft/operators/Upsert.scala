package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed MERGE/upsert maintenance pass over a landed parquet table —
  * the `MERGE INTO t USING c WHEN MATCHED THEN UPDATE WHEN NOT MATCHED
  * THEN INSERT` analogue (SCD1, last-writer-wins), the batch
  * maintenance step the lakehouse story was missing between ingest
  * (RangeSink), re-clustering (ZOrder.compact) and streaming SCD2
  * (whose closed intervals are exactly a changes feed for the
  * current-state table).
  *
  * COPY-ON-WRITE AT FILE GRANULARITY — the property that makes MERGE
  * viable on a 100 TB table where the change set touches a fraction of
  * it: only files that CONTAIN an affected key are decoded and
  * rewritten; every other file is copied byte-for-byte through the
  * filesystem (no decode, no re-encode, no shuffle — at scale this
  * becomes a rename/hard-link in the commit protocol). Finding the
  * touched files costs one single-column scan of the table (the key
  * column only — column pruning reaches the parquet reader) semi-joined
  * against the change keys, which rides a broadcast when the change set
  * is small (the common case) and SHUFFLE_HASH above
  * [[BroadcastKeyRows]]. When the table is range- or z-order-clustered
  * on the key (RangeSink / ZOrder.compact layouts), the touched set is
  * the few files whose key range overlaps the changes — the clustering
  * IS the pruning.
  *
  * Determinism: multiple change rows per key resolve by the version
  * column, ties REJECTED (a duplicate (key, version) pair has no
  * defined winner — failing loudly beats picking one by partition
  * order); without a version column the change set must be unique per
  * key, same enforcement. Tombstones (`--tombstone col`) delete the
  * key instead of upserting it. Replay-idempotent: applying the same
  * change set to the merged result reproduces it bit-for-bit
  * (UpsertSpec pins it). */
object Upsert {

  /** Change-key count above which the touched-file probe and the
    * rewrite anti-join route SHUFFLE_HASH instead of broadcast. */
  val BroadcastKeyRows: Long = 1L << 22

  final case class Stats(upserts: Long, deletes: Long, inserts: Long,
    filesRewritten: Int, filesCopied: Int)

  /** Resolve the change set to one winner per key: latest `version`,
    * duplicate (key, version) rejected. Change-sized frame. */
  private[operators] def resolve(changes: DataFrame, key: String,
      versionCol: Option[String]): DataFrame = versionCol match {
    case None =>
      val dups = changes.groupBy(col(key)).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).limit(1).collect()
      require(dups.isEmpty, s"changes carry duplicate rows for key " +
        s"${dups.headOption.map(_.get(0))} and no --version column " +
        "names a winner")
      changes
    case Some(v) =>
      val dups = changes.groupBy(col(key), col(v))
        .agg(count(lit(1)).as("c")).filter(col("c") > 1).limit(1).collect()
      require(dups.isEmpty, s"duplicate (key, $v) pair " +
        s"${dups.headOption.map(r => (r.get(0), r.get(1)))} has no " +
        "defined winner")
      val w = Window.partitionBy(col(key)).orderBy(col(v).desc)
      changes.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
  }

  /** Merge `changesDir` into the parquet table at `tableDir`, writing
    * the result BESIDE the live table at `outDir` (the ZOrder.compact
    * deploy contract: swapping it in is the caller's step). */
  def merge(spark: SparkSession, tableDir: String, changesDir: String,
      outDir: String, key: String, versionCol: Option[String] = None,
      tombstoneCol: Option[String] = None): Stats = {
    val table = spark.read.parquet(tableDir)
    val resolved = resolve(spark.read.parquet(changesDir), key,
      versionCol).localCheckpoint()
    val upsertRows = tombstoneCol
      .map(t => resolved.filter(!coalesce(col(t), lit(false))).drop(t))
      .getOrElse(resolved)
    val deleteKeys = tombstoneCol.map(t =>
      resolved.filter(coalesce(col(t), lit(false))).select(col(key)))
    require(upsertRows.columns.sorted.sameElements(table.columns.sorted),
      s"changes schema ${upsertRows.columns.sorted.mkString(",")} != " +
        s"table schema ${table.columns.sorted.mkString(",")}")

    // the affected-key frame: one column, change-sized, read three ways
    // (touched-file probe, rewrite anti-join, insert anti-join)
    val keys = resolved.select(col(key)).localCheckpoint()
    val nKeys = keys.count()
    def keySide(df: DataFrame): DataFrame =
      if (nKeys <= BroadcastKeyRows) broadcast(df) else df

    // touched files: a key-column-only scan of the table (ReadSchema
    // prunes to [key]), semi-joined against the change keys
    val touched = table.select(col(key))
      .withColumn("__file", input_file_name())
      .join(keySide(keys), Seq(key), "left_semi")
      .select("__file").distinct()
      .collect().map(_.getString(0)).toSet

    // full file inventory via the table's own filesystem
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(new org.apache.hadoop.fs.Path(tableDir))
      .filterNot(s => s.getPath.getName.startsWith("_")
        || s.getPath.getName.startsWith("."))
    // flat layouts only (RangeSink / optimize / plain writes): a
    // hive-partitioned tree would need per-directory recursion AND
    // partition-column reconstruction — fail loudly rather than
    // silently dropping nested files from the copy path
    val subdirs = entries.filter(_.isDirectory).map(_.getPath.getName)
    require(subdirs.isEmpty, "upsert requires a flat parquet directory; " +
      s"found subdirectories: ${subdirs.mkString(", ")}")
    val all = entries.filter(_.isFile).map(_.getPath).toSeq
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    fs.mkdirs(outPath)
    val untouched = all.filterNot(p => touched.contains(p.toUri.toString)
      || touched.contains(p.toString))
    untouched.foreach { p =>
      org.apache.hadoop.fs.FileUtil.copy(fs, p, fs,
        new org.apache.hadoop.fs.Path(outPath, p.getName),
        false, spark.sparkContext.hadoopConfiguration)
    }

    // rewrite ONLY the touched files: survivors (keys not in changes,
    // not tombstoned) + the resolved upsert rows — inserts included by
    // construction (a new key touches no file and simply appends)
    val colOrder = table.columns.toSeq
    val survivors0 =
      if (touched.isEmpty) None
      else Some(spark.read.schema(table.schema)
        .parquet(touched.toSeq: _*)
        .join(keySide(keys), Seq(key), "left_anti"))
    val rewritten = survivors0 match {
      case Some(s) => s.select(colOrder.map(col): _*)
        .unionByName(upsertRows.select(colOrder.map(col): _*))
      case None => upsertRows.select(colOrder.map(col): _*)
    }
    rewritten.write.mode("append").parquet(outDir)

    // stats from change-sized frames only (no full-table count):
    // upserts = keys present in the table, inserts = the rest
    val present =
      if (touched.isEmpty) 0L
      else {
        val tableKeys = spark.read.schema(table.schema)
          .parquet(touched.toSeq: _*).select(col(key)).distinct()
        upsertRows.select(col(key))
          .join(keySide(tableKeys), Seq(key), "left_semi").count()
      }
    val nUpsertRows = upsertRows.count()
    val nDeletes = deleteKeys.map(_.count()).getOrElse(0L)
    Stats(
      upserts = present,
      deletes = nDeletes,
      inserts = nUpsertRows - present,
      filesRewritten = touched.size,
      filesCopied = untouched.size)
  }
}
