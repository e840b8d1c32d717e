package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Import an existing hive-partitioned `k=v/` directory tree as a
  * [[TableLog]]-versioned FLAT+CLUSTERED table — the on-ramp for the
  * user whose first dataset is a `dt=2024-01-01/`-style tree (the
  * layout this engine deliberately refuses at the operator level:
  * `Upsert.listFlat` fails loudly on subdirectories because
  * flat+range/z-clustered is the design; see
  * `reference/parquet/sinker/writer.go:75-79` — the reference itself
  * writes flat range files, so partitioned trees are a
  * beyond-reference usability gap, not parity).
  *
  * What the import does, in one pass over the source:
  *
  *   1. read the tree with Spark's partition discovery — `k=v` path
  *      segments come back as COLUMNS (values type-inferred exactly
  *      as a hive reader would);
  *   2. re-cluster: `repartitionByRange` on `clusterBy` (usually the
  *      downstream merge/point-lookup key), so the landed layout
  *      carries the pruning the directory tree used to provide — but
  *      on the CLUSTER key, with file-level min/max disjointness,
  *      instead of one directory per partition value (a
  *      high-cardinality hive tree at 100 TB is millions of tiny
  *      directories; range-clustered flat files are the same bytes in
  *      bounded, mergeable, skippable form);
  *   3. land at `destDir` and commit v0 ([[TableLog.init]]) — the
  *      maintenance loop (upsert/rollup/optimize/skipindex/expire)
  *      applies from the first read.
  *
  * Partition-column fidelity: hive path values are strings;
  * discovery infers narrower types where lossless (ints, dates).
  * The inferred columns land as ORDINARY columns — `partitionCols`
  * in the returned stats names them so callers can assert the
  * reconstruction. A source with NO partition directories imports as
  * a plain re-cluster (stats show zero partition columns).
  *
  * Scale: the one shuffle is the range repartition — O(data) with
  * sampled bounds, the same cost ZOrder.compact pays; there is no
  * driver-side per-partition loop (discovery lists the tree once,
  * distributed reads follow). TableImportSpec + CliMainSpec pin a
  * two-level tree round-trip; the declared query `q_hive_import`
  * hash-matches the relational restatement in DuckDB. */
object TableImport {

  final case class Stats(rows: Long, files: Int,
    partitionCols: Seq[String], version: Int)

  /** Partition columns Spark's discovery reconstructed for `df` —
    * the fields of the relation's partitionSchema. */
  private def partitionCols(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources
            .HadoopFsRelation => h.partitionSchema.fieldNames.toSeq
          case _ => Seq.empty[String]
        }
    }.flatten

  /** Import `srcDir` (hive-partitioned or flat parquet) into a fresh
    * TableLog-versioned flat table at `destDir`, range-clustered on
    * `clusterBy` into `numFiles` files. `destDir` must not already
    * hold a table (an import is a bootstrap, not a merge — feed
    * increments through upsert/rollup instead). */
  def importHive(spark: SparkSession, srcDir: String, destDir: String,
      clusterBy: Seq[String], numFiles: Int): Stats = {
    require(clusterBy.nonEmpty, "clusterBy needs at least one column")
    require(numFiles >= 1, "numFiles must be >= 1")
    val f = new Path(destDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!f.exists(new Path(destDir)) ||
      f.listStatus(new Path(destDir)).isEmpty,
      s"$destDir already exists and is non-empty — import bootstraps " +
        "a NEW table; route increments through upsert/rollup commits")
    if (f.exists(new Path(destDir))) f.delete(new Path(destDir), true)
    val src = spark.read.parquet(srcDir)
    val parts = partitionCols(src)
    val missing = clusterBy.filterNot(src.columns.contains)
    require(missing.isEmpty,
      s"cluster columns ${missing.mkString(", ")} not in source " +
        s"schema ${src.columns.mkString(", ")} (partition columns " +
        s"reconstructed: ${parts.mkString(", ")})")
    src.repartitionByRange(numFiles, clusterBy.map(col): _*)
      .write.mode(SaveMode.ErrorIfExists).parquet(destDir)
    val v = TableLog.init(spark, destDir)
    Stats(
      rows = TableLog.read(spark, destDir).count(),
      files = TableLog.snapshotFiles(spark, destDir).size,
      partitionCols = parts,
      version = v)
  }
}
