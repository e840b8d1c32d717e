package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Range-partitioned, range-NAMED Parquet sink — the Spark restatement of
  * the reference's rotating writer (writer.go:122-216), empty-range
  * backfill (writer.go:246-267) and completed-range guard (writer.go:53,
  * 209), driven from foreachBatch (SURVEY.md §4.3).
  *
  * Layout contract (what the reference produces): the table root holds one
  * file per block range, named `%0{pad}d-%0{pad}d.parquet`, half-open
  * ranges, dense from `start` — empty ranges materialize as empty files.
  *
  * Mechanics per micro-batch epoch:
  *  1. stage the epoch's rows under `_open/epoch=N/__range=X/` with
  *     mode=overwrite — an epoch REPLAY after a crash overwrites its own
  *     staging deterministically, which upgrades the reference's
  *     at-most-once cursor (SURVEY.md §2.A#17) to exactly-once;
  *  2. every range strictly below the high-water range is complete
  *     (rotation-on-boundary-crossing, writer.go:127-144): merge its
  *     staged epochs, sort by block, publish as ONE atomically-renamed
  *     range-named file; re-publish is a no-op (completed-range guard);
  *  3. ranges with no data between `start` and the high-water mark get
  *     empty files (dense, gapless backfill).
  *
  * Scale: the range is the parallelism unit — publishing K complete
  * ranges is K independent single-range jobs, and the one-file-per-range
  * coalesce costs parallelism only within a range (SURVEY.md §7.4.2).
  * Ordered-merge heaps and upload workers (§2.A#14/#18) are unnecessary:
  * epochs are totally ordered and rename-publish is the committer.
  */
/** Parquet physical tuning — the reference's writer knobs (§2.A#19/#20:
  * --compression[-level], --row-group-rows, --dict-encoding, --page-size;
  * writer.go:93-117, run.go:43-49) mapped to parquet-mr properties. */
final case class ParquetTuning(
    compression: String = "zstd",           // writer.go:373-386 default
    rowGroupBytes: Option[Long] = None,     // parquet-mr sizes row groups
                                            // by BYTES (parquet.block.size);
                                            // the reference's --row-group-rows
                                            // has no exact parquet-mr analog
    dictionaryEncoding: Boolean = true,     // writer.go:103
    pageSizeBytes: Option[Long] = None,     // writer.go:104-106 (0=default)
    compressionLevel: Option[Int] = None) { // writer.go:96-98; parquet-mr
                                            // honors it for zstd (and gzip)
  def options: Map[String, String] = Map(
    "compression" -> compression,
    "parquet.enable.dictionary" -> dictionaryEncoding.toString) ++
    rowGroupBytes.map("parquet.block.size" -> _.toString) ++
    pageSizeBytes.map("parquet.page.size" -> _.toString) ++
    compressionLevel.map(l => s"parquet.compression.codec.$compression.level" -> l.toString)
}

final case class RangeSink(
    root: String,
    partitioner: RangePartitioner,
    blockCol: String = "block_number",
    tuning: ParquetTuning = ParquetTuning()) {

  private val nameRe = raw"(\d{%d})-(\d{%d})\.parquet".format(
    partitioner.pad, partitioner.pad).r

  private def rangeExpr =
    expr(s"${partitioner.start} + ((`$blockCol` - ${partitioner.start})" +
      s" div ${partitioner.size}) * ${partitioner.size}")

  private def fs(spark: SparkSession): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // Published ranges listed ONCE per sink lifetime (restart/crash pays
  // one listing), then maintained incrementally as publishes succeed —
  // re-listing the table root every batch would grow O(total published
  // ranges) over a long-running stream (~75k files/year at 1M blocks/day,
  // 5000-block ranges). The per-range f.exists(target) check inside each
  // publish stays the replay guard of record.
  @volatile private var publishedCache: Set[Long] = _

  /** Range starts that already have a published file. */
  def publishedRanges(spark: SparkSession): Set[Long] = synchronized {
    if (publishedCache == null) {
      val f = fs(spark)
      val rootPath = new Path(root)
      publishedCache =
        if (!f.exists(rootPath)) Set.empty
        else f.listStatus(rootPath).toSeq.flatMap { st =>
          st.getPath.getName match {
            case nameRe(rs, _) => Some(rs.toLong)
            case _ => None
          }
        }.toSet
    }
    publishedCache
  }

  private def markPublished(rs: Long): Unit = synchronized {
    if (publishedCache != null) publishedCache += rs
  }

  /** Stage one epoch under `_open/epoch=N/__range=X/` and return the
    * staged range starts — read from the partition DIRECTORY NAMES, so
    * discovering the epoch's high-water range costs one listing instead
    * of a second `agg(max)` pass over the input (which in foreachBatch
    * recomputes the whole micro-batch, and in the batch path rescans the
    * source). */
  private def stageEpoch(df: DataFrame, epochId: Long): Seq[Long] = {
    df.withColumn("__range", rangeExpr)
      .repartition(col("__range"))
      .sortWithinPartitions(col(blockCol))
      .write.mode("overwrite").partitionBy("__range")
      .options(tuning.options)
      .parquet(s"$root/_open/epoch=$epochId")
    fs(df.sparkSession)
      .globStatus(new Path(s"$root/_open/epoch=$epochId/__range=*")).toSeq
      .map(_.getPath.getName.stripPrefix("__range=").toLong)
  }

  /** foreachBatch entry point: stage this epoch, then finalize everything
    * strictly below the high-water range. */
  def processBatch(df: DataFrame, epochId: Long): Unit = {
    val ranges = stageEpoch(df, epochId)
    if (ranges.nonEmpty) finalizeBelow(df.sparkSession, df.schema, ranges.max)
  }

  /** Batch/shutdown path: everything is final (the stop block is known) —
    * finalize all staged ranges including the clamped last one. */
  def writeAll(df: DataFrame): Unit = {
    val ranges = stageEpoch(df, epochId = 0L)
    if (ranges.nonEmpty)
      finalizeBelow(df.sparkSession, df.schema, ranges.max + partitioner.size)
  }

  /** Publish every complete range with rangeStart < highWater, plus empty
    * backfill files for data-less ranges.
    *
    * Publish cost is kept off the Spark scheduler wherever possible:
    *  - a range staged by a single epoch already IS one sorted parquet
    *    file (stage repartitions by range and sorts within partitions) —
    *    publishing it is a pure filesystem rename, no job;
    *  - empty backfill writes ONE template file and FS-copies it per
    *    missing range (writer.go:246-267 analog), no job per range;
    *  - only ranges spanning multiple epochs need a merge job.
    * At scale this makes publishing K ranges O(K) namenode ops, not K
    * scheduled jobs. */
  private def finalizeBelow(
      spark: SparkSession, schema: StructType, highWater: Long): Unit = {
    val f = fs(spark)
    val done = publishedRanges(spark)
    // staged ranges present in any epoch dir
    val openDir = new Path(s"$root/_open")
    val stagedRanges: Map[Long, Seq[Path]] =
      if (!f.exists(openDir)) Map.empty
      else f.globStatus(new Path(s"$root/_open/epoch=*/__range=*")).toSeq
        .map(_.getPath)
        .groupBy(p => p.getName.stripPrefix("__range=").toLong)
        .view.mapValues(_.toSeq).toMap
    val todo = partitioner.rangeStartsUpTo(highWater - 1)
      .filterNot(done.contains).filter(_ < highWater)
    if (todo.isEmpty) return

    def partFilesOf(dir: Path): Seq[Path] =
      f.listStatus(dir).map(_.getPath).toSeq
        .filter(p => p.getName.startsWith("part-") &&
          p.getName.endsWith(".parquet"))

    // lazy empty template, written at most once per finalize pass
    lazy val emptyTemplate: Path = {
      val tmplDir = new Path(root, "._empty_template")
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .coalesce(1).write.mode("overwrite").options(tuning.options)
        .parquet(tmplDir.toString)
      partFilesOf(tmplDir).head
    }
    val usedTemplate = new java.util.concurrent.atomic.AtomicBoolean(false)

    // Ranges publish independently (distinct targets + staging) — fan the
    // filesystem work out over a bounded pool. On an object store each
    // publish is a round-trip; serial K-range backfills would be
    // latency-bound (the reference async-uploads for the same reason,
    // writer.go:350-371).
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, math.max(1, todo.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // FileSystem.rename reports most failures (missing target parent,
    // cross-FS, races) by returning FALSE, not throwing — an unchecked
    // rename would let finalizeBelow delete the staging dirs below and
    // silently replace the range's data with an empty backfill file.
    def renameOrDie(src: Path, target: Path): Unit = {
      f.rename(src, target)
      if (!f.exists(target))
        throw new IllegalStateException(
          s"publish rename $src -> $target failed; staging kept for replay")
    }
    try {
      val publishes = todo.map { rs => Future {
        val (_, re) = partitioner.rangeFor(rs)
        val target = new Path(root, partitioner.fileName(rs, re))
        stagedRanges.get(rs) match {
          case Some(Seq(dir)) if partFilesOf(dir).size == 1 =>
            // fast path: already one sorted file — rename-publish, no job
            if (!f.exists(target)) renameOrDie(partFilesOf(dir).head, target)
          case Some(dirs) =>
            // merge path: range spans epochs — one small job. mergeSchema,
            // NOT the current batch's schema: when the range straddles a
            // schema-evolution boundary (descriptor gained/dropped a field
            // between epochs), forcing the newest schema would silently
            // drop the older epochs' column values from the published file
            val tmp = new Path(root,
              s".${partitioner.fileName(rs, re)}.inprogress")
            spark.read.option("mergeSchema", "true")
              .parquet(dirs.map(_.toString): _*)
              .coalesce(1).sortWithinPartitions(col(blockCol))
              .write.mode("overwrite").options(tuning.options)
              .parquet(tmp.toString)
            if (!f.exists(target)) renameOrDie(partFilesOf(tmp).head, target)
            f.delete(tmp, true)
          case None =>
            // empty backfill: FS copy of the 0-row template
            if (!f.exists(target)) {
              usedTemplate.set(true)
              org.apache.hadoop.fs.FileUtil.copy(
                f, emptyTemplate, f, target, false, spark.sparkContext
                  .hadoopConfiguration)
            }
        }
        // staging is dropped only once the published file is confirmed
        // present — a failed publish must leave the epoch replayable
        if (!f.exists(target))
          throw new IllegalStateException(
            s"range $rs publish did not materialize $target")
        markPublished(rs)
        stagedRanges.get(rs).foreach(_.foreach(f.delete(_, true)))
      }}
      Await.result(Future.sequence(publishes), Duration.Inf)
    } finally pool.shutdown()
    if (usedTemplate.get) f.delete(new Path(root, "._empty_template"), true)
    // epoch dirs whose ranges all published hold only write-committer
    // droppings (_SUCCESS) — drop them, or the epoch=* glob above grows
    // O(total epochs) per batch on a long-running stream
    if (f.exists(openDir)) f.listStatus(openDir).foreach { st =>
      if (st.isDirectory &&
          !f.listStatus(st.getPath).exists(
            _.getPath.getName.startsWith("__range=")))
        f.delete(st.getPath, true)
    }
  }
}
