package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Resumable change-data-feed consumption over a [[TableLog]] table —
  * the Delta CDF / Iceberg incremental-read analogue.
  * [[TableLog.diff]] answers one ad-hoc "what changed between v and
  * w"; a downstream sync pipeline instead needs "give me everything
  * since the version I LAST CONSUMED", resumable across crashes.
  *
  * Two layers:
  *
  *   - [[TableLog.changes]] (stateless): the union of PAIRWISE diffs
  *     `diff(v-1, v)` for every commit in `(sinceV, untilV]`, each row
  *     stamped `_commit_version` — per-commit granularity, so an
  *     insert-then-delete ACROSS commits shows both events (a single
  *     spanning diff would cancel them), and the feed is exactly the
  *     concatenation a per-commit consumer would have seen live.
  *   - [[ChangeFeed]] (this object, stateful): a consumer CURSOR — a
  *     one-line text file owned by the consumer (not the table: each
  *     consumer tracks its own position) holding the last version it
  *     ACKNOWLEDGED. [[next]] returns the batch `(cursor, head]`;
  *     the consumer processes it, then [[ack]]s the batch's `toV`,
  *     which publishes the new cursor atomically (temp + rename). A
  *     crash between processing and ack re-delivers the same batch on
  *     resume — AT-LEAST-ONCE delivery, upgraded to exactly-once by
  *     an idempotent apply (write-by-version-range, keyed merge, or a
  *     [[TableLog]] commit with a batch action id, as the streaming
  *     pipelines already do). ChangeFeedSpec pins the replay and the
  *     exactly-once composition.
  *
  * Retention contract: the feed needs every version in
  * `(cursor, head]` RETAINED — a consumer that lags past
  * [[TableLog.expire]]'s window fails LOUDLY (the missing deltas are
  * unrecoverable; re-seed the consumer from a full snapshot read)
  * rather than silently skipping changes.
  *
  * Scale: each pairwise diff is FILE-GRANULAR since r18
  * ([[TableLog.diffCommit]] reads only the commit's added/removed
  * files, resolved from the delta record itself — carried files
  * cancel by construction and are never read), so consuming a batch
  * costs O(changed files across its commits), never
  * O(commits × table); the cursor is one line. The incremental-log
  * discipline carried through to consumption. */
object ChangeFeed {

  final case class Batch(fromV: Int, toV: Int, changes: DataFrame)

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The consumer's last-acknowledged version, None before the first
    * [[seed]]/[[ack]]. */
  def position(spark: SparkSession, cursorPath: String): Option[Int] = {
    val f = fs(spark, cursorPath)
    val p = new Path(cursorPath)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val line = try {
        new java.io.BufferedReader(
          new java.io.InputStreamReader(in, "UTF-8")).readLine()
      } finally in.close()
      Option(line).map(_.trim).filter(_.startsWith("v="))
        .map(_.drop(2).toInt)
        .orElse(sys.error(s"corrupt cursor at $cursorPath: '$line'"))
    }
  }

  /** Start a consumer AFTER `version` (typically the version whose
    * full snapshot the consumer bootstrapped from). Refuses to
    * overwrite an existing cursor — two consumers sharing a cursor
    * file is a bug, not a race to tolerate. */
  def seed(spark: SparkSession, cursorPath: String, version: Int): Unit = {
    val f = fs(spark, cursorPath)
    require(!f.exists(new Path(cursorPath)),
      s"cursor $cursorPath already exists (position " +
        s"${position(spark, cursorPath)}) — ack advances it; delete it " +
        "explicitly to re-seed")
    writeCursor(f, cursorPath, version)
  }

  private def writeCursor(f: FileSystem, cursorPath: String, v: Int)
      : Unit = {
    val dst = new Path(cursorPath)
    val tmp = new Path(dst.getParent,
      s".${dst.getName}.tmp.${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(s"v=$v\n".getBytes("UTF-8")) finally out.close()
    // atomic REPLACE via FileContext rename(OVERWRITE): the old
    // delete-then-rename publish left a crash window with NO cursor
    // file at all — the one piece of state this file exists to
    // preserve, forcing the operator to guess a re-seed version
    // (guessing high silently skips changes). An overwriting rename
    // always leaves a readable cursor, old or new.
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        f.makeQualified(dst).toUri, f.getConf)
      fc.rename(f.makeQualified(tmp), f.makeQualified(dst),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // a store without an AbstractFileSystem binding (test shims)
        // keeps the legacy two-step — the window is the store's
        // limitation, not the contract's
        if (f.exists(dst)) f.delete(dst, false)
        require(f.rename(tmp, dst),
          s"cursor publish failed: $tmp -> $dst")
    }
  }

  /** The unconsumed batch `(cursor, min(head, cursor + maxVersions)]`,
    * or None when the consumer is caught up. Does NOT advance the
    * cursor — process the batch, then [[ack]] it. Calling next again
    * before ack returns the same batch (crash/resume re-delivery).
    * `keys` (r18): per-commit delete+insert pairs sharing the key
    * arrive as `update_preimage`/`update_postimage`
    * ([[TableLog.changes]]). */
  def next(spark: SparkSession, tableDir: String, cursorPath: String,
      maxVersions: Int = Int.MaxValue, keys: Seq[String] = Nil)
      : Option[Batch] = {
    require(maxVersions >= 1, "maxVersions must be >= 1")
    val cur = position(spark, cursorPath).getOrElse(
      sys.error(s"no cursor at $cursorPath — seed(version) it first " +
        "(bootstrap the consumer from a full snapshot read)"))
    val head = TableLog.head(spark, tableDir).getOrElse(
      sys.error(s"$tableDir has no log"))
    if (head <= cur) None
    else {
      val to = math.min(head.toLong, cur.toLong + maxVersions).toInt
      Some(Batch(cur, to, TableLog.changes(spark, tableDir, cur,
        Some(to), keys)))
    }
  }

  /** Acknowledge a processed batch: publishes `toV` as the new cursor
    * position. Acks must be in order — a stale or duplicate ack fails
    * loudly (it means two consumers share the cursor, or the caller
    * acked a batch it never took). */
  def ack(spark: SparkSession, cursorPath: String, batch: Batch): Unit = {
    val cur = position(spark, cursorPath).getOrElse(
      sys.error(s"no cursor at $cursorPath"))
    require(batch.fromV == cur,
      s"out-of-order ack: batch covers (v${batch.fromV}, v${batch.toV}] " +
        s"but the cursor is at v$cur — batches ack in take order, " +
        "exactly once")
    writeCursor(fs(spark, cursorPath), cursorPath, batch.toV)
  }
}
