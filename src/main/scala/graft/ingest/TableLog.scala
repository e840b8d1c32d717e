package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot log for a landed parquet table — the missing
  * last step of the maintenance loop. `optimize` (ZOrder.compact) and
  * `upsert` (SCD1/SCD2 merge) deliberately write the new table BESIDE
  * the live one and leave "swap it in" to the caller; TableLog makes
  * that swap an ATOMIC COMMIT with history:
  *
  *   - a table is `<dir>/_graft_log/v<10-digit>.manifest` files, each
  *     listing the EXACT data-file set of one snapshot (replace-all
  *     semantics — the maintenance passes rewrite the full table
  *     logically, file-granular copy-on-write keeps the bytes cheap);
  *   - `commit` MOVES the new run's files into the table dir under a
  *     version-prefixed name (never colliding with live files), then
  *     publishes the manifest via the temp+rename protocol RangeSink
  *     uses — the rename is the atomic point. A crash before it
  *     leaves only unreferenced files and a `_tmp.` manifest: readers
  *     never see them, [[expire]] sweeps them;
  *   - readers resolve a manifest (head or any retained `version`) and
  *     read EXACTLY its files — snapshot isolation against concurrent
  *     commits and expiry, and time travel for free;
  *   - `expectedHead` gives optimistic single-writer concurrency: the
  *     commit fails if another writer advanced the log (conflict
  *     DETECTION, not resolution — re-run the maintenance pass on the
  *     new head; at 100 TB the pass is file-granular so the retry is
  *     cheap);
  *   - `expire` drops manifests beyond the retained window and every
  *     data file no retained manifest references (including crash
  *     orphans) — the Vacuum retention discipline applied to history.
  *
  * Scale: a manifest is one line per file — metadata-sized, never
  * data-sized; commit moves/renames files (no byte copies beyond what
  * the maintenance pass already wrote); reads list one manifest, not
  * the directory tree. */
object TableLog {

  private val LogDir = "_graft_log"

  final case class SnapshotMeta(version: Int, action: String,
    files: Seq[String])
  final case class ExpireStats(manifestsDropped: Int, filesDropped: Int)

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(dir: String, v: Int): Path =
    new Path(dir, f"$LogDir/v$v%010d.manifest")

  private def listVersions(f: FileSystem, dir: String): Seq[Int] = {
    val log = new Path(dir, LogDir)
    if (!f.exists(log)) Seq.empty
    else f.listStatus(log).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toInt)
      .sorted
  }

  /** Highest committed version, None for an uninitialized table. */
  def head(spark: SparkSession, dir: String): Option[Int] =
    listVersions(fs(spark, dir), dir).lastOption

  private def writeManifest(f: FileSystem, dir: String, v: Int,
      action: String, files: Seq[String]): Unit = {
    val tmp = new Path(dir,
      s"$LogDir/_tmp.${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try {
      out.write((s"action=$action\n" +
        files.sorted.map(n => s"file=$n\n").mkString)
        .getBytes("UTF-8"))
    } finally out.close()
    // the atomic point: rename publishes the snapshot or nothing does
    if (!f.rename(tmp, manifestPath(dir, v))) {
      f.delete(tmp, false)
      sys.error(s"concurrent commit of v$v to $dir lost the rename race")
    }
  }

  private def readManifest(f: FileSystem, dir: String, v: Int)
      : SnapshotMeta = {
    val in = f.open(manifestPath(dir, v))
    val text = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 65536, false)
      buf.toString("UTF-8")
    } finally in.close()
    val lines = text.linesIterator.toSeq
    SnapshotMeta(v,
      lines.find(_.startsWith("action=")).fold("?")(_.drop(7)),
      lines.filter(_.startsWith("file=")).map(_.drop(5)))
  }

  private def dataFiles(f: FileSystem, dir: String): Seq[String] =
    f.listStatus(new Path(dir)).toSeq
      .filter(_.isFile)
      .map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))

  /** Snapshot v0 from the files already in `dir` (a RangeSink root's
    * published ranges, a plain write — any flat parquet directory). */
  def init(spark: SparkSession, dir: String): Int = {
    val f = fs(spark, dir)
    require(listVersions(f, dir).isEmpty, s"$dir already has a log")
    writeManifest(f, dir, 0, "init", dataFiles(f, dir))
    0
  }

  /** Commit `fromDir`'s files (an optimize/upsert output) as the next
    * snapshot: files MOVE into `dir` under a `v<N>-` prefix, then the
    * manifest rename publishes them as the new head atomically.
    * `expectedHead` rejects the commit if another writer advanced the
    * log since the maintenance pass read its input.
    *
    * `carry` is the ZERO-COPY path: names of files the new snapshot
    * SHARES with the current head (a maintenance pass's untouched
    * files — `IncrementalAgg.incrementShared` returns them). They are
    * referenced in the new manifest, never moved or copied — a file
    * lives once in the directory and in as many manifests as retain
    * it; [[expire]]'s referenced-set union already keeps a shared
    * file alive until the LAST retaining snapshot expires. Every
    * carried name must be in the head manifest — carrying a foreign
    * or expired name would publish a snapshot that cannot be read. */
  def commit(spark: SparkSession, dir: String, fromDir: String,
      action: String, expectedHead: Option[Int] = None,
      carry: Seq[String] = Nil): Int = {
    val f = fs(spark, dir)
    val versions = listVersions(f, dir)
    require(versions.nonEmpty, s"$dir has no log — run init first")
    expectedHead.foreach(e => require(versions.last == e,
      s"conflict: head is v${versions.last}, expected v$e — " +
        "re-run the maintenance pass against the new head"))
    val headFiles = readManifest(f, dir, versions.last).files.toSet
    val carryNames = carry.map(c => new Path(c).getName)
    val bad = carryNames.filterNot(headFiles.contains)
    require(bad.isEmpty,
      s"carry names not in head manifest v${versions.last}: " +
        s"${bad.take(3).mkString(", ")}")
    val v = versions.last + 1
    val from = fs(spark, fromDir)
    // version-prefix the moved name, stripping prefixes accumulated by
    // earlier commits (a never-rewritten file copied through N
    // maintenance passes must not grow N prefixes); stripped names can
    // collide within one commit — disambiguate with an ordinal
    val used = scala.collection.mutable.Set.empty[String]
    val moved = dataFiles(from, fromDir).map { n =>
      val base = n.replaceAll("^(v\\d+(-\\d+)?-)+", "")
      val dst0 = s"v$v-$base"
      val dst =
        if (used.add(dst0)) dst0
        else {
          var i = 1
          while (!used.add(s"v$v-$i-$base")) i += 1
          s"v$v-$i-$base"
        }
      require(from.rename(new Path(fromDir, n), new Path(dir, dst)),
        s"move of $n from $fromDir failed")
      dst
    }
    require(moved.nonEmpty || carryNames.nonEmpty,
      s"$fromDir holds no data files and nothing carried")
    writeManifest(f, dir, v, action, carryNames ++ moved)
    v
  }

  /** Absolute paths of a snapshot's data files — the table-file list
    * maintenance passes should read (the directory also holds other
    * versions' files). */
  def snapshotFiles(spark: SparkSession, dir: String,
      version: Option[Int] = None): Seq[String] = {
    val f = fs(spark, dir)
    val versions = listVersions(f, dir)
    require(versions.nonEmpty, s"$dir has no log — run init first")
    val v = version.getOrElse(versions.last)
    require(versions.contains(v),
      s"v$v not in retained history ${versions.mkString("[", ",", "]")}")
    readManifest(f, dir, v).files.map(n => new Path(dir, n).toString)
  }

  /** Read a snapshot: the head, or any retained `version` — EXACTLY
    * the manifest's files, immune to later commits and expiry. */
  def read(spark: SparkSession, dir: String,
      version: Option[Int] = None): DataFrame = {
    val f = fs(spark, dir)
    val versions = listVersions(f, dir)
    require(versions.nonEmpty, s"$dir has no log — run init first")
    val v = version.getOrElse(versions.last)
    require(versions.contains(v),
      s"v$v not in retained history ${versions.mkString("[", ",", "]")}")
    val m = readManifest(f, dir, v)
    if (m.files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(
      m.files.map(n => new Path(dir, n).toString): _*)
  }

  /** Change-data feed between two retained snapshots: rows only in
    * `to` tagged `insert`, rows only in `from` tagged `delete` (an
    * update is its delete+insert pair — the minimal complete contract;
    * readers needing pre/post images pair them on the key). Multiset
    * semantics via exceptAll, so duplicate rows diff by count. This is
    * the full two-snapshot comparison — one shuffle over both sides;
    * a content-addressed manifest (files shared across versions
    * instead of copied) would make it file-granular, noted as the
    * at-scale follow-up in the commit protocol's Scaladoc. */
  def diff(spark: SparkSession, dir: String, fromV: Int, toV: Int)
      : DataFrame = {
    val before = read(spark, dir, Some(fromV))
    val after = read(spark, dir, Some(toV))
    import org.apache.spark.sql.functions.lit
    after.exceptAll(before).withColumn("_change_type", lit("insert"))
      .unionByName(
        before.exceptAll(after).withColumn("_change_type", lit("delete")))
  }

  def history(spark: SparkSession, dir: String): Seq[SnapshotMeta] = {
    val f = fs(spark, dir)
    listVersions(f, dir).map(readManifest(f, dir, _))
  }

  /** Drop history beyond the last `retainLast` snapshots AND every
    * data file no retained manifest references — crash orphans
    * included. Idempotent; the head is always retained. */
  def expire(spark: SparkSession, dir: String, retainLast: Int)
      : ExpireStats = {
    require(retainLast >= 1, "must retain at least the head")
    val f = fs(spark, dir)
    val versions = listVersions(f, dir)
    require(versions.nonEmpty, s"$dir has no log — run init first")
    val (drop, keep) =
      versions.splitAt(math.max(0, versions.size - retainLast))
    val referenced = keep.flatMap(readManifest(f, dir, _).files).toSet
    val deadFiles = dataFiles(f, dir).filterNot(referenced.contains)
    deadFiles.foreach(n => f.delete(new Path(dir, n), false))
    drop.foreach(v => f.delete(manifestPath(dir, v), false))
    // crashed commits: stranded _tmp manifests are never readable, and
    // a crashed maintenance batch's _staging-* shell holds only files
    // no manifest ever referenced
    val tmps = f.listStatus(new Path(dir, LogDir)).toSeq
      .map(_.getPath).filter(_.getName.startsWith("_tmp."))
    tmps.foreach(f.delete(_, false))
    val staging = f.listStatus(new Path(dir)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_staging"))
      .map(_.getPath)
    staging.foreach(f.delete(_, true))
    ExpireStats(drop.size + tmps.size, deadFiles.size + staging.size)
  }
}
