package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Versioned snapshot log for a landed parquet table — the missing
  * last step of the maintenance loop. `optimize` (ZOrder.compact) and
  * `upsert` (SCD1/SCD2 merge) deliberately write the new table BESIDE
  * the live one and leave "swap it in" to the caller; TableLog makes
  * that swap an ATOMIC COMMIT with history.
  *
  * THE LOG IS INCREMENTAL (r16): a commit publishes a
  * `<dir>/_graft_log/v<10-digit>.delta` record holding the commit's
  * action, the snapshot SCHEMA (one JSON line), and only the CHANGED
  * file names — `add=` lines for files the commit moved in, `remove=`
  * lines for head files it did not carry. A maintenance pass that
  * rewrites 2 of a million files therefore writes (and a reader
  * tails) a 2-line record, not a million-line manifest — at the
  * 100 TB / millions-of-files target the old replace-all manifest
  * was O(table) metadata per commit, the exact problem Delta's
  * incremental actions + parquet checkpoints and Iceberg's manifest
  * lists exist to solve. Every [[CheckpointInterval]] commits (and at
  * v0, and at the retention floor after [[expire]]) a DERIVED
  * `v<N>.checkpoint` record lands beside the delta with the full
  * resolved file list, so resolving any snapshot reads one
  * checkpoint + at most [[CheckpointInterval]] deltas — never the
  * whole history.
  *
  *   - the delta RENAME is the atomic point: a crash before it leaves
  *     only unreferenced files and a `_tmp.` record — readers never
  *     see them, [[expire]] sweeps them once they age past its
  *     in-flight window;
  *   - after the rename the committer READS THE RECORD BACK and fails
  *     unless the bytes (which embed a per-commit UUID) are its own:
  *     on filesystems whose rename silently overwrites an existing
  *     destination (POSIX rename(2), several object-store
  *     connectors), two same-head racers would otherwise BOTH report
  *     success with one commit silently lost — the read-back turns
  *     the overwritten writer into a loud conflict. (A window remains
  *     between verify and return on overwrite-happy stores; HDFS-style
  *     fail-on-existing rename closes it entirely.)
  *   - readers resolve a snapshot (head or any retained `version`)
  *     and read EXACTLY its files — snapshot isolation against
  *     concurrent commits and expiry, and time travel for free;
  *   - each record pins the snapshot's SCHEMA, so [[read]] serves an
  *     evolved table correctly: files landed before an add-column
  *     migration null-fill the new column, and time travel to a
  *     pre-evolution version returns the old shape;
  *   - `expectedHead` gives optimistic single-writer concurrency: the
  *     commit fails if another writer advanced the log (conflict
  *     DETECTION, not resolution — re-run the maintenance pass on the
  *     new head; at 100 TB the pass is file-granular so the retry is
  *     cheap);
  *   - `expire` drops history beyond the retained window, data files
  *     no retained snapshot references, and crash debris — but a file
  *     NO record has ever referenced is indistinguishable from an
  *     IN-FLIGHT commit's freshly-moved file, so never-referenced
  *     files, `_tmp.` records and `_staging-*` dirs are only swept
  *     once older than `minAgeMs` (default [[DefaultExpireAgeMs]]);
  *     files referenced by an EXPIRED snapshot were published and are
  *     safe to drop at any age.
  *
  * Scale: commit metadata is O(changed files) + one schema line;
  * resolution is one checkpoint + a bounded delta tail; the
  * streaming tier's batch-id probe ([[actions]]) reads one line per
  * record and never a file list. */
object TableLog {

  private val LogDir = "_graft_log"

  /** A full-file-list checkpoint record lands every this-many
    * commits; resolution tails at most this many deltas. */
  val CheckpointInterval = 10

  /** Default in-flight window for [[expire]]: never-referenced files,
    * `_tmp.` records and `_staging-*` dirs younger than this are
    * presumed to belong to a live commit and kept. */
  val DefaultExpireAgeMs: Long = 3600L * 1000

  final case class SnapshotMeta(version: Int, action: String,
    files: Seq[String], schemaJson: Option[String] = None)
  final case class ExpireStats(manifestsDropped: Int, filesDropped: Int)

  /** One parsed log record. A delta's `files` is the RESOLVED
    * snapshot only after [[resolveWalk]] applies it; a checkpoint's
    * `files` is complete as written. */
  private final case class Record(action: String,
    schemaJson: Option[String], adds: Seq[String], removes: Seq[String],
    files: Seq[String])

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def deltaPath(dir: String, v: Int): Path =
    new Path(dir, f"$LogDir/v$v%010d.delta")

  private def checkpointPath(dir: String, v: Int): Path =
    new Path(dir, f"$LogDir/v$v%010d.checkpoint")

  /** (delta versions, checkpoint versions), each sorted. */
  private def listLog(f: FileSystem, dir: String): (Seq[Int], Seq[Int]) = {
    val log = new Path(dir, LogDir)
    if (!f.exists(log)) (Seq.empty, Seq.empty)
    else {
      val names = f.listStatus(log).toSeq.map(_.getPath.getName)
      def vs(suffix: String): Seq[Int] = names
        .filter(n => n.startsWith("v") && n.endsWith(suffix))
        .map(_.stripPrefix("v").stripSuffix(suffix).toInt).sorted
      (vs(".delta"), vs(".checkpoint"))
    }
  }

  /** Highest committed version, None for an uninitialized table. */
  def head(spark: SparkSession, dir: String): Option[Int] =
    listLog(fs(spark, dir), dir)._1.lastOption

  private def render(action: String, commitId: String,
      schemaJson: Option[String], lines: Seq[(String, String)]): String =
    (Seq(s"action=$action", s"commit=$commitId") ++
      schemaJson.map(j => s"schema=$j") ++
      lines.map { case (k, v) => s"$k=$v" }).mkString("", "\n", "\n")

  private def readText(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 65536, false)
      buf.toString("UTF-8")
    } finally in.close()
  }

  private def parse(text: String): Record = {
    val lines = text.linesIterator.toSeq
    def all(k: String): Seq[String] =
      lines.filter(_.startsWith(k + "=")).map(_.drop(k.length + 1))
    Record(
      action = all("action").headOption.getOrElse("?"),
      schemaJson = all("schema").headOption,
      adds = all("add"), removes = all("remove"), files = all("file"))
  }

  /** Publish `content` at `dst` via temp write + rename, then read it
    * back: the rename is the atomic point, the read-back catches a
    * same-head racer whose rename silently overwrote ours (see the
    * object Scaladoc). */
  private def publish(f: FileSystem, dir: String, dst: Path,
      content: String): Unit = {
    val tmp = new Path(dir,
      s"$LogDir/_tmp.${java.util.UUID.randomUUID()}")
    val bytes = content.getBytes("UTF-8")
    val out = f.create(tmp, false)
    try out.write(bytes) finally out.close()
    if (f.exists(dst) || !f.rename(tmp, dst)) {
      f.delete(tmp, false)
      sys.error(s"concurrent commit of ${dst.getName} to $dir lost " +
        "the rename race")
    }
    if (readText(f, dst) != content)
      sys.error(s"concurrent commit of ${dst.getName} to $dir " +
        "overwrote ours after the rename — commit lost, files staged " +
        "by this writer are orphans (expire sweeps them)")
  }

  /** (version, action) per commit, oldest first — read from each
    * record's FIRST LINE only, never a file list: the streaming
    * tier's per-micro-batch id probe must stay O(history), not
    * O(history × table files). */
  def actions(spark: SparkSession, dir: String): Seq[(Int, String)] = {
    val f = fs(spark, dir)
    listLog(f, dir)._1.map { v =>
      val in = f.open(deltaPath(dir, v))
      val line = try {
        new java.io.BufferedReader(
          new java.io.InputStreamReader(in, "UTF-8")).readLine()
      } finally in.close()
      v -> Option(line).filter(_.startsWith("action="))
        .fold("?")(_.drop(7))
    }
  }

  /** Resolve (sorted file list, schema) for each requested version in
    * ONE walk: start from the newest checkpoint at or below the
    * lowest target, apply deltas forward. O(checkpoint + tail), and
    * the multi-target form (history, expire) shares the walk. */
  private def resolveWalk(f: FileSystem, dir: String,
      deltas: Seq[Int], cps: Seq[Int], targets: Seq[Int])
      : Map[Int, (Seq[String], Option[String], String)] = {
    if (targets.isEmpty) return Map.empty
    val lo = targets.min
    val hi = targets.max
    val want = targets.toSet
    val out = Map.newBuilder[Int, (Seq[String], Option[String], String)]
    var files = Set.empty[String]
    val start = cps.filter(_ <= lo).maxOption match {
      case Some(cv) =>
        val rec = parse(readText(f, checkpointPath(dir, cv)))
        files = rec.files.toSet
        if (want(cv)) out += cv -> (rec.files.sorted, rec.schemaJson,
          rec.action)
        cv + 1
      case None =>
        require(deltas.headOption.contains(0) && deltas.head <= lo,
          s"no checkpoint at or below v$lo and no v0 delta in $dir — " +
            "history is unresolvable (expired without a floor " +
            "checkpoint?)")
        0
    }
    (start to hi).foreach { v =>
      require(deltas.contains(v),
        s"log gap: v$v missing from $dir while resolving v$hi")
      val rec = parse(readText(f, deltaPath(dir, v)))
      files = files -- rec.removes ++ rec.adds
      if (want(v)) out += v -> (files.toSeq.sorted, rec.schemaJson,
        rec.action)
    }
    out.result()
  }

  private def resolveOne(f: FileSystem, dir: String, v: Int)
      : (Seq[String], Option[String], String) = {
    val (deltas, cps) = listLog(f, dir)
    require(deltas.nonEmpty, s"$dir has no log — run init first")
    require(deltas.contains(v),
      s"v$v not in retained history ${deltas.mkString("[", ",", "]")}")
    resolveWalk(f, dir, deltas, cps, Seq(v))(v)
  }

  private def writeCheckpoint(f: FileSystem, dir: String, v: Int,
      action: String, schemaJson: Option[String], files: Seq[String])
      : Unit =
    publish(f, dir, checkpointPath(dir, v),
      render(action, java.util.UUID.randomUUID().toString, schemaJson,
        files.sorted.map("file" -> _)))

  private def dataFiles(f: FileSystem, dir: String): Seq[String] =
    f.listStatus(new Path(dir)).toSeq
      .filter(_.isFile)
      .map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))

  /** Union-by-name of two schemas — the add-column evolution slice:
    * base fields keep their position, new fields append; a same-name
    * field with a DIFFERENT type fails loudly (type widening is a
    * migration, not a merge). */
  private[ingest] def unionSchema(base: StructType, next: StructType)
      : StructType = {
    val byName = base.fields.map(fld => fld.name -> fld).toMap
    next.fields.foreach { fld =>
      byName.get(fld.name).foreach(b => require(b.dataType == fld.dataType,
        s"schema conflict on column ${fld.name}: " +
          s"${b.dataType.simpleString} vs ${fld.dataType.simpleString}"))
    }
    StructType(base.fields ++
      next.fields.filterNot(fld => byName.contains(fld.name)))
  }

  /** Snapshot v0 from the files already in `dir` (a RangeSink root's
    * published ranges, a plain write — any flat parquet directory).
    * Records the table schema and lands the v0 checkpoint. */
  def init(spark: SparkSession, dir: String): Int = {
    val f = fs(spark, dir)
    require(listLog(f, dir)._1.isEmpty, s"$dir already has a log")
    val files = dataFiles(f, dir)
    val schemaJson =
      if (files.isEmpty) None
      else Some(spark.read.parquet(
        files.map(n => new Path(dir, n).toString): _*).schema.json)
    publish(f, dir, deltaPath(dir, 0),
      render("init", java.util.UUID.randomUUID().toString, schemaJson,
        files.sorted.map("add" -> _)))
    writeCheckpoint(f, dir, 0, "init", schemaJson, files)
    0
  }

  /** Commit `fromDir`'s files (an optimize/upsert output) as the next
    * snapshot: files MOVE into `dir` under a `v<N>-` prefix, then the
    * delta-record rename publishes them as the new head atomically.
    * `expectedHead` rejects the commit if another writer advanced the
    * log since the maintenance pass read its input.
    *
    * `carry` is the ZERO-COPY path: names of files the new snapshot
    * SHARES with the current head (a maintenance pass's untouched
    * files — `IncrementalAgg.incrementShared` returns them). They are
    * referenced, never moved or copied — a file lives once in the
    * directory and in as many snapshots as retain it; [[expire]]'s
    * referenced-set union keeps a shared file alive until the LAST
    * retaining snapshot expires. Every carried name must be in the
    * head snapshot — carrying a foreign or expired name would publish
    * a snapshot that cannot be read. The delta records `add=` lines
    * for moved files and `remove=` lines for head files NOT carried —
    * O(changed), never O(table).
    *
    * The snapshot schema is the union of the head's (when anything is
    * carried) and the moved files' — an add-column change feed
    * evolves the table; old files null-fill on read. */
  def commit(spark: SparkSession, dir: String, fromDir: String,
      action: String, expectedHead: Option[Int] = None,
      carry: Seq[String] = Nil): Int = {
    val f = fs(spark, dir)
    val (deltas, cps) = listLog(f, dir)
    require(deltas.nonEmpty, s"$dir has no log — run init first")
    expectedHead.foreach(e => require(deltas.last == e,
      s"conflict: head is v${deltas.last}, expected v$e — " +
        "re-run the maintenance pass against the new head"))
    val (headFilesSeq, headSchema, _) =
      resolveWalk(f, dir, deltas, cps, Seq(deltas.last))(deltas.last)
    val headFiles = headFilesSeq.toSet
    val carryNames = carry.map(c => new Path(c).getName)
    val bad = carryNames.filterNot(headFiles.contains)
    require(bad.isEmpty,
      s"carry names not in head snapshot v${deltas.last}: " +
        s"${bad.take(3).mkString(", ")}")
    val v = deltas.last + 1
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
    // snapshot schema: moved-file footers only (O(changed)), unioned
    // with the head's recorded schema when the commit carries
    val movedSchema =
      if (moved.isEmpty) new StructType()
      else spark.read.parquet(
        moved.map(n => new Path(dir, n).toString): _*).schema
    val schemaJson = (if (carryNames.nonEmpty) headSchema else None) match {
      case Some(h) => Some(unionSchema(
        DataType.fromJson(h).asInstanceOf[StructType], movedSchema).json)
      case None => if (moved.isEmpty) headSchema
        else Some(movedSchema.json)
    }
    val removes = headFilesSeq.filterNot(carryNames.toSet)
    publish(f, dir, deltaPath(dir, v),
      render(action, java.util.UUID.randomUUID().toString, schemaJson,
        removes.sorted.map("remove" -> _) ++
          moved.sorted.map("add" -> _)))
    // derived, non-atomic-with-the-commit: a crash here only costs
    // later readers a longer delta tail until the next multiple lands
    if (v % CheckpointInterval == 0)
      writeCheckpoint(f, dir, v, action, schemaJson,
        (headFiles -- removes ++ moved).toSeq)
    v
  }

  /** Absolute paths of a snapshot's data files — the table-file list
    * maintenance passes should read (the directory also holds other
    * versions' files). */
  def snapshotFiles(spark: SparkSession, dir: String,
      version: Option[Int] = None): Seq[String] = {
    val f = fs(spark, dir)
    val v = version.getOrElse(listLog(f, dir)._1.lastOption.getOrElse(
      sys.error(s"$dir has no log — run init first")))
    resolveOne(f, dir, v)._1.map(n => new Path(dir, n).toString)
  }

  /** A snapshot's recorded schema (None only for an empty init). */
  def schemaOf(spark: SparkSession, dir: String,
      version: Option[Int] = None): Option[StructType] = {
    val f = fs(spark, dir)
    val v = version.getOrElse(listLog(f, dir)._1.lastOption.getOrElse(
      sys.error(s"$dir has no log — run init first")))
    resolveOne(f, dir, v)._2
      .map(DataType.fromJson(_).asInstanceOf[StructType])
  }

  /** Read a snapshot: the head, or any retained `version` — EXACTLY
    * the snapshot's files under its RECORDED schema, immune to later
    * commits and expiry. Schema evolution reconciles here: a file
    * landed before an add-column migration null-fills the new column,
    * and time travel to a pre-evolution version returns the old
    * shape. */
  def read(spark: SparkSession, dir: String,
      version: Option[Int] = None): DataFrame = {
    val f = fs(spark, dir)
    val v = version.getOrElse(listLog(f, dir)._1.lastOption.getOrElse(
      sys.error(s"$dir has no log — run init first")))
    val (files, schemaJson, _) = resolveOne(f, dir, v)
    val schema = schemaJson.map(DataType.fromJson(_)
      .asInstanceOf[StructType])
    (files.isEmpty, schema) match {
      case (true, None) => spark.emptyDataFrame
      case (true, Some(s)) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case (false, None) => spark.read.parquet(
        files.map(n => new Path(dir, n).toString): _*)
      case (false, Some(s)) => spark.read.schema(s).parquet(
        files.map(n => new Path(dir, n).toString): _*)
    }
  }

  /** Change-data feed between two retained snapshots: rows only in
    * `to` tagged `insert`, rows only in `from` tagged `delete` (an
    * update is its delete+insert pair — the minimal complete contract;
    * readers needing pre/post images pair them on the key). Multiset
    * semantics via exceptAll, so duplicate rows diff by count. Across
    * an add-column evolution both sides read under the NEWER schema
    * (unionByName would fail otherwise; the old side null-fills). */
  def diff(spark: SparkSession, dir: String, fromV: Int, toV: Int)
      : DataFrame = {
    val before0 = read(spark, dir, Some(fromV))
    val after = read(spark, dir, Some(toV))
    import org.apache.spark.sql.functions.{col, lit}
    val missing = after.columns.filterNot(before0.columns.contains)
    val before = missing.foldLeft(before0)((df, c) =>
      df.withColumn(c, lit(null).cast(
        after.schema(c).dataType)))
      .select(after.columns.map(col).toSeq: _*)
    after.exceptAll(before).withColumn("_change_type", lit("insert"))
      .unionByName(
        before.exceptAll(after).withColumn("_change_type", lit("delete")))
  }

  /** Full retained history, oldest first — ONE checkpoint + delta
    * walk resolves every version's file list (O(window × changed),
    * not O(window × table)). Use [[actions]] when only the commit
    * actions are needed. */
  def history(spark: SparkSession, dir: String): Seq[SnapshotMeta] = {
    val f = fs(spark, dir)
    val (deltas, cps) = listLog(f, dir)
    val resolved = resolveWalk(f, dir, deltas, cps, deltas)
    deltas.map { v =>
      val (files, schemaJson, action) = resolved(v)
      SnapshotMeta(v, action, files, schemaJson)
    }
  }

  /** Drop history beyond the last `retainLast` snapshots, every data
    * file no retained snapshot references, and crash debris.
    * Idempotent; the head is always retained.
    *
    * Safety gates (r16):
    *   - files an EXPIRED snapshot referenced were published — safe
    *     at any age; a file NO record has ever referenced is
    *     indistinguishable from an in-flight commit's freshly-moved
    *     file, so never-referenced files, `_tmp.` records and
    *     `_staging-*` dirs are swept only once older than `minAgeMs`
    *     (pass 0 for a quiesced table);
    *   - dropping the MOST RECENT `*-batch-*` commit's record would
    *     let a replaying streaming pipeline double-apply that batch
    *     (the id probe could no longer see it) — refused unless
    *     `allowBatchActionDrop` (quiesced pipeline) is set.
    *
    * Before old records drop, a checkpoint lands at the new retention
    * floor so the remaining history stays resolvable. */
  def expire(spark: SparkSession, dir: String, retainLast: Int,
      minAgeMs: Long = DefaultExpireAgeMs,
      allowBatchActionDrop: Boolean = false): ExpireStats = {
    require(retainLast >= 1, "must retain at least the head")
    val f = fs(spark, dir)
    val (deltas, cps) = listLog(f, dir)
    require(deltas.nonEmpty, s"$dir has no log — run init first")
    val (drop, keep) =
      deltas.splitAt(math.max(0, deltas.size - retainLast))
    if (!allowBatchActionDrop && drop.nonEmpty) {
      val latestBatch = actions(spark, dir)
        .filter(_._2.matches(".*-batch-\\d+")).map(_._1).maxOption
      latestBatch.filter(drop.contains).foreach(v => sys.error(
        s"expire would drop v$v, the most recent streaming batch " +
          "commit — a replaying pipeline could double-apply it; " +
          "retain more history, or pass allowBatchActionDrop=true " +
          "for a quiesced pipeline"))
    }
    // resolve every version's file set in one walk BEFORE deleting
    // anything: retained → referenced (kept), dropped → historical
    // (published once, safe to sweep at any age)
    val resolved = resolveWalk(f, dir, deltas, cps, deltas)
    val referenced = keep.flatMap(resolved(_)._1).toSet
    val historical = drop.flatMap(resolved(_)._1).toSet
    // land a checkpoint at the new floor so the tail stays resolvable
    val floor = keep.head
    if (drop.nonEmpty && !cps.contains(floor)) {
      val (files, schemaJson, action) = resolved(floor)
      writeCheckpoint(f, dir, floor, action, schemaJson, files)
    }
    val now = System.currentTimeMillis()
    def oldEnough(p: Path): Boolean =
      now - f.getFileStatus(p).getModificationTime >= minAgeMs
    val dead = dataFiles(f, dir).filterNot(referenced.contains)
    val (expired, orphans) = dead.partition(historical.contains)
    val sweepOrphans = orphans.filter(n => oldEnough(new Path(dir, n)))
    (expired ++ sweepOrphans).foreach(n =>
      f.delete(new Path(dir, n), false))
    drop.foreach { v =>
      f.delete(deltaPath(dir, v), false)
      if (cps.contains(v)) f.delete(checkpointPath(dir, v), false)
    }
    // crashed commits: stranded _tmp records are never readable, and
    // a crashed maintenance batch's _staging-* shell holds only files
    // no record ever referenced — both age-gated (a LIVE commit's tmp
    // or staging looks identical until it publishes)
    val tmps = f.listStatus(new Path(dir, LogDir)).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith("_tmp.") && oldEnough(p))
    tmps.foreach(f.delete(_, false))
    val staging = f.listStatus(new Path(dir)).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("_staging") &&
        now - s.getModificationTime >= minAgeMs)
      .map(_.getPath)
    staging.foreach(f.delete(_, true))
    ExpireStats(drop.size + tmps.size,
      expired.size + sweepOrphans.size + staging.size)
  }
}
