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

  /** Resolve the change set to one winner per key (composite keys
    * first-class — real dimension tables key on (tenant, id) shapes):
    * latest `version`, duplicate (key, version) rejected.
    * Change-sized frame. */
  /** The result is MATERIALIZED (localCheckpoint) — callers read it
    * several ways (key frame, tombstone split, write) without
    * re-scanning the change parquet. */
  private[operators] def resolve(changes: DataFrame, keys: Seq[String],
      versionCol: Option[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    versionCol match {
      case None =>
        val dups = changes.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).limit(1).collect()
        require(dups.isEmpty, s"changes carry duplicate rows for key " +
          s"${dups.headOption.map(_.toSeq.init)} and no --version " +
          "column names a winner")
        changes.localCheckpoint()
      case Some(v) =>
        // ONE window pass computes both the winner rank and the
        // duplicate flag (a duplicate (keys, v) tuple ⇔ the previous
        // row in version-desc order within the key carries the same
        // version — null-safe, so null-version duplicates stay loud);
        // the dup check previously paid its own groupBy SHUFFLE over a
        // SECOND scan of the change parquet (optimization r18,
        // guide §2.4/§1.2: same-keyed passes share one exchange)
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col(v).desc)
        val marked = changes
          .withColumn("__rn", row_number().over(w))
          .withColumn("__dup", lag(col(v), 1).over(w) <=> col(v))
          .localCheckpoint()
        val dup = marked.filter(col("__dup")).limit(1).collect()
        require(dup.isEmpty,
          s"duplicate (${keys.mkString(", ")}, $v) tuple " +
            s"${dup.headOption.map(_.toSeq.dropRight(2))} has no " +
            "defined winner")
        marked.filter(col("__rn") === 1).drop("__rn", "__dup")
    }
  }

  /** Flat-layout file inventory of `tableDir` + byte-for-byte copy of
    * every file NOT in `touched` to `outDir`; returns the copied count.
    * Fails loudly on hive-partitioned trees (per-directory recursion
    * and partition-column reconstruction are a different code path —
    * silently dropping nested files from the copy would corrupt). */
  private[operators] def copyUntouched(spark: SparkSession,
      tableDir: String, outDir: String, touched: Set[String]): Int =
    copyFiles(spark, listFlat(spark, tableDir), outDir, touched)

  /** Flat-layout data-file listing; fails loudly on hive-partitioned
    * trees (per-directory recursion and partition-column
    * reconstruction are a different code path — silently dropping
    * nested files from the copy would corrupt; see
    * [[graft.ingest.TableImport]] for re-landing such trees) and on
    * [[graft.ingest.TableLog]]-versioned directories (r17): once a
    * versioned table retains ≥2 snapshots the raw directory holds
    * superseded `v<N>-` files side by side, and a plain listing would
    * silently fold stale/duplicate rows into a merge — route through
    * `TableLog.snapshotFiles` + the `*Shared` forms instead. */
  private[graft] def listFlat(spark: SparkSession, tableDir: String)
      : Seq[org.apache.hadoop.fs.Path] = {
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new org.apache.hadoop.fs.Path(tableDir,
      "_graft_log")),
      s"$tableDir is TableLog-versioned: a raw-directory listing " +
        "mixes every retained version's files (silent stale/duplicate " +
        "rows); use TableLog.snapshotFiles with mergeShared/" +
        "mergeScd2Shared/incrementShared instead")
    val entries = fs.listStatus(new org.apache.hadoop.fs.Path(tableDir))
      .filterNot(s => s.getPath.getName.startsWith("_")
        || s.getPath.getName.startsWith("."))
    val subdirs = entries.filter(_.isDirectory).map(_.getPath.getName)
    require(subdirs.isEmpty, "upsert requires a flat parquet directory; " +
      s"found subdirectories: ${subdirs.mkString(", ")}")
    entries.filter(_.isFile).map(_.getPath).toSeq
  }

  /** Byte-for-byte copy of every listed file NOT in `touched` into
    * `outDir`; returns the copied count. Matching is on the URI PATH
    * component: `touched` comes from `input_file_name()`
    * ("file:///x"), `all` from listings or manifests ("/x" or
    * "file:/x") — comparing raw strings silently copies touched files
    * too, duplicating their rows beside the rewrite. */
  private[graft] def copyFiles(spark: SparkSession,
      all: Seq[org.apache.hadoop.fs.Path], outDir: String,
      touched: Set[String]): Int = {
    if (all.isEmpty) return 0
    val fs = all.head
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    fs.mkdirs(outPath)
    val touchedPaths = touched.map(s =>
      new org.apache.hadoop.fs.Path(s).toUri.getPath)
    val untouched = all.filterNot(p =>
      touchedPaths.contains(p.toUri.getPath))
    untouched.foreach { p =>
      org.apache.hadoop.fs.FileUtil.copy(fs, p, fs,
        new org.apache.hadoop.fs.Path(outPath, p.getName),
        false, spark.sparkContext.hadoopConfiguration)
    }
    untouched.size
  }

  /** Merge `changesDir` into the parquet table at `tableDir`, writing
    * the result BESIDE the live table at `outDir` (the ZOrder.compact
    * deploy contract: swapping it in is the caller's step). */
  def merge(spark: SparkSession, tableDir: String, changesDir: String,
      outDir: String, keys: Seq[String],
      versionCol: Option[String] = None,
      tombstoneCol: Option[String] = None): Stats = {
    val (st, untouched) = mergeShared(spark,
      listFlat(spark, tableDir).map(_.toString), changesDir, outDir,
      keys, versionCol, tombstoneCol)
    val copied = copyFiles(spark,
      untouched.map(new org.apache.hadoop.fs.Path(_)), outDir, Set.empty)
    st.copy(filesCopied = copied)
  }

  /** ZERO-COPY SCD1 merge for [[graft.ingest.TableLog]]-versioned
    * tables: rewrites only touched files into `outDir` and returns
    * the untouched list for the commit's `carry`.
    *
    * SCHEMA EVOLUTION (add-column slice, r16): the change feed may
    * carry a SUPERSET of the table's columns — the table side widens
    * with nulls, survivors in touched files null-fill on read, and
    * untouched files carry unchanged (TableLog records the union
    * schema at commit, so its readers reconcile; a PLAIN directory
    * merge mixes schemas across files and needs mergeSchema to read —
    * prefer the versioned path for evolved tables). A change feed
    * MISSING table columns is still an error. */
  def mergeShared(spark: SparkSession, tableFiles: Seq[String],
      changesDir: String, outDir: String, keys: Seq[String],
      versionCol: Option[String] = None,
      tombstoneCol: Option[String] = None,
      probeFiles: Option[Seq[String]] = None): (Stats, Seq[String]) = {
    require(tableFiles.nonEmpty, "empty table file list")
    require(keys.nonEmpty, "upsert needs at least one key column")
    // `probeFiles` (r18): a SOUND subset of tableFiles to run the
    // touched-file probe over — every file that could hold a change
    // key MUST be in it (TableLog.statsCandidates derives one from
    // the log's per-file key stats); files outside it carry
    // untouched without even a key-column scan, so a point upsert on
    // a stats-covered million-file table probes a handful of files.
    probeFiles.foreach { p =>
      val t = tableFiles.toSet
      val foreign = p.filterNot(t.contains)
      require(foreign.isEmpty,
        s"probeFiles not in tableFiles: ${foreign.take(3).mkString(", ")}")
    }
    val table0 = spark.read.parquet(tableFiles: _*)
    val resolved = resolve(spark.read.parquet(changesDir), keys,
      versionCol)
    val upsertRows = tombstoneCol
      .map(t => resolved.filter(!coalesce(col(t), lit(false))).drop(t))
      .getOrElse(resolved)
    val missing = table0.columns.filterNot(upsertRows.columns.contains)
    require(missing.isEmpty,
      s"changes schema ${upsertRows.columns.sorted.mkString(",")} is " +
        s"missing table columns ${missing.sorted.mkString(",")}")
    // widen the table side for an evolved (superset) change feed: new
    // columns append in the feed's order; reading old files under the
    // widened schema null-fills them
    val newCols = upsertRows.columns.filterNot(table0.columns.contains)
    val tableSchema = org.apache.spark.sql.types.StructType(
      table0.schema.fields ++ newCols.map(upsertRows.schema(_)))
    val table = if (newCols.isEmpty) table0
      else spark.read.schema(tableSchema).parquet(tableFiles: _*)

    // the affected-key frame: key columns only, change-sized, read
    // three ways (touched-file probe, rewrite anti-join, insert
    // anti-join) — a projection over resolve's materialized frame, so
    // each read is a cache scan (the previous shape paid a SECOND
    // localCheckpoint materialization plus its own count job). One
    // aggregation job yields every change-sized statistic at once:
    // resolve guarantees one row per key, so total rows = nKeys, and
    // the tombstone split is a conditional sum in the same pass
    // (optimization r18 — was three separate count jobs).
    val keyRows = resolved.select(keys.map(col): _*)
    val statsRow = resolved.agg(
      count(lit(1)).as("n"),
      coalesce(sum(tombstoneCol
        .map(t => when(coalesce(col(t), lit(false)), 1L).otherwise(0L))
        .getOrElse(lit(0L))), lit(0L)).as("dels")).head()
    val nKeys = statsRow.getLong(0)
    val nDeletes = statsRow.getLong(1)
    val nUpsertRows = nKeys - nDeletes
    def keySide(df: DataFrame): DataFrame =
      if (nKeys <= BroadcastKeyRows) broadcast(df) else df

    // touched files AND the present-key count from ONE key-columns-only
    // scan of the probe subset (ReadSchema prunes to the keys; the
    // whole table unless the caller proved a smaller sound set): the
    // inner join against the change keys (unique per key after resolve,
    // so no row blowup) yields every (table row, matching key) hit —
    // collect_set of the hit files is the touched set, and the distinct
    // non-tombstone keys among the hits are the upsert-stat `present`
    // count that previously paid its OWN full re-read of the touched
    // files plus a distinct + semi-join job (optimization r19, guide
    // §1.2: same-keyed passes share one scan). "present among probed"
    // ≡ "present among touched": a file holding a matching key IS
    // touched.
    val probed = probeFiles.getOrElse(tableFiles)
    val keyDel = resolved.select(keys.map(col) :+
      tombstoneCol.map(t => coalesce(col(t), lit(false)))
        .getOrElse(lit(false)).as("__del"): _*)
    val (touched, present) =
      if (probed.isEmpty) (Set.empty[String], 0L)
      else {
        val hit = spark.read.schema(table.schema).parquet(probed: _*)
          .select(keys.map(col): _*)
          .withColumn("__file", input_file_name())
          .join(keySide(keyDel), keys)
          .agg(collect_set(col("__file")).as("__fs"),
            count_distinct(when(!col("__del"),
              struct(keys.map(col): _*))).as("__present"))
          .head()
        (hit.getSeq[String](0).toSet, hit.getLong(1))
      }

    val touchedPaths = touched.map(s =>
      new org.apache.hadoop.fs.Path(s).toUri.getPath)
    val untouched = tableFiles.filterNot(f =>
      touchedPaths.contains(new org.apache.hadoop.fs.Path(f).toUri.getPath))

    // rewrite ONLY the touched files: survivors (keys not in changes,
    // not tombstoned) + the resolved upsert rows — inserts included by
    // construction (a new key touches no file and simply appends)
    val colOrder = table.columns.toSeq
    val survivors0 =
      if (touched.isEmpty) None
      else Some(spark.read.schema(table.schema)
        .parquet(touched.toSeq: _*)
        .join(keySide(keyRows), keys, "left_anti"))
    val rewritten = survivors0 match {
      case Some(s) => s.select(colOrder.map(col): _*)
        .unionByName(upsertRows.select(colOrder.map(col): _*))
      case None => upsertRows.select(colOrder.map(col): _*)
    }
    rewritten.write.mode("append").parquet(outDir)

    // stats from change-sized frames only (no full-table count):
    // upserts = keys present in the table (counted by the probe scan
    // above), inserts = the rest
    (Stats(
      upserts = present,
      deletes = nDeletes,
      inserts = nUpsertRows - present,
      filesRewritten = touched.size,
      filesCopied = 0), untouched)
  }

  final case class Scd2Stats(versionsClosed: Long, versionsAppended: Long,
    newKeys: Long, filesRewritten: Int, filesCopied: Int)

  /** Type-2 MERGE — incremental maintenance of a landed SCD2 dimension
    * table (the shape `q_scd2`'s kernel emits: key columns + payload +
    * `valid_from`/`valid_to` epoch-micro BIGINTs, NULL valid_to + the
    * `is_current` flag marking the one open version per key). The
    * change feed is RAW NEW EVENTS (key + payload + `tsCol`), not
    * pre-built intervals: the merge closes each affected key's open
    * version at the key's first new timestamp and appends the batch's
    * chained versions, the last one open.
    *
    * CONTRACT — order-final, like [[graft.streaming.Scd2Stats]] but
    * LOUD: every change row's timestamp must be strictly after the
    * landed open version's `valid_from` for its key (equal timestamps
    * included — the kernel tie-breaks equal ts by `seqCol`, so an
    * equal-ts arrival could reorder landed history). A violating row
    * fails the merge rather than silently rewriting closed intervals;
    * replaying the same change batch therefore also fails loudly
    * (SCD2 is append-only in event time — idempotent replay is SCD1's
    * contract, not this one's). Under the contract the merged table
    * EQUALS the kernel's from-scratch rebuild over the union history —
    * UpsertSpec pins `mergeScd2(scd2(H1), H2) ≡ scd2(H1 ∪ H2)`
    * row-for-row.
    *
    * Copy-on-write at file granularity, sharper than SCD1's: only
    * files holding an affected key's OPEN version rewrite (closed
    * history never changes, so a closed-versions file copies
    * byte-for-byte even when its keys are in the change batch); the
    * probe scans key + is_current columns only. */
  def mergeScd2(spark: SparkSession, tableDir: String, changesDir: String,
      outDir: String, keys: Seq[String], tsCol: String = "ts",
      seqCol: String = "event_id"): Scd2Stats = {
    val (st, untouched) = mergeScd2Shared(spark,
      listFlat(spark, tableDir).map(_.toString), changesDir, outDir,
      keys, tsCol, seqCol)
    val copied = copyFiles(spark,
      untouched.map(new org.apache.hadoop.fs.Path(_)), outDir, Set.empty)
    st.copy(filesCopied = copied)
  }

  /** ZERO-COPY Type-2 merge for [[graft.ingest.TableLog]]-versioned
    * tables: rewrites only open-version files into `outDir` and
    * returns the untouched list for the commit's `carry` — at 100 TB a
    * dimension's closed history never costs another byte. */
  def mergeScd2Shared(spark: SparkSession, tableFiles: Seq[String],
      changesDir: String, outDir: String, keys: Seq[String],
      tsCol: String = "ts", seqCol: String = "event_id")
      : (Scd2Stats, Seq[String]) = {
    require(keys.nonEmpty, "mergeScd2 needs at least one key column")
    require(tableFiles.nonEmpty, "empty table file list")
    val table = spark.read.parquet(tableFiles: _*)
    val meta = Seq("valid_from", "valid_to", "is_current")
    require(meta.forall(table.columns.contains),
      s"not an SCD2 table (needs ${meta.mkString(", ")})")
    val payload = table.columns.filterNot(c =>
      keys.contains(c) || meta.contains(c)).toSeq
    require(payload.contains(seqCol),
      s"seq column $seqCol missing from table payload ${payload.mkString(",")}")

    val raw = spark.read.parquet(changesDir)
    require((keys ++ payload :+ tsCol).forall(raw.columns.contains),
      s"changes need ${(keys ++ payload :+ tsCol).mkString(", ")}; " +
        s"got ${raw.columns.mkString(", ")}")
    // chain the batch per key in (ts, seq) order — the kernel's order;
    // an exact duplicate (key, ts, seq) has no defined chain position.
    // The duplicate flag rides the SAME window pass as the chaining
    // lead() (a duplicate ⇔ the previous row in chain order carries the
    // same (valid_from, seq)) — the check previously paid its own
    // groupBy shuffle over a second scan of the change parquet
    // (optimization r18). Detection keys on the DERIVED valid_from
    // micros, which is also what the chain orders by — two raw ts
    // spellings mapping to the same microsecond are now rejected too
    // (they had no defined chain position either; the old raw-ts check
    // silently let the window order them arbitrarily).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("valid_from"), col(seqCol))
    val chain0 = raw
      .select((keys ++ payload).map(col) :+
        expr(s"unix_micros(cast($tsCol as timestamp))")
          .as("valid_from"): _*)
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumn("__dup",
        (lag(col("valid_from"), 1).over(w) <=> col("valid_from")) &&
          (lag(col(seqCol), 1).over(w) <=> col(seqCol)))
      .localCheckpoint()
    // one cache-scan aggregation yields the appended-version count AND
    // the duplicate verdict (the offending row is fetched only on the
    // failure path); was two separate jobs
    val chainAgg = chain0.agg(count(lit(1)).as("n"),
      coalesce(max(when(col("__dup"), lit(1))), lit(0)).as("hasdup"))
      .head()
    if (chainAgg.getInt(1) > 0) {
      val dups = chain0.filter(col("__dup")).limit(1).collect()
      require(dups.isEmpty, "changes carry an exact duplicate " +
        s"(${(keys :+ tsCol :+ seqCol).mkString(", ")}) row: " +
        s"${dups.headOption.map(_.toSeq.dropRight(1))}")
    }
    val nAppended = chainAgg.getLong(0)
    val chain = chain0.drop("__dup")

    // change-key frame: read three ways (probe, survivors, guard)
    val changeKeys = chain.select(keys.map(col): _*).distinct()
      .localCheckpoint()
    val nKeys = changeKeys.count()
    def keySide(df: DataFrame): DataFrame =
      if (nKeys <= BroadcastKeyRows) broadcast(df) else df
    val firstNew = chain.groupBy(keys.map(col): _*)
      .agg(min(col("valid_from")).as("__first_from"))

    // touched files: those holding an affected key's OPEN version —
    // the probe scan prunes to key + is_current columns
    val touched = table.select((keys.map(col) :+ col("is_current")): _*)
      .withColumn("__file", input_file_name())
      .filter(col("is_current"))
      .join(keySide(changeKeys), keys, "left_semi")
      .select("__file").distinct()
      .collect().map(_.getString(0)).toSet

    val touchedPaths = touched.map(s =>
      new org.apache.hadoop.fs.Path(s).toUri.getPath)
    val untouched = tableFiles.filterNot(f =>
      touchedPaths.contains(new org.apache.hadoop.fs.Path(f).toUri.getPath))

    val colOrder = table.columns.toSeq
    val (survivors, closed, nClosed) =
      if (touched.isEmpty) (None, None, 0L)
      else {
        val rows = spark.read.schema(table.schema)
          .parquet(touched.toSeq: _*)
        val openTouched = rows.filter(col("is_current"))
          .join(keySide(changeKeys), keys, "left_semi")
          .localCheckpoint()
        // ORDER-FINAL guard: a change at or before the open version's
        // valid_from would rewrite landed history — fail, don't mangle
        val late = openTouched
          .join(keySide(firstNew), keys)
          .filter(col("__first_from") <= col("valid_from"))
          .limit(1).collect()
        require(late.isEmpty, "change batch reaches into landed " +
          s"history (ts ≤ open version's valid_from): ${late.headOption
            .map(_.toSeq)}; SCD2 merge is append-only in event time")
        val surv = rows
          .join(keySide(changeKeys.withColumn("__chg", lit(true))),
            keys, "left")
          .filter(!(col("is_current") &&
            coalesce(col("__chg"), lit(false))))
          .drop("__chg")
        val cls = openTouched
          .join(keySide(firstNew), keys)
          .withColumn("valid_to", col("__first_from"))
          .withColumn("is_current", lit(false))
          .drop("__first_from")
        (Some(surv), Some(cls), openTouched.count())
      }
    val pieces = Seq(survivors, closed,
      Some(chain)).flatten.map(_.select(colOrder.map(col): _*))
    pieces.reduce(_ unionByName _).write.mode("append").parquet(outDir)

    (Scd2Stats(
      versionsClosed = nClosed,
      versionsAppended = nAppended,
      newKeys = nKeys - nClosed,
      filesRewritten = touched.size,
      filesCopied = 0), untouched)
  }
}
