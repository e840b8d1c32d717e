package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a landed AGGREGATE table — the rollup
  * counterpart of [[Upsert]]: a 100 TB metrics table (per-key counts /
  * sums / mins / maxes) must absorb a day's raw events WITHOUT
  * re-aggregating history. The landed table stores each aggregate in
  * its MERGEABLE partial form ([[Skew.ReAgg]] — count merges by SUM,
  * sum by sum, min/max by min/max; non-decomposable aggregates like
  * avg are derived downstream as sum/count, enforced by the type), so
  * absorbing a delta is:
  *
  *   1. aggregate the raw delta per key (map-side partials — the
  *      delta's one shuffle is key-partitioned pre-aggregated rows);
  *   2. probe the landed table for files holding an affected key
  *      (key-column-only scan, the [[Upsert]] discipline) — untouched
  *      files copy byte-for-byte;
  *   3. merge = groupBy over (landed rows of affected keys ∪ delta
  *      rows) with each aggregate's merge form — ≤ 2 rows per key,
  *      never history; new keys are groups of 1 and simply append.
  *
  * The merged table EQUALS the from-scratch rollup over the union
  * history — IncrementalAggSpec pins
  * `increment(rollup(H1), H2) ≡ rollup(H1 ∪ H2)` — and unlike SCD2
  * the operation is REPLAY-SENSITIVE in the other direction: applying
  * the same delta twice double-counts, so idempotence belongs to the
  * caller's commit protocol ([[graft.ingest.TableLog]]'s expectedHead
  * makes the second apply of a staged delta a detected conflict).
  *
  * Exactness caveat: the ≡-rebuild pin is bit-exact for integer,
  * decimal, and min/max aggregates (this repo's fixed-point
  * discipline); a DOUBLE sum is partial-order-dependent in the
  * rebuild itself, so sum columns should be long/decimal micro-units
  * here like everywhere else. */
object IncrementalAgg {

  final case class Stats(keysMerged: Long, keysInserted: Long,
    filesRewritten: Int, filesCopied: Int)

  /** The from-scratch rollup: one partial-aggregated shuffle of the
    * raw frame — also the shape the landed table must have. */
  def rollup(raw: DataFrame, keys: Seq[String],
      aggs: Seq[(String, Skew.ReAgg)]): DataFrame = {
    require(keys.nonEmpty && aggs.nonEmpty)
    raw.groupBy(keys.map(col): _*)
      .agg(aggs.head._2.partial.as(aggs.head._1),
        aggs.tail.map { case (n, a) => a.partial.as(n) }: _*)
  }

  /** Absorb the raw events at `deltaDir` into the landed rollup at
    * `tableDir`, writing the result beside it at `outDir` (stage it,
    * then [[graft.ingest.TableLog.commit]] swaps it in atomically). */
  def increment(spark: SparkSession, tableDir: String, deltaDir: String,
      outDir: String, keys: Seq[String],
      aggs: Seq[(String, Skew.ReAgg)]): Stats =
    incrementFiles(spark,
      Upsert.listFlat(spark, tableDir).map(_.toString),
      deltaDir, outDir, keys, aggs)

  /** Same, over an EXPLICIT table file list — the
    * [[graft.ingest.TableLog]] form, where the current snapshot is a
    * manifest's files and the directory also holds other versions'. */
  def incrementFiles(spark: SparkSession, tableFiles: Seq[String],
      deltaDir: String, outDir: String, keys: Seq[String],
      aggs: Seq[(String, Skew.ReAgg)]): Stats = {
    val (st, untouched) = incrementShared(spark, tableFiles, deltaDir,
      outDir, keys, aggs)
    val copied = Upsert.copyFiles(spark,
      untouched.map(new org.apache.hadoop.fs.Path(_)), outDir,
      Set.empty)
    st.copy(filesCopied = copied)
  }

  /** ZERO-COPY form for versioned tables: writes ONLY the rewritten
    * data to `outDir` and returns the untouched files for the caller
    * to CARRY into the next manifest by reference
    * ([[graft.ingest.TableLog.commit]]'s `carry`) — at 100 TB this is
    * the difference between a maintenance pass costing O(touched)
    * bytes and a full-table copy per pass. */
  def incrementShared(spark: SparkSession, tableFiles: Seq[String],
      deltaDir: String, outDir: String, keys: Seq[String],
      aggs: Seq[(String, Skew.ReAgg)]): (Stats, Seq[String]) = {
    require(tableFiles.nonEmpty, "empty table file list — bootstrap " +
      "the rollup with rollup(raw) + TableLog.init first")
    val table = spark.read.parquet(tableFiles: _*)
    val want = (keys ++ aggs.map(_._1)).sorted
    require(table.columns.sorted.sameElements(want),
      s"landed table columns ${table.columns.sorted.mkString(",")} != " +
        s"rollup shape ${want.mkString(",")}")
    val delta = rollup(spark.read.parquet(deltaDir), keys, aggs)
      .localCheckpoint()
    val changeKeys = delta.select(keys.map(col): _*).localCheckpoint()
    val nKeys = changeKeys.count()
    def keySide(df: DataFrame): DataFrame =
      if (nKeys <= Upsert.BroadcastKeyRows) broadcast(df) else df

    val touched = table.select(keys.map(col): _*)
      .withColumn("__file", input_file_name())
      .join(keySide(changeKeys), keys, "left_semi")
      .select("__file").distinct()
      .collect().map(_.getString(0)).toSet
    val touchedPaths = touched.map(s =>
      new org.apache.hadoop.fs.Path(s).toUri.getPath)
    val untouched = tableFiles.filterNot(f =>
      touchedPaths.contains(new org.apache.hadoop.fs.Path(f).toUri.getPath))

    val colOrder = table.columns.toSeq
    val (survivors, affected, nMerged) =
      if (touched.isEmpty) (None, delta, 0L)
      else {
        val rows = spark.read.schema(table.schema)
          .parquet(touched.toSeq: _*)
        val surv = rows.join(keySide(changeKeys), keys, "left_anti")
        val landedAffected = rows.join(keySide(changeKeys), keys,
          "left_semi")
        (Some(surv),
          landedAffected.select(colOrder.map(col): _*)
            .unionByName(delta.select(colOrder.map(col): _*)),
          landedAffected.select(keys.map(col): _*).distinct().count())
      }
    // ≤ 2 rows per key meet here: the landed partial and the delta's
    val merged = affected.groupBy(keys.map(col): _*)
      .agg(aggs.head._2.merge(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, a) => a.merge(col(n)).as(n) }: _*)
    val pieces = (survivors.toSeq :+ merged)
      .map(_.select(colOrder.map(col): _*))
    pieces.reduce(_ unionByName _).write.mode("append").parquet(outDir)

    (Stats(
      keysMerged = nMerged,
      keysInserted = nKeys - nMerged,
      filesRewritten = touched.size,
      filesCopied = 0), untouched)
  }
}
