package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe GLOBAL window primitives (total-order row_number / ntile).
  *
  * Spark plans an unpartitioned window as `Exchange SinglePartition` →
  * one task sorting the whole input — the classic 100×-scale detonation
  * (and the source of the "WindowExec: No Partition Defined" warning).
  * The scalable shape is the zipWithIndex discipline lifted to SQL:
  *
  *  1. `repartitionByRange` on the sort key — range partitions are
  *     totally ordered across partition ids, each sorted independently
  *     in parallel;
  *  2. per-partition `row_number` keyed by the materialized partition
  *     id (a real partitioned window — parallel, spillable);
  *  3. one count per range partition (a partitions-sized table, one row
  *     per partition) collected to the driver, prefix-summed, and
  *     broadcast-joined back as each partition's global offset.
  *
  * The only single-point step is the prefix sum over ~numPartitions
  * rows. ntile then needs no second pass: with the total row count n
  * known, the SQL-standard tile of global row r is pure arithmetic
  * (first n mod k tiles carry ⌈n/k⌉ rows, the rest ⌊n/k⌋).
  *
  * The range-repartitioned frame is localCheckpointed so the count pass
  * and the output pass see the SAME partitioning (and the upstream scan
  * runs once).
  */
object GlobalWindow {

  /** `df` plus a global 1-based `out` row number under `order`.
    * `order` must be a total order (include a tiebreaker column) for
    * the numbering to be deterministic. */
  def rowNumber(df: DataFrame, order: Seq[Column],
      out: String = "rn"): DataFrame =
    numbered(df, order)._1.withColumnRenamed("__grn", out)
      .drop("__pid")

  /** `df` plus the SQL-standard `ntile(k)` bucket over a GLOBAL
    * `order`, computed without any single-partition window. */
  def ntile(df: DataFrame, k: Int, order: Seq[Column],
      out: String = "tile"): DataFrame = {
    require(k > 0, s"ntile bucket count must be positive, got $k")
    val (rn, total) = numbered(df, order)
    val base = total / k
    val rem = total % k
    val cut = rem * (base + 1)
    // CASE is lazy per-row, so the DIV base branch never evaluates when
    // base == 0 (n < k ⇒ every row lands in the first branch)
    val tile = expr(
      s"""CAST(CASE WHEN __grn <= ${cut}L
         |  THEN (__grn - 1L) DIV ${base + 1}L + 1L
         |  ELSE ${rem}L + (__grn - 1L - ${cut}L) DIV ${base}L + 1L
         |END AS INT)""".stripMargin)
    rn.withColumn(out, tile).drop("__pid", "__grn")
  }

  /** Core: range-partitioned global numbering in `__grn`, plus the
    * total row count (free — it is the offset table's sum). */
  private def numbered(df: DataFrame,
      order: Seq[Column]): (DataFrame, Long) = {
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(nPart, order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val wPart = Window.partitionBy(col("__pid")).orderBy(order: _*)
    // one row PER RANGE PARTITION — inherently driver-sized (the same
    // contract as collecting HLL registers), not a data-sized collect
    val counts = ranged.groupBy("__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var off = 0L
    val offsets = counts.map { case (pid, c) =>
      val o = off; off += c; (pid, o)
    }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val out = ranged
      .join(broadcast(offDf), "__pid")
      .withColumn("__grn", row_number().over(wPart) + col("__off"))
      .drop("__off")
    (out, off)
  }
}
