package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering — [[ZOrder]]'s sibling layout with strictly
  * better locality. The Morton curve is cheap (pure bit interleave) but
  * JUMPS: consecutive z-values can be grid-diagonal neighbors a whole
  * quadrant apart, so a file of contiguous z-values can still span a
  * wide rectangle on one dimension. The Hilbert curve's defining
  * property is UNIT STEPS — consecutive curve positions are always
  * Manhattan-distance-1 grid neighbors (HilbertSpec pins this over the
  * full grid, and pins the classic xy2d reference bit-for-bit) — so
  * equal-count file cuts cover tighter hyper-rectangles and min/max
  * footer pruning touches fewer files for the same predicate
  * (measured side-by-side with Z-order in HilbertSpec).
  *
  * The index is the classic per-bit rotate/reflect recursion (Hilbert
  * 1891; the xy2d form of Warren's Hacker's Delight treatment). The
  * loop is data-dependent, so rather than one giant expression (whose
  * tree doubles per round) each round materializes as a PROJECTION —
  * `withColumn` per round, all built-ins, whole-stage-codegen'd into
  * one map stage; engine-exact integer arithmetic, so the same
  * unrolled rounds run as chained CTEs in the DuckDB oracle
  * (q_hilbert_layout). */
object Hilbert {

  /** Append column `out` = Hilbert curve distance of the quantized
    * non-negative coordinates (`x`, `y`), both < 2^bits. One projection
    * per bit round; input columns are untouched. */
  def withIndex(df: DataFrame, x: Column, y: Column, bits: Int,
      out: String = "hval"): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits must be 1..16: $bits")
    val n = 1L << bits
    var cur = df.withColumn("__hx", x.cast("long"))
      .withColumn("__hy", y.cast("long"))
      .withColumn(out, lit(0L))
    var s = n >> 1
    while (s > 0) {
      val rx = when(col("__hx").bitwiseAND(lit(s)) > 0, lit(1L))
        .otherwise(lit(0L))
      val ry = when(col("__hy").bitwiseAND(lit(s)) > 0, lit(1L))
        .otherwise(lit(0L))
      cur = cur.withColumn("__rx", rx).withColumn("__ry", ry)
        .withColumn(out, col(out) +
          lit(s * s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        // rotate/reflect the quadrant frame (the ry==0 branch of the
        // classic rot(): reflect when rx==1, then swap x/y)
        .withColumn("__nx",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(n - 1) - col("__hy"))
              .otherwise(col("__hy")))
            .otherwise(col("__hx")))
        .withColumn("__ny",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(n - 1) - col("__hx"))
              .otherwise(col("__hx")))
            .otherwise(col("__hy")))
        .withColumn("__hx", col("__nx"))
        .withColumn("__hy", col("__ny"))
      s >>= 1
    }
    cur.drop("__hx", "__hy", "__rx", "__ry", "__nx", "__ny")
  }

  /** Cluster for data skipping — [[ZOrder.cluster]]'s contract with the
    * Hilbert key: one range shuffle into `numFiles` write tasks, each
    * sorted so footer min/max stats are tight on both dimensions. */
  def cluster(df: DataFrame, x: Column, y: Column, bits: Int,
      numFiles: Int): DataFrame =
    withIndex(df, x, y, bits)
      .repartitionByRange(numFiles, col("hval"))
      .sortWithinPartitions("hval")
}
