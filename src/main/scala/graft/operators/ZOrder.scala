package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering — the data-skipping
  * write layout for 100 TB corpora queried on MORE THAN ONE dimension.
  *
  * A single-column sort-on-write gives parquet row-group min/max pruning
  * on that one column only: a layout sorted by time prunes time-range
  * scans but reads EVERY file for a user/source/quality predicate.
  * Interleaving the bits of two (or more) quantized key columns into one
  * z-value and range-partitioning + sorting by it makes every output
  * file cover a small HYPER-RECTANGLE of the key space, so min/max
  * footer stats prune scans on EITHER dimension (at √ selectivity per
  * dim for 2-D — the classic space-filling-curve trade). This is the
  * layout step a training-data pipeline runs once at ingest so that
  * curriculum sampling ("source S, quality decile ≥ 8") and audit scans
  * ("everything from day D") both read a tiny file subset instead of the
  * corpus.
  *
  * Spark-first: the z-value is a pure column expression (magic-number
  * bit spreading — shifts/masks, all codegen'd inside whole-stage
  * codegen; no UDF), and the layout is `repartitionByRange(zval) +
  * sortWithinPartitions(zval)` — one range shuffle at write time, the
  * exact cost a plain sort-on-write already pays. AQE coalescing and
  * `maxRecordsPerFile` then bound file sizes as usual.
  *
  * Engine-exact arithmetic (integer shifts/masks + one float divide with
  * identical operand order) so the computation is DuckDB-oracle-checkable
  * — see `q_zorder_layout` in [[graft.queries.Pipeline]].
  */
object ZOrder {

  /** Bits per dimension for the 2-D interleave (16 → 32-bit z-values). */
  val MaxBits = 16

  /** Spread the low 16 bits of `c` so bit i lands at bit 2·i — the
    * magic-number Morton spread (4 shift/mask rounds, vs 16 for the
    * bit-at-a-time loop). Input is masked to 16 bits first; output fits
    * in 32 bits, so two interleaved dims stay well inside a long. */
  def spread16(c: Column): Column = {
    val rounds = Seq(8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL,
      2 -> 0x33333333L, 1 -> 0x55555555L)
    rounds.foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }
  }

  /** 2-D z-value: x in even bits, y in odd bits. Both inputs are
    * quantized non-negative ints < 2^16 (see [[quantize]]). */
  def zvalue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Bits per dimension for the 3-D interleave (10 → 30-bit z-values). */
  val MaxBits3 = 10

  /** Morton spread for the 3-D interleave: bit i of the low 10 bits
    * lands at bit 3·i (the part1by2 magic numbers). */
  def spread10(c: Column): Column = {
    val rounds = Seq(16 -> 0xFF0000FFL, 8 -> 0x0F00F00FL,
      4 -> 0xC30C30C3L, 2 -> 0x49249249L)
    rounds.foldLeft(c.bitwiseAND(lit(0x3FFL))) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }
  }

  /** 3-D z-value over 10-bit quantized dims — the (source, quality,
    * time) clustering key of a training corpus: curriculum sampling
    * filters on any subset of the three and still prunes files. */
  def zvalue3(x: Column, y: Column, z: Column): Column =
    spread10(x).bitwiseOR(shiftleft(spread10(y), 1))
      .bitwiseOR(shiftleft(spread10(z), 2))

  /** Affine integer quantization of `c` over [dmin, dmax] to
    * [0, 2^bits): floor((c - dmin) · (2^bits - 1) / (dmax - dmin)).
    * One float divide with fixed operand order — bit-identical across
    * engines (the numerator stays ≤ (dmax - dmin) · 2^16, far inside
    * double exactness for any key whose RANGE fits in ~2^36; quantize a
    * coarser unit first for wider keys, e.g. days not nanos). */
  def quantize(c: Column, dmin: Column, dmax: Column,
               bits: Int = 8): Column = {
    require(bits >= 1 && bits <= MaxBits, s"bits must be 1..$MaxBits")
    val k = (1L << bits) - 1
    floor((c - dmin).cast("double") * k / greatest(dmax - dmin, lit(1L)))
      .cast("long")
  }

  /** Cluster `df` for data skipping: one range shuffle on the z-value
    * into `numFiles` write tasks, each sorted so parquet row-group
    * min/max stats are tight on BOTH underlying dimensions. The z
    * column is kept (cheap, and lets readers range-filter on it
    * directly); drop it after write if undesired. */
  def cluster(df: DataFrame, z: Column, numFiles: Int): DataFrame =
    df.withColumn("zval", z)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")

  /** OPTIMIZE-style maintenance pass: re-cluster a parquet directory's
    * accumulated files (streaming ingest writes in ARRIVAL order — over
    * time no file has locality on any query dimension) into `numFiles`
    * z-ordered files at `outDir`. The quantization frame is computed
    * from the data itself and broadcast (1 row); output carries the
    * input schema plus `zval`. Writing BESIDE the live directory keeps
    * readers unblocked — atomically swapping the result in is the
    * caller's publish concern (RangeSink-style staged rename). Returns
    * the compacted row count so callers can assert conservation before
    * swapping.
    *
    * Ingest directories can hold files with HETEROGENEOUS schemas (the
    * RangeSink schema-evolution contract merges columns mid-range), so
    * the read is `mergeSchema=true`: the output schema is the COLUMN
    * UNION across all input footers (files missing a column yield
    * nulls), plus `zval`. A plain footer-schema read would silently
    * drop columns present only in other files while still conserving
    * the row count. Row conservation is asserted here, before any
    * caller could swap the output in for the live directory. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              dimX: String, dimY: String, numFiles: Int,
              bits: Int = 8): Long = {
    // the row count rides the min/max aggregation pass (cached 1-row
    // frame) — a separate df.count() was a third full read of the input
    // directory next to the stats pass and the write pass
    val df = spark.read.option("mergeSchema", "true").parquet(inDir)
    val stats = df.agg(min(dimX).as("__minx"), max(dimX).as("__maxx"),
      min(dimY).as("__miny"), max(dimY).as("__maxy"),
      count(lit(1)).as("__n")).cache()
    val inCount = stats.head().getLong(4)
    df.crossJoin(broadcast(stats.drop("__n")))
      .withColumn("zval", zvalue(
        quantize(col(dimX), col("__minx"), col("__maxx"), bits),
        quantize(col(dimY), col("__miny"), col("__maxy"), bits)))
      .drop("__minx", "__maxx", "__miny", "__maxy")
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(outDir)
    stats.unpersist()
    val outCount = spark.read.parquet(outDir).count()
    require(outCount == inCount,
      s"compact lost rows: read $inCount from $inDir, wrote $outCount to $outDir")
    outCount
  }
}
