package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Z-order clustering: (1) the magic-number spread equals the
  * bit-at-a-time Morton reference; (2) the layout's point — a z-ordered
  * write prunes FILES on both key dimensions, a single-column sort
  * prunes only its own — measured on real parquet files via per-file
  * min/max (exactly the stats a reader's row-group pruning uses). */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  private def mortonRef(x: Int, y: Int): Long = {
    var r = 0L
    for (i <- 0 until 16)
      r |= (((x >> i) & 1).toLong << (2 * i)) |
        (((y >> i) & 1).toLong << (2 * i + 1))
    r
  }

  test("zvalue equals the bit-at-a-time Morton reference") {
    val rnd = new scala.util.Random(42)
    val pairs = (for (_ <- 1 to 200) yield
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.zvalue(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0).toInt, r.getLong(1).toInt),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  private def morton3Ref(x: Int, y: Int, z: Int): Long = {
    var r = 0L
    for (i <- 0 until 10)
      r |= (((x >> i) & 1).toLong << (3 * i)) |
        (((y >> i) & 1).toLong << (3 * i + 1)) |
        (((z >> i) & 1).toLong << (3 * i + 2))
    r
  }

  test("zvalue3 equals the bit-at-a-time 3-D Morton reference") {
    val rnd = new scala.util.Random(7)
    val triples = (for (_ <- 1 to 200) yield
      (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong,
        rnd.nextInt(1024).toLong)) ++
      Seq((0L, 0L, 0L), (1023L, 1023L, 1023L), (1023L, 0L, 0L),
        (0L, 1023L, 0L), (0L, 0L, 1023L))
    val got = triples.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        ZOrder.zvalue3(col("x"), col("y"), col("z")).as("m"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(3) == morton3Ref(r.getLong(0).toInt,
        r.getLong(1).toInt, r.getLong(2).toInt),
        s"(${r.getLong(0)}, ${r.getLong(1)}, ${r.getLong(2)})")
    }
  }

  test("zvalue masks inputs to 16 bits") {
    val row = Seq((65536L + 3L, (1L << 20) + 5L)).toDF("x", "y")
      .select(ZOrder.zvalue(col("x"), col("y"))).head()
    assert(row.getLong(0) == mortonRef(3, 5))
  }

  test("quantize maps range endpoints to 0 and 2^bits-1") {
    val df = Seq(10L, 1000L, 505L).toDF("v")
      .withColumn("q", ZOrder.quantize(col("v"), lit(10L), lit(1000L), 8))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(10L) == 0L && m(1000L) == 255L)
    assert(m(505L) >= 126L && m(505L) <= 128L)
    // degenerate range: all values land on 0, no divide-by-zero
    val one = Seq(7L).toDF("v")
      .select(ZOrder.quantize(col("v"), lit(7L), lit(7L), 8)).head()
    assert(one.getLong(0) == 0L)
  }

  /** Files whose [min, max] of `dim` intersect the point predicate — the
    * set a min/max-pruning reader must open. */
  private def filesTouched(written: DataFrame, dim: String, point: Long): Long =
    written.groupBy(input_file_name())
      .agg(min(dim).as("lo"), max(dim).as("hi"))
      .filter(col("lo") <= point && col("hi") >= point)
      .count()

  test("z-ordered layout prunes files on both dimensions; linear sort on one") {
    // 64×64 grid — uniform 2-D key space, 16 files of 256 rows each
    val grid = spark.range(0L, 4096L)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val root = Files.createTempDirectory("zorder-spec").toString

    ZOrder.cluster(grid, ZOrder.zvalue(col("x"), col("y")), 16)
      .write.parquet(s"$root/z")
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$root/linear")

    val z = spark.read.parquet(s"$root/z")
    val lin = spark.read.parquet(s"$root/linear")
    val nz = z.select(input_file_name()).distinct().count()
    val nl = lin.select(input_file_name()).distinct().count()
    assert(nz == 16 && nl == 16)

    // z-order: a point predicate on EITHER dim touches ~sqrt(16) files
    val zx = filesTouched(z, "x", 17L)
    val zy = filesTouched(z, "y", 17L)
    assert(zx <= 8, s"z-layout x-predicate touched $zx/16 files")
    assert(zy <= 8, s"z-layout y-predicate touched $zy/16 files")

    // linear-by-x: perfect on x, NO pruning on y (every file spans all y)
    val lx = filesTouched(lin, "x", 17L)
    val ly = filesTouched(lin, "y", 17L)
    assert(lx <= 2, s"x-sorted layout x-predicate touched $lx/16 files")
    assert(ly == 16, s"x-sorted layout y-predicate touched $ly/16 files")
  }

  test("compact re-clusters an arrival-order directory for data skipping") {
    val grid = spark.range(0L, 4096L)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val root = Files.createTempDirectory("zorder-compact").toString
    // ingest accumulation: round-robin files have NO locality on either
    // dim — a point predicate opens every file
    grid.repartition(16).write.parquet(s"$root/raw")
    val raw = spark.read.parquet(s"$root/raw")
    assert(filesTouched(raw, "x", 17L) == 16)
    assert(filesTouched(raw, "y", 17L) == 16)

    val n = ZOrder.compact(spark, s"$root/raw", s"$root/opt", "x", "y", 16)
    assert(n == 4096L) // row conservation, asserted before any swap
    val opt = spark.read.parquet(s"$root/opt")
    assert(opt.columns.toSet == Set("x", "y", "zval"))
    assert(opt.select(input_file_name()).distinct().count() == 16)
    val cx = filesTouched(opt, "x", 17L)
    val cy = filesTouched(opt, "y", 17L)
    assert(cx <= 8, s"compacted x-predicate touched $cx/16 files")
    assert(cy <= 8, s"compacted y-predicate touched $cy/16 files")
  }
}
