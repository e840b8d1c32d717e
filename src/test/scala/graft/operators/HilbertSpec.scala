package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Hilbert: the engine's unrolled rounds must equal the classic xy2d
  * reference bit-for-bit; the curve must take UNIT STEPS over the full
  * grid (the locality property Z-order lacks — Morton's max jump on
  * the same grid is quadrant-sized); and the clustered layout must
  * prune files on both dimensions at least as well as Z-order. */
class HilbertSpec extends SparkSuite {
  import spark.implicits._

  /** Classic xy2d (rotate/reflect per bit plane). */
  private def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var (x, y) = (x0, y0)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("withIndex equals the classic xy2d reference bit-for-bit") {
    val rnd = new scala.util.Random(42)
    for (bits <- Seq(4, 8, 16)) {
      val m = (1L << bits) - 1
      val pts = (for (_ <- 1 to 150) yield
        (math.abs(rnd.nextLong()) & m, math.abs(rnd.nextLong()) & m)) ++
        Seq((0L, 0L), (m, m), (m, 0L), (0L, m))
      val got = Hilbert.withIndex(pts.toDF("x", "y"), col("x"), col("y"),
          bits).select("x", "y", "hval")
        .as[(Long, Long, Long)].collect()
      got.foreach { case (x, y, h) =>
        assert(h == xy2d(bits, x, y), s"bits=$bits ($x,$y)")
      }
    }
  }

  test("the curve takes unit steps over the FULL grid; Morton jumps") {
    val bits = 5 // 32x32 = 1024 cells, exhaustive
    val side = 1L << bits
    val grid = (for (x <- 0L until side; y <- 0L until side) yield (x, y))
      .toDF("x", "y")
    val byH = Hilbert.withIndex(grid, col("x"), col("y"), bits)
      .select("hval", "x", "y").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    // a space-FILLING curve: hvals are exactly 0..n²-1
    assert(byH.map(_._1).toSeq == (0L until side * side).toSeq)
    // the defining property: every consecutive pair is manhattan-1
    byH.sliding(2).foreach { case Array((_, x1, y1), (h2, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at hval $h2: ($x1,$y1)->($x2,$y2)")
    }
    // Morton on the same grid jumps quadrant-wide (the locality gap
    // Hilbert exists to close)
    val byZ = grid.select(col("x"), col("y"),
        ZOrder.zvalue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    val maxZJump = byZ.sliding(2).map {
      case Array((x1, y1, _), (x2, y2, _)) =>
        math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    info(s"morton max step $maxZJump vs hilbert 1")
    assert(maxZJump >= side, s"expected quadrant-sized Morton jump")
  }

  private def filesTouched(df: org.apache.spark.sql.DataFrame,
      dim: String, v: Long): Long =
    df.filter(col(dim) === v).select(input_file_name()).distinct().count()

  test("hilbert layout prunes files on both dimensions, no worse than " +
      "z-order") {
    val grid = spark.range(0L, 4096L)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val root = Files.createTempDirectory("hilbert-spec").toString
    Hilbert.cluster(grid, col("x"), col("y"), bits = 6, numFiles = 16)
      .write.parquet(s"$root/h")
    ZOrder.cluster(grid, ZOrder.zvalue(col("x"), col("y")), 16)
      .write.parquet(s"$root/z")
    val h = spark.read.parquet(s"$root/h")
    val z = spark.read.parquet(s"$root/z")
    assert(h.select(input_file_name()).distinct().count() == 16)
    val probes = Seq(3L, 17L, 33L, 60L)
    val (hx, hy) = (probes.map(filesTouched(h, "x", _)).sum,
      probes.map(filesTouched(h, "y", _)).sum)
    val (zx, zy) = (probes.map(filesTouched(z, "x", _)).sum,
      probes.map(filesTouched(z, "y", _)).sum)
    info(s"files touched over ${probes.size} probes: hilbert x=$hx y=$hy, " +
      s"z-order x=$zx y=$zy")
    // both dims prune (a 16-file layout where a point predicate reads
    // everything would sum to 64)
    assert(hx <= 32 && hy <= 32)
    // the locality claim: hilbert never does worse than morton in total
    assert(hx + hy <= zx + zy,
      s"hilbert ${hx + hy} vs z-order ${zx + zy}")
  }
}
