package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Partition math parity with reference parquet/sinker/partitioner.go:20-36
  * (FIXTURES.md §B scenarios 1 and 6). Property cases use a seeded RNG
  * (no scalatest↔scalacheck bridge in the offline cache). */
class PartitionerSpec extends AnyFunSuite {

  test("rangeFor: half-open ranges from start") {
    val p = RangePartitioner(start = 100, size = 10)
    assert(p.rangeFor(100) == (100L, 110L))
    assert(p.rangeFor(109) == (100L, 110L))
    assert(p.rangeFor(110) == (110L, 120L))
    assert(p.rangeFor(125) == (120L, 130L))
  }

  test("rangeFor: end clamped to stop block (partitioner.go:28-30)") {
    val p = RangePartitioner(start = 100, size = 10, stop = Some(125))
    assert(p.rangeFor(124) == (120L, 125L))
    assert(p.rangeFor(105) == (100L, 110L))
  }

  test("fileName: zero-padded %010d-%010d.parquet (partitioner.go:34-36)") {
    val p = RangePartitioner(start = 19000000, size = 5000)
    assert(p.fileNameFor(19000001) == "0019000000-0019005000.parquet")
    assert(p.fileName(0, 10) == "0000000000-0000000010.parquet")
  }

  test("custom pad width (run.go:33)") {
    val p = RangePartitioner(start = 0, size = 100, pad = 4)
    assert(p.fileNameFor(250) == "0200-0300.parquet")
  }

  test("rangeStartsUpTo: dense sequence for backfill") {
    val p = RangePartitioner(start = 100, size = 10)
    assert(p.rangeStartsUpTo(135) == Seq(100L, 110L, 120L, 130L))
    assert(p.rangeStartsUpTo(99).isEmpty)
  }

  test("property: every block lands in its own range, aligned to start") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val start = rnd.nextLong(1000000L)
      val size = 1 + rnd.nextLong(100000L)
      val block = start + rnd.nextLong(10000000L)
      val p = RangePartitioner(start, size)
      val (rs, re) = p.rangeFor(block)
      assert(rs <= block && block < re, s"start=$start size=$size block=$block")
      assert((rs - start) % size == 0)
      assert(re - rs == size)
    }
  }

  test("property: stop clamps only the final range") {
    val rnd = new scala.util.Random(43)
    (1 to 2000).foreach { _ =>
      val start = rnd.nextLong(1000L)
      val size = 1 + rnd.nextLong(50L)
      val stop = start + 1 + rnd.nextLong(500L)
      val p = RangePartitioner(start, size, stop = Some(stop))
      val lastBlock = stop - 1
      val (rs, re) = p.rangeFor(lastBlock)
      assert(re <= stop, s"start=$start size=$size stop=$stop")
      assert(rs <= lastBlock && lastBlock < re)
    }
  }
}
