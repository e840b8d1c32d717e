package graft.ingest

import java.nio.file.{Files, Path => JPath}

import org.apache.hadoop.fs.Path

import graft.SparkSuite

/** Vacuum removes exactly the crash classes and nothing else:
  * published-range staging at any age, dead/expired merge temps and
  * templates, committer _temporary — while unpublished (replayable)
  * staging and young merge temps survive, and published data files
  * are never touched. Idempotent on a clean root. */
class VacuumSpec extends SparkSuite {

  private def mk(root: JPath, rel: String, file: Boolean = false,
      ageMs: Long = 0L): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    if (file) Files.write(p, Array[Byte](1, 2, 3))
    else Files.createDirectories(p)
    if (ageMs > 0) Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - ageMs))
  }

  test("crash classes removed; replayable and live state kept") {
    val root = Files.createTempDirectory("vacuum")
    val hour = 3600000L
    // published data files (range starts 0 and 5000)
    mk(root, "0000000000-0000005000.parquet", file = true)
    mk(root, "0000005000-0000010000.parquet", file = true)
    // staging for PUBLISHED range 0: dead even though young
    mk(root, "_open/epoch=3/__range=0/part-0.parquet", file = true)
    // staging for UNPUBLISHED range 10000: replayable — kept at any age
    mk(root, "_open/epoch=4/__range=10000/part-0.parquet", file = true)
    mk(root, "_open/epoch=4", ageMs = 72 * hour)
    // merge temp whose target EXISTS: dead even though young
    mk(root, ".0000005000-0000010000.parquet.inprogress/part-0.parquet",
      file = true)
    // merge temp with NO target, young: a live merge — kept
    mk(root, ".0000015000-0000020000.parquet.inprogress/part-0.parquet",
      file = true)
    // expired template and committer droppings
    mk(root, "._empty_template/part-0.parquet", file = true)
    mk(root, "._empty_template", ageMs = 48 * hour)
    mk(root, "_temporary/0/task/x", file = true)
    mk(root, "_temporary", ageMs = 48 * hour)

    // dry-run deletes nothing
    val dry = Vacuum.run(spark, root.toString, retentionMs = 24 * hour,
      dryRun = true)
    assert(dry.dropped == 4, dry)
    assert(Files.exists(root.resolve("_open/epoch=3/__range=0")))

    val st = Vacuum.run(spark, root.toString, retentionMs = 24 * hour)
    assert(st == Vacuum.Stats(stagedDropped = 1, stagedKept = 1,
      inprogressDropped = 1, inprogressKept = 1, tmpDropped = 1,
      templatesDropped = 1), st)
    // the dead classes are gone
    assert(!Files.exists(root.resolve("_open/epoch=3/__range=0")))
    assert(!Files.exists(
      root.resolve(".0000005000-0000010000.parquet.inprogress")))
    assert(!Files.exists(root.resolve("._empty_template")))
    assert(!Files.exists(root.resolve("_temporary")))
    // the live/replayable classes survive
    assert(Files.exists(root.resolve("_open/epoch=4/__range=10000")))
    assert(Files.exists(
      root.resolve(".0000015000-0000020000.parquet.inprogress")))
    // published data files are untouched
    assert(Files.exists(root.resolve("0000000000-0000005000.parquet")))
    assert(Files.exists(root.resolve("0000005000-0000010000.parquet")))
    // idempotent: the second pass finds nothing to drop
    val again = Vacuum.run(spark, root.toString, retentionMs = 24 * hour)
    assert(again.dropped == 0, again)
    assert(again.stagedKept == 1 && again.inprogressKept == 1)
  }

  test("expired no-target merge temp falls to the retention clock") {
    val root = Files.createTempDirectory("vacuum2")
    val hour = 3600000L
    mk(root, ".0000000000-0000005000.parquet.inprogress/part-0.parquet",
      file = true)
    mk(root, ".0000000000-0000005000.parquet.inprogress",
      ageMs = 48 * hour)
    val st = Vacuum.run(spark, root.toString, retentionMs = 24 * hour)
    assert(st.inprogressDropped == 1 && st.dropped == 1, st)
    assert(!Files.exists(
      root.resolve(".0000000000-0000005000.parquet.inprogress")))
  }

  test("vacuumed RangeSink root replays to the same published set") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // land two ranges, strand the protocol byproducts a crash would
    // leave, vacuum, then verify the published files still read back
    val root = Files.createTempDirectory("vacuum3").toString
    val sink = RangeSink(root, RangePartitioner(start = 0, size = 5000))
    sink.writeAll(Seq.tabulate(8000)(i =>
      (i.toLong, s"b$i")).toDF("block_number", "block_id"))
    // strand: staging for the published range 0 + an expired template
    mk(java.nio.file.Paths.get(root),
      "_open/epoch=9/__range=0/part-0.parquet", file = true)
    val st = Vacuum.run(spark, root, retentionMs = 0L)
    assert(st.stagedDropped == 1, st)
    val back = spark.read.parquet(
      new Path(root, "0000000000-0000005000.parquet").toString)
    assert(back.count() == 5000L)
    assert(back.agg(min("block_number"), max("block_number"))
      .as[(Long, Long)].head() == ((0L, 4999L)))
  }
}
