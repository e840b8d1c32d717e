package graft

import java.nio.file.Files

import graft.ingest.SampleBlocks

/** CLI parity with the reference's two commands: `run` lands range-named
  * tables off a block directory and resumes from its checkpoint; `setup`
  * probes a store URL. */
class CliMainSpec extends SparkSuite {

  test("run lands range-named main+child tables; rerun is a no-op resume") {
    val in = Files.createTempDirectory("cli-in").toString + "/blocks"
    val out = Files.createTempDirectory("cli-out").toString
    SampleBlocks.blocksDF(spark, 12000L).write.parquet(in)
    CliMain.main(Array("run", in, out, "--explode",
      "--partition-size", "5000"))
    val mains = new java.io.File(s"$out/main").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq.sorted
    assert(mains == Seq("0000000000-0000005000.parquet",
      "0000005000-0000010000.parquet"))
    // child table exploded alongside
    assert(new java.io.File(out).listFiles().map(_.getName).toSet
      .exists(n => n != "main" && n != "_checkpoint"))
    val rows = spark.read.parquet(s"$out/main/${mains.head}").count()
    assert(rows == 5000L)
    // resume with the same checkpoint: nothing new -> files unchanged
    CliMain.main(Array("run", in, out, "--explode",
      "--partition-size", "5000"))
    val again = new java.io.File(s"$out/main").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq.sorted
    assert(again == mains)
  }

  test("setup probes a writable store URL") {
    val dir = Files.createTempDirectory("cli-probe").toString
    CliMain.main(Array("setup", s"file://$dir"))
  }
}
