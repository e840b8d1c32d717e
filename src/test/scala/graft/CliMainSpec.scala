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

  test("run with a descriptor-set manifest matches the built-in schema run") {
    val in = Files.createTempDirectory("cli-dsin").toString + "/blocks"
    SampleBlocks.blocksDF(spark, 1000L).write.parquet(in)
    val fdset = Files.createTempFile("manifest", ".fdset")
    Files.write(fdset, graft.ingest.DescriptorFixture.fileDescriptorSetBytes)
    val viaManifest = Files.createTempDirectory("cli-dsout").toString
    CliMain.main(Array("run", in, viaManifest, "--partition-size", "500",
      "--explode",
      "--descriptor-set", fdset.toString, "--message", "graft.test.Output"))
    val viaBuiltin = Files.createTempDirectory("cli-adtout").toString
    CliMain.main(Array("run", in, viaBuiltin, "--partition-size", "500",
      "--explode"))
    val a = spark.read.parquet(s"$viaManifest/main")
    val b = spark.read.parquet(s"$viaBuiltin/main")
    assert(a.schema == b.schema)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // child tables derive from the manifest's repeated fields too
    for (child <- Seq("transfers", "touched_accounts")) {
      val ca = spark.read.parquet(s"$viaManifest/$child")
      val cb = spark.read.parquet(s"$viaBuiltin/$child")
      assert(ca.schema == cb.schema, child)
      assert(ca.count() == cb.count() && ca.count() > 0, child)
    }
  }

  test("run honors --compression-level (zstd level plumbed to parquet)") {
    val in = Files.createTempDirectory("cli-lvl-in").toString + "/blocks"
    SampleBlocks.blocksDF(spark, 300L).write.parquet(in)
    val out = Files.createTempDirectory("cli-lvl-out").toString
    CliMain.main(Array("run", in, out, "--partition-size", "100",
      "--compression-level", "7"))
    val main = spark.read.parquet(s"$out/main")
    assert(main.count() == 200L) // [200,300) is the open head range
  }

  test("corpus lands chunks and quarantines malformed JSONL lines") {
    val in = Files.createTempDirectory("cli-corpus-in").toString
    val out = Files.createTempDirectory("cli-corpus-out").toString + "/c"
    val text = (1 to 100).map(i => s"tok$i").mkString(" ")
    Files.write(java.nio.file.Paths.get(s"$in/part0.jsonl"), java.util.List.of(
      s"""{"doc_id": 1, "text": "$text", "lang": "en", "source": "crawl"}""",
      s"""{"doc_id": 2, "text": "$text", "lang": "en", "source": "crawl"}""",
      """{"doc_id": 3, "text": "truncated""",
      s"""{"doc_id": 4, "text": "${text.replace("tok", "kot")}", "lang": "en", "source": "feed"}"""))
    CliMain.main(Array("corpus", in, out))
    import spark.implicits._
    val chunks = spark.read.parquet(s"$out/chunks")
      .select("doc_id").as[Long].collect().toSeq
    // doc 2 is an exact dup of 1 → deduped; docs 1 and 4 chunked (3 each)
    assert(chunks.distinct.sorted == Seq(1L, 4L))
    assert(chunks.size == 6)
    val dead = spark.read.parquet(s"$out/_dead_letters")
    assert(dead.count() == 1)
    assert(dead.select("_corrupt").as[String].head().contains("truncated"))
  }

  test("run --endpoint streams the chain from a live gRPC server into " +
      "range-named parquet") {
    val out = Files.createTempDirectory("cli-grpc-out").toString
    val server = new graft.sources.TestSubstreamsServer(chainLen = 12000L,
      blocksPerProbe = 12002L, margin = 2L)
    try {
      CliMain.main(Array("run", "-", out,
        "--endpoint", s"127.0.0.1:${server.port}",
        "--undo-buffer-size", "2",
        "--partition-size", "5000"))
      val mains = new java.io.File(s"$out/main").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq.sorted
      assert(mains == Seq("0000000000-0000005000.parquet",
        "0000005000-0000010000.parquet"))
      // the chain starts at block 1, so the [0, 5000) range holds 4999
      assert(spark.read.parquet(s"$out/main/${mains.head}").count() == 4999L)
      assert(spark.read.parquet(s"$out/main").count() == 9999L)
    } finally server.close()
  }

  test("setup probes a writable store URL") {
    val dir = Files.createTempDirectory("cli-probe").toString
    CliMain.main(Array("setup", s"file://$dir"))
  }
}
