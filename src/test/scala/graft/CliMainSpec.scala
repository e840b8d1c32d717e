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

  test("optimize re-clusters a directory so either dimension prunes files") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("cli-opt").toString
    spark.range(0L, 4096L)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
      .repartition(8).write.parquet(s"$root/raw") // arrival order: no locality
    CliMain.main(Array("optimize", s"$root/raw", s"$root/opt",
      "--zorder", "x,y", "--files", "16"))
    val opt = spark.read.parquet(s"$root/opt")
    assert(opt.count() == 4096L)
    def touched(dim: String): Long = opt.groupBy(input_file_name())
      .agg(min(dim).as("lo"), max(dim).as("hi"))
      .filter(col("lo") <= 17L && col("hi") >= 17L).count()
    assert(touched("x") <= 8 && touched("y") <= 8,
      s"pruning not recovered: x=${touched("x")} y=${touched("y")} of 16")
  }

  test("upsert merges a change feed into a landed table via the CLI") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = Files.createTempDirectory("cli-upsert").toString
    spark.range(50).select(col("id").as("k"),
        concat(lit("v"), col("id")).as("v"), lit(1L).as("ver"))
      .repartitionByRange(4, col("k")).write.parquet(s"$root/table")
    Seq((10L, "updated", 2L), (99L, "inserted", 2L))
      .toDF("k", "v", "ver").write.parquet(s"$root/changes")
    CliMain.main(Array("upsert", s"$root/table", s"$root/changes",
      s"$root/out", "--key", "k", "--version", "ver"))
    val out = spark.read.parquet(s"$root/out")
    assert(out.count() == 51L)
    assert(out.filter(col("k") === 10L).select("v").as[String].head() ==
      "updated")
    assert(out.filter(col("k") === 99L).count() == 1L)
  }

  test("upsert --scd2 maintains a Type-2 dimension via the CLI") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = Files.createTempDirectory("cli-scd2").toString
    def ts(h: Int) = new java.sql.Timestamp(3600000L * h)
    val h1 = Seq((ts(1), 1L, 101L, "view"), (ts(2), 2L, 102L, "cart"))
      .toDF("ts", "user_id", "event_id", "event_type")
    graft.queries.Streaming.scd2(h1).write.parquet(s"$root/table")
    Seq((ts(5), 1L, 105L, "view"))
      .toDF("ts", "user_id", "event_id", "event_type")
      .write.parquet(s"$root/changes")
    CliMain.main(Array("upsert", s"$root/table", s"$root/changes",
      s"$root/out", "--scd2", "--keys", "user_id,event_type"))
    val out = spark.read.parquet(s"$root/out")
    assert(out.count() == 3L)
    val v1 = out.filter(col("user_id") === 1L)
      .orderBy("valid_from")
      .select("event_id", "is_current")
      .as[(Long, Boolean)].collect().toSeq
    assert(v1 == Seq((101L, false), (105L, true)), s"$v1")
  }

  test("rollup --init then increment maintain an aggregate table") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = Files.createTempDirectory("cli-rollup").toString
    Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "amount")
      .write.parquet(s"$root/day1")
    CliMain.main(Array("rollup", "--init", s"$root/day1", s"$root/table",
      "--keys", "k", "--agg", "n:count", "--agg", "total:sum:amount"))
    // --init combined with a tableDir no longer silently ignores it
    intercept[IllegalArgumentException] {
      CliMain.main(Array("rollup", s"$root/table", s"$root/day1",
        s"$root/x", "--keys", "k", "--agg", "n:count", "--init"))
    }
    Seq((1L, 70L), (3L, 1L)).toDF("k", "amount")
      .write.parquet(s"$root/day2")
    CliMain.main(Array("rollup", s"$root/table", s"$root/day2",
      s"$root/out", "--keys", "k", "--agg", "n:count",
      "--agg", "total:sum:amount"))
    val got = spark.read.parquet(s"$root/out")
      .select("k", "n", "total").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L, 100L), (2L, 1L, 5L), (3L, 1L, 1L)), s"$got")
  }

  test("skipindex build + lookup drive the bloom sidecar via the CLI") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("cli-skipidx").toString
    spark.range(100).select(col("id").as("k"),
        (lit(500) - col("id")).as("v"))
      .coalesce(1).write.parquet(s"$root/t")
    CliMain.main(Array("skipindex", s"$root/t", "v", "--bits", "65536"))
    CliMain.main(Array("skipindex", "lookup", s"$root/t", "v", "500,401"))
    assert(graft.ingest.FileSkipIndex.lookup(spark, s"$root/t", "v",
      Seq("500", "401")).count() == 2L)
  }

  test("skipindex on a versioned table: snapshot build + refresh") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = Files.createTempDirectory("cli-skipidx-log").toString
    spark.range(100).select(col("id").as("k"),
        (lit(500) - col("id")).as("v"), lit(1L).as("ver"))
      .repartitionByRange(2, col("k")).write.parquet(s"$root/t")
    CliMain.main(Array("table", s"$root/t", "init"))
    // builds over the SNAPSHOT files (the raw-dir build is refused
    // for versioned tables at the library level)
    CliMain.main(Array("skipindex", s"$root/t", "v", "--bits", "65536"))
    // an upsert commit, then an incremental refresh keeps it lossless
    Seq((10L, 9000L, 2L)).toDF("k", "v", "ver")
      .write.parquet(s"$root/changes")
    CliMain.main(Array("upsert", s"$root/t", s"$root/changes",
      s"$root/staged", "--key", "k", "--version", "ver"))
    CliMain.main(Array("table", s"$root/t", "commit", s"$root/staged",
      "--action", "upsert", "--expect", "0"))
    CliMain.main(Array("skipindex", "refresh", s"$root/t", "v"))
    // the moved value is found, its vacated old value (490) is gone
    val got = graft.ingest.FileSkipIndex.lookupSnapshot(spark,
      s"$root/t", "v", Seq("9000", "490"))
      .select("k", "v").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((10L, 9000L)), s"$got")
  }

  test("table read --as-of drives timestamp time travel") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("cli-asof").toString
    val saved = graft.ingest.TableLog.clock
    try {
      graft.ingest.TableLog.clock = () => 1000L
      spark.range(3).select(col("id").as("k"), lit("a").as("v"))
        .coalesce(1).write.parquet(s"$root/t")
      CliMain.main(Array("table", s"$root/t", "init"))
      graft.ingest.TableLog.clock = () => 5000L
      spark.range(1).select((col("id") + 9).as("k"), lit("b").as("v"))
        .coalesce(1).write.parquet(s"$root/s")
      CliMain.main(Array("table", s"$root/t", "commit", s"$root/s",
        "--action", "append"))
    } finally graft.ingest.TableLog.clock = saved
    // epoch-millis and ISO-8601 instant forms both parse
    CliMain.main(Array("table", s"$root/t", "read", "--as-of", "4999"))
    CliMain.main(Array("table", s"$root/t", "read", "--as-of",
      "1970-01-01T00:00:05Z"))
    assert(graft.ingest.TableLog.asOfVersion(spark, s"$root/t",
      4999L) == 0)
    assert(graft.ingest.TableLog.asOfVersion(spark, s"$root/t",
      5000L) == 1)
  }

  test("table scan --where drives the stats-pruned read") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("cli-scan").toString
    spark.range(100).select(col("id").as("k"),
        (col("id") * 2).as("m"))
      .repartitionByRange(4, col("k")).write.parquet(s"$root/t")
    CliMain.main(Array("table", s"$root/t", "init"))
    CliMain.main(Array("table", s"$root/t", "scan", "--where",
      "k >= 10 and k < 20"))
    val (kept, total) = graft.ingest.TableLog.prunedFiles(spark,
      s"$root/t", expr("k >= 10 and k < 20"))
    assert(kept.size == 1 && total == 4, s"${kept.size}/$total")
  }

  test("upsert/rollup on a versioned table at v>=1 read the snapshot") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = Files.createTempDirectory("cli-upsert-vers").toString
    spark.range(50).select(col("id").as("k"),
        concat(lit("v"), col("id")).as("v"), lit(1L).as("ver"))
      .repartitionByRange(4, col("k")).write.parquet(s"$root/t")
    CliMain.main(Array("table", s"$root/t", "init"))
    // advance to v1 so the raw directory holds SUPERSEDED v0 files
    // beside v1's — the exact layout a raw listing silently corrupts
    Seq((10L, "first", 2L)).toDF("k", "v", "ver")
      .write.parquet(s"$root/chg1")
    CliMain.main(Array("upsert", s"$root/t", s"$root/chg1",
      s"$root/staged1", "--key", "k", "--version", "ver"))
    CliMain.main(Array("table", s"$root/t", "commit", s"$root/staged1",
      "--action", "upsert", "--expect", "0"))
    // the library-level raw-directory merge fails loudly now
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Upsert.merge(spark, s"$root/t", s"$root/chg1",
        s"$root/never", Seq("k"), versionCol = Some("ver"))
    }
    assert(ex.getMessage.contains("TableLog-versioned"), ex.getMessage)
    // CLI upsert at v1 routes through the snapshot: no stale v0 row
    // for k=10, no duplicates from superseded files
    Seq((10L, "second", 3L), (99L, "inserted", 3L))
      .toDF("k", "v", "ver").write.parquet(s"$root/chg2")
    CliMain.main(Array("upsert", s"$root/t", s"$root/chg2",
      s"$root/out", "--key", "k", "--version", "ver"))
    val out = spark.read.parquet(s"$root/out")
    assert(out.count() == 51L, s"${out.count()}")
    assert(out.filter(col("k") === 10L).select("v").as[String]
      .collect().toSeq == Seq("second"))
    // rollup on a versioned table reads the snapshot too
    val rroot = Files.createTempDirectory("cli-rollup-vers").toString
    Seq((1L, 10L), (2L, 5L)).toDF("k", "amount")
      .write.parquet(s"$rroot/day1")
    CliMain.main(Array("rollup", "--init", s"$rroot/day1", s"$rroot/t",
      "--keys", "k", "--agg", "n:count", "--agg", "total:sum:amount"))
    CliMain.main(Array("table", s"$rroot/t", "init"))
    Seq((1L, 20L)).toDF("k", "amount").write.parquet(s"$rroot/day2")
    CliMain.main(Array("rollup", s"$rroot/t", s"$rroot/day2",
      s"$rroot/staged", "--keys", "k", "--agg", "n:count",
      "--agg", "total:sum:amount"))
    CliMain.main(Array("table", s"$rroot/t", "commit", s"$rroot/staged",
      "--action", "rollup", "--expect", "0"))
    Seq((3L, 1L)).toDF("k", "amount").write.parquet(s"$rroot/day3")
    CliMain.main(Array("rollup", s"$rroot/t", s"$rroot/day3",
      s"$rroot/out", "--keys", "k", "--agg", "n:count",
      "--agg", "total:sum:amount"))
    val got = spark.read.parquet(s"$rroot/out")
      .select("k", "n", "total").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 30L), (2L, 1L, 5L), (3L, 1L, 1L)), s"$got")
  }

  test("table init/commit/history/expire drive the snapshot log") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = Files.createTempDirectory("cli-table").toString
    spark.range(5).select(col("id").as("k"), lit("a").as("v"))
      .coalesce(1).write.parquet(s"$root/t")
    CliMain.main(Array("table", s"$root/t", "init"))
    Seq((7L, "b")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$root/staged")
    CliMain.main(Array("table", s"$root/t", "commit", s"$root/staged",
      "--action", "optimize", "--expect", "0"))
    assert(graft.ingest.TableLog.history(spark, s"$root/t")
      .map(_.action) == Seq("init", "optimize"))
    CliMain.main(Array("table", s"$root/t", "read", "--version", "0"))
    CliMain.main(Array("table", s"$root/t", "diff", "--from", "0"))
    CliMain.main(Array("table", s"$root/t", "expire", "--retain", "1"))
    assert(graft.ingest.TableLog.head(spark, s"$root/t").contains(1))
    assert(graft.ingest.TableLog.read(spark, s"$root/t")
      .select("k").as[Long].collect().toSeq == Seq(7L))
  }

  test("vacuum removes a crashed run's staging via the CLI") {
    val root = Files.createTempDirectory("cli-vacuum")
    def mk(rel: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, Array[Byte](1))
    }
    mk("0000000000-0000005000.parquet")
    mk("_open/epoch=1/__range=0/part-0.parquet")     // published: dead
    mk("_open/epoch=2/__range=5000/part-0.parquet")  // replayable: kept
    CliMain.main(Array("vacuum", root.toString, "--retention-hours", "0"))
    assert(!Files.exists(root.resolve("_open/epoch=1/__range=0")))
    assert(Files.exists(root.resolve("_open/epoch=2/__range=5000")))
    assert(Files.exists(root.resolve("0000000000-0000005000.parquet")))
  }

  test("index builds and materializes both ANN index kinds") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("cli-idx").toString
    val emb = "/root/testdata/sf0.001/embeddings.parquet"

    CliMain.main(Array("index", emb, s"$root/ivf", "--kind", "ivf",
      "--k", "16"))
    val assigned = spark.read.parquet(s"$root/ivf/assignments")
    assert(assigned.count() == 500)
    assert(assigned.select("cell_id").distinct().count() > 1)

    CliMain.main(Array("index", emb, s"$root/pq", "--kind", "pq",
      "--m", "16", "--k", "16"))
    // the loaded index searches identically to an in-memory build
    val (model, codes) = graft.operators.Pq.loadPq(spark, s"$root/pq")
    assert(model.m == 16 && model.k == 16)
    val queries = spark.read.parquet(emb).filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val fromDisk = graft.operators.Pq
      .search(codes, model, queries, topK = 5).collect().toSeq
    val memModel = graft.operators.Pq
      .train(spark.read.parquet(emb), m = 16, k = 16, iters = 2)
    val memCodes = graft.operators.Pq
      .encode(spark.read.parquet(emb).selectExpr("vec_id", "embedding"),
        memModel)
    val fromMem = graft.operators.Pq
      .search(memCodes, memModel, queries, topK = 5).collect().toSeq
    assert(fromDisk == fromMem)
  }

  test("tokenize round-trips: train persists the model, encode applies it") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = Files.createTempDirectory("cli-tok").toString
    val docs = "/root/testdata/sf0.001/documents.parquet"
    CliMain.main(Array("tokenize", "train", docs, s"$root/model",
      "--merges", "20"))
    assert(spark.read.parquet(s"$root/model/merges").count() == 20)
    CliMain.main(Array("tokenize", "encode", docs, s"$root/model",
      s"$root/ids"))
    val fromDisk = spark.read.parquet(s"$root/ids")
      .as[(Long, Seq[Int])].collect().toMap
    // the reloaded model encodes identically to the in-memory one
    val docsDf = spark.read.parquet(docs)
    val merges = graft.operators.Bpe.train(docsDf, nMerges = 20)
    val mem = graft.operators.Bpe
      .encodeIds(docsDf, graft.operators.Bpe.rankModel(merges, docsDf))
      .as[(Long, Seq[Int])].collect().toMap
    assert(fromDisk == mem, "reloaded tokenizer diverged from in-memory")
    assert(fromDisk.values.forall(_.forall(_ >= 0)), "OOV ids appeared")
  }

  test("tokenize --algo unigram round-trips through the CLI") {
    import spark.implicits._
    val root = Files.createTempDirectory("cli-tok-uni").toString
    val docs = "/root/testdata/sf0.001/documents.parquet"
    CliMain.main(Array("tokenize", "train", docs, s"$root/model",
      "--algo", "unigram", "--vocab", "150", "--max-piece", "4"))
    assert(spark.read.parquet(s"$root/model/pieces").count() > 0)
    CliMain.main(Array("tokenize", "encode", docs, s"$root/model",
      s"$root/ids"))
    val fromDisk = spark.read.parquet(s"$root/ids")
      .as[(Long, Seq[Int])].collect().toMap
    // the reloaded model encodes identically to the in-memory one
    val docsDf = spark.read.parquet(docs)
    val mem = graft.operators.Unigram.encodeIds(docsDf,
      graft.operators.Unigram.modelOf(
        graft.operators.Unigram.train(docsDf, vocabSize = 150,
          maxPieceLen = 4)))
      .as[(Long, Seq[Int])].collect().toMap
    assert(fromDisk == mem, "reloaded unigram tokenizer diverged")
  }

  test("opq index round-trips: build → write → load → search e2e") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("cli-opq").toString
    val emb = "/root/testdata/sf0.001/embeddings.parquet"
    CliMain.main(Array("index", emb, s"$root/idx", "--kind", "opq",
      "--m", "16", "--k", "16"))
    CliMain.main(Array("search", s"$root/idx", emb, s"$root/out",
      "--kind", "opq", "--topk", "5", "--shortlist", "40"))
    val out = spark.read.parquet(s"$root/out")
    assert(out.count() == 25, "5 queries x top-5")
    // from-disk search agrees with the in-memory build (deterministic
    // training makes the models identical, not just equivalent)
    val embDf = spark.read.parquet(emb)
    val model = graft.operators.Opq.train(embDf, m = 16, k = 16, iters = 2)
    val codes = graft.operators.Opq.encode(
      embDf.selectExpr("vec_id", "embedding"), model)
    val queries = embDf.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val fromMem = graft.operators.Opq.searchRerank(codes, model, embDf,
      queries, topK = 5, shortlist = 40).collect().toSeq
    assert(out.orderBy("q_id", "rnk").collect().toSeq == fromMem)
  }

  test("stats profiles a corpus into a sketch and quantile estimates") {
    import spark.implicits._
    val root = Files.createTempDirectory("cli-stats").toString
    val docs = "/root/testdata/sf0.001/documents.parquet"
    CliMain.main(Array("stats", docs, s"$root/out",
      "--qs", "0.5,0.9"))
    val sketch = spark.read.parquet(s"$root/out/sketch")
    assert(sketch.count() > 0)
    val qs = spark.read.parquet(s"$root/out/quantiles")
      .as[(Double, Double)].collect().toMap
    assert(qs.keySet == Set(0.5, 0.9))
    // the landed estimates honor the alpha guarantee vs exact
    val exact = spark.read.parquet(docs)
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " "))
        .cast("double").as("v"))
      .as[Double].collect().sorted
    Seq(0.5, 0.9).foreach { q =>
      val x = exact(math.ceil(q * exact.length).toInt - 1)
      assert(math.abs(qs(q) - x) <= 0.01 * x + 1e-9,
        s"q=$q: ${qs(q)} vs exact $x")
    }
  }

  test("select lands the DSIR top-N toward an arbitrary target predicate") {
    import spark.implicits._
    val root = Files.createTempDirectory("cli-select").toString
    val docs = "/root/testdata/sf0.001/documents.parquet"
    CliMain.main(Array("select", docs, s"$root/out",
      "--target", "lang = 'en'", "--top", "20"))
    val got = spark.read.parquet(s"$root/out")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.length == 20)
    // CLI ≡ the in-memory kernel with the same predicate
    val want = graft.queries.Pipeline
      .dsirScores(spark.read.parquet(docs),
        org.apache.spark.sql.functions.expr("lang = 'en'"))
      .orderBy(org.apache.spark.sql.functions.col("score_u").desc,
        org.apache.spark.sql.functions.col("doc_id"))
      .limit(20).as[(Long, Long, Long)].collect().toSeq
    assert(got.sortBy(_._1) == want.sortBy(_._1))
    // selection direction: the picked docs skew toward the target
    val langs = spark.read.parquet(docs)
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    val enShare = got.count(r => langs(r._1) == "en").toDouble / got.size
    val base = langs.values.count(_ == "en").toDouble / langs.size
    assert(enShare > base, s"selected en share $enShare vs base $base")
  }

  test("search --filter-label pre-filters: CLI ≡ in-memory filtered search") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = Files.createTempDirectory("cli-filter").toString
    val emb = "/root/testdata/sf0.001/embeddings.parquet"
    CliMain.main(Array("index", emb, s"$root/idx", "--kind", "ivf",
      "--k", "8"))
    CliMain.main(Array("search", s"$root/idx", emb, s"$root/out",
      "--kind", "ivf", "--topk", "5", "--nprobe", "8",
      "--filter-label", "3"))
    val fromCli = spark.read.parquet(s"$root/out")
      .orderBy("q_id", "rnk")
      .as[(Long, Int, Long, Double)].collect().toSeq
    val embDf = spark.read.parquet(emb)
    val queries = embDf.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val idx = graft.operators.Ann.loadIvf(spark, s"$root/idx")
    val mem = graft.operators.Ann.searchFiltered(idx, queries,
        embDf.filter(col("label") === 3).select("vec_id"), topK = 5,
        nprobe = 8)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(fromCli == mem, "CLI filtered search diverged")
    // the predicate actually filtered: every hit carries label 3
    val lab3 = embDf.filter(col("label") === 3)
      .select("vec_id").as[Long].collect().toSet
    assert(fromCli.nonEmpty && fromCli.forall(r => lab3(r._3)),
      "an ineligible vector surfaced")
    // unsupported kind fails fast rather than silently post-filtering
    intercept[IllegalArgumentException] {
      CliMain.main(Array("search", s"$root/idx", emb, s"$root/out2",
        "--kind", "ivfpq", "--filter-label", "3"))
    }
  }

  test("index --append grows a materialized index without retraining") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("cli-app").toString
    val emb = "/root/testdata/sf0.001/embeddings.parquet"
    val half = s"$root/half"
    spark.read.parquet(emb).filter(col("vec_id") < 250)
      .write.parquet(half)
    val rest = s"$root/rest"
    spark.read.parquet(emb).filter(col("vec_id") >= 250)
      .write.parquet(rest)
    CliMain.main(Array("index", half, s"$root/idx", "--kind", "ivf",
      "--k", "8"))
    val before = spark.read.parquet(s"$root/idx/centroids").collect().toSeq
    CliMain.main(Array("index", rest, s"$root/idx", "--kind", "ivf",
      "--append"))
    assert(spark.read.parquet(s"$root/idx/assignments").count() == 500)
    assert(spark.read.parquet(s"$root/idx/centroids").collect().toSeq
      == before, "append retrained the model")
  }

  test("ivfpq index round-trips: build → write → load → search e2e") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = Files.createTempDirectory("cli-ivfpq").toString
    val emb = "/root/testdata/sf0.001/embeddings.parquet"
    CliMain.main(Array("index", emb, s"$root/idx", "--kind", "ivfpq",
      "--kcells", "16", "--m", "16", "--k", "16"))
    // composed layout: cell-partitioned codes + both model-state tables
    assert(new java.io.File(s"$root/idx/assignments").listFiles()
      .count(_.getName.startsWith("cell_id=")) > 1)
    CliMain.main(Array("search", s"$root/idx", emb, s"$root/out",
      "--kind", "ivfpq", "--topk", "10", "--nprobe", "16",
      "--shortlist", "50"))
    val fromDisk = spark.read.parquet(s"$root/out")
      .orderBy("q_id", "rnk")
      .as[(Long, Int, Long, Double)].collect().toSeq
    // the reloaded index searches identically to the in-memory build
    // (training is deterministic, the layout loses no precision)
    val embDf = spark.read.parquet(emb)
    val queries = embDf.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val mem = graft.operators.Pq.buildIvfPq(embDf, kCells = 16, m = 16,
      k = 16, iters = 2)
    val fromMem = graft.operators.Pq.searchIvfPq(mem, queries, embDf,
      topK = 10, nprobe = 16, shortlist = 50)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(fromDisk == fromMem, "reloaded index diverged from in-memory")
    // recall pin HOLDS on the reloaded index: full probe ≡ flat PQ with
    // exact re-rank (PqSpec's 0.80 floor)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val exact = embDf.select(col("vec_id"), col("embedding"))
      .join(queries)
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        graft.functions.Vectors.dot(col("embedding"), col("qvec")).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val got = fromDisk.map(r => (r._1, r._3)).toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.80,
      f"recall $recall%.3f on the reloaded index below the 0.80 pin")
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

  test("run --endpoint e2e: live chain WITH a reorg -> published ranges " +
      "hold only canonical blocks; checkpoint restart mid-reorg replays " +
      "clean (sinker.go:142-148 parity)") {
    import spark.implicits._
    val out = Files.createTempDirectory("cli-reorg-out").toString
    // a 300-block chain mining 100 blocks per head probe, blocks 199-200
    // re-mined (generation 1) — the reorg sits exactly inside the
    // confirmation lag when the second run pins its head at 200
    val server = new graft.sources.TestSubstreamsServer(chainLen = 300L,
      blocksPerProbe = 100L, margin = 3L, reorgs = Seq((200L, 2)))
    try {
      def run(): Unit = CliMain.main(Array("run", "-", out,
        "--endpoint", s"127.0.0.1:${server.port}",
        "--confirmations", "3",
        "--partition-size", "50"))
      def published(): Seq[(Long, String)] =
        if (!new java.io.File(s"$out/main").exists()) Seq.empty
        else spark.read.parquet(s"$out/main")
          .select("block_number", "block_id").as[(Long, String)]
          .collect().sortBy(_._1).toSeq

      // run 1: head pins at 100, exposes <= 97 -> [0,50) published
      run()
      val p1 = published()
      assert(p1.nonEmpty && p1.map(_._1) == (1L to 49L))

      // run 2 pins at 200: the re-mined blocks 199-200 are INSIDE the
      // 3-block confirmation lag — this is the mid-reorg restart. The
      // resume must extend cleanly from the checkpoint and must NOT
      // publish anything from the unfinalized reorg region.
      run()
      val p2 = published()
      assert(p2.map(_._1) == (1L to 149L), "gapless resume, no dups")
      assert(p2.map(_._1).max < 198L,
        "nothing from the unfinalized reorg region may be published")

      // runs 3+4: the reorg region finalizes; published ranges must carry
      // the CANONICAL (re-mined) identities and stay gapless
      run()
      run()
      val p4 = published()
      assert(p4.map(_._1) == (1L to 299L), "gapless, duplicate-free")
      val ids = p4.toMap
      assert(ids(199L) == "0xb199_r1" && ids(200L) == "0xb200_r1",
        "reorged blocks published with canonical identities")
      assert(ids(198L) == "0xb198" && ids(201L) == "0xb201")
      // range-file naming held across all restarts
      val files = new java.io.File(s"$out/main").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq.sorted
      assert(files.head == "0000000000-0000000050.parquet" &&
        files.last == "0000000250-0000000300.parquet" && files.size == 6)
    } finally server.close()
  }
}
