package graft

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}

import graft.ingest.{DescriptorSet, ParquetTuning, RangePartitioner, SampleBlocks, StoreProbe}
import graft.streaming.BlockPipeline

/** The reference's CLI surface (main.go:19-22: `run` + `setup`),
  * Spark-first:
  *
  *   run <blocksDir> <outRoot> [--explode] [--partition-size N]
  *       [--start N] [--compression C] [--checkpoint DIR]
  *     consume a block-parquet directory as a stream (the file source
  *     stands in for the gRPC endpoint — SURVEY.md §7.3), decode, fan
  *     out main + child tables, land range-named parquet. Resumable:
  *     re-running with the same --checkpoint continues where it left
  *     off (cursor parity, SURVEY.md §2.A#17).
  *   setup <store_url>
  *     write/read/compare/delete probe (setup.go:31-66).
  *
  * Flag defaults mirror run.go: partition size 5000 (run.go:40), zstd
  * (run.go:43).
  */
object CliMain {

  /** The ONE flag parser — each subcommand binds it to its own flag
    * list (was four identical local copies that could silently
    * diverge). */
  private def flagValIn(flags: List[String], name: String): Option[String] =
    flags.dropWhile(_ != name).drop(1).headOption

  /** Shared --keys/--agg parsing of the two rollup arities. */
  private def rollupSpec(flags: List[String])
      : (Seq[String], Seq[(String, graft.operators.Skew.ReAgg)]) = {
    val ks = flagValIn(flags, "--keys").getOrElse(
      sys.error("--keys k1,k2 is required"))
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val aggSpecs = flags.zip(flags.drop(1))
      .collect { case ("--agg", v) => v }
    require(aggSpecs.nonEmpty, "at least one --agg name:kind[:col]")
    val aggs: Seq[(String, graft.operators.Skew.ReAgg)] =
      aggSpecs.map(_.split(":").toSeq match {
        case Seq(n, "count") => n -> graft.operators.Skew.CountRows()
        case Seq(n, "sum", c) =>
          n -> graft.operators.Skew.SumOf(
            org.apache.spark.sql.functions.col(c))
        case Seq(n, "min", c) =>
          n -> graft.operators.Skew.MinOf(
            org.apache.spark.sql.functions.col(c))
        case Seq(n, "max", c) =>
          n -> graft.operators.Skew.MaxOf(
            org.apache.spark.sql.functions.col(c))
        case other => sys.error(s"bad --agg spec: ${other.mkString(":")}")
      })
    (ks, aggs)
  }

  /** Tokenizer model-kind detection by persisted layout (unigram =
    * `pieces/`, BPE = `merges/` + `charset/`) — probed through the
    * Hadoop filesystem of the PATH, not java.io.File, so remote model
    * dirs (hdfs://, s3a://) detect exactly like local ones. */
  private def isUnigramModel(spark: org.apache.spark.sql.SparkSession,
      dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/pieces")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def isWordPieceModel(spark: org.apache.spark.sql.SparkSession,
      dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/wordpiece")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Layout-detected load of any persisted tokenizer model — the one
    * dispatch point the stream, the encode CLI, and future callers
    * share (unigram: pieces/; wordpiece: wordpiece/; else BPE). */
  private def loadTokenizer(spark: org.apache.spark.sql.SparkSession,
      dir: String): graft.functions.RowTokenizer =
    if (isUnigramModel(spark, dir)) graft.operators.Unigram.loadModel(spark, dir)
    else if (isWordPieceModel(spark, dir)) graft.operators.WordPiece.loadModel(spark, dir)
    else graft.operators.Bpe.loadModel(spark, dir)

  private val blockSchema = StructType(Seq(
    StructField("block_number", LongType),
    StructField("block_id", StringType),
    StructField("payload", BinaryType)))

  def main(args: Array[String]): Unit = args.toList match {
    case "setup" :: url :: Nil =>
      val r = StoreProbe.probe(url)
      println(s"${if (r.ok) "OK" else "FAIL"}: ${r.detail}")
      if (!r.ok) sys.exit(1)
    // corpus <jsonlDir> <outRoot>: the LLM-pipeline analogue of `run` —
    // stream a JSONL drop directory through quality filter → dedup
    // (exact, token-bag, or MinHash/LSH near-dup) → chunking → parquet,
    // with malformed lines quarantined to _dead_letters. Resumable via
    // the same checkpoint contract as `run`.
    case "corpus" :: jsonlDir :: outRoot :: flags =>
      def flagVal(name: String): Option[String] = flagValIn(flags, name)
      val ckpt = flagVal("--checkpoint").getOrElse(s"$outRoot/_checkpoint")
      val wm = flagVal("--watermark").getOrElse("10 minutes")
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-corpus")
      import org.apache.spark.sql.functions.{col, current_timestamp}
      val raw = spark.readStream.schema(graft.sources.JsonlCorpus.schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(jsonlDir)
      // quarantine stream: corrupt lines as-is (doc_id kept so the frame
      // references more than the internal corrupt column, SPARK-21610)
      val deadQ = raw.filter(col("_corrupt").isNotNull)
        .select(col("doc_id"), col("_corrupt"))
        .writeStream.format("parquet")
        .option("path", s"$outRoot/_dead_letters")
        .option("checkpointLocation", s"$ckpt/dead")
        .trigger(Trigger.AvailableNow()).start()
      // JSONL interchange carries no event time — processing-time
      // watermarking bounds the dedup state instead
      val clean = raw.filter(col("_corrupt").isNull)
        .select(col("doc_id"), current_timestamp().as("ts"),
          col("text"), col("source"))
      // --tokenizer <modelDir>: apply a persisted tokenizer model
      // (tokenize train; BPE, unigram, or wordpiece — detected from the
      // layout) as the final map-only stage — chunks land with token ids
      val tok: Option[graft.functions.RowTokenizer] =
        flagVal("--tokenizer").map(loadTokenizer(spark, _))
      val q =
        if (flags.contains("--near-dup"))
          graft.streaming.CorpusPipeline.startNearDup(clean,
            s"$outRoot/chunks", s"$ckpt/main",
            s"$outRoot/_neardup_registry", watermark = wm,
            trigger = Trigger.AvailableNow(), tokenizer = tok)
        else
          graft.streaming.CorpusPipeline.start(clean,
            s"$outRoot/chunks", s"$ckpt/main", watermark = wm,
            trigger = Trigger.AvailableNow(),
            bagDedup = flags.contains("--bag-dedup"), tokenizer = tok)
      q.awaitTermination()
      deadQ.awaitTermination()
      if (!reused) spark.stop()
    // quality train <posDir> <negDir> <modelDir>: train the learned
    // quality filter on curated-vs-crawl document sets (the GPT-3
    // filter's label construction); quality score applies a persisted
    // model. Training is deterministic under any partitioning
    // (operators.QualityClassifier), so re-running train reproduces
    // the model bit-for-bit.
    case "quality" :: "train" :: posDir :: negDir :: modelDir :: flags =>
      import org.apache.spark.sql.functions.{col, lit}
      import graft.operators.QualityClassifier
      def flagVal(name: String): Option[String] = flagValIn(flags, name)
      val buckets = flagVal("--buckets").map(_.toInt).getOrElse(1 << 16)
      val iters = flagVal("--iters").map(_.toInt).getOrElse(8)
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-quality")
      val pos = spark.read.parquet(posDir)
        .select(col("doc_id"), col("text"), lit(1).as("label"))
      // offset keeps the two id spaces disjoint — a collision would
      // merge two documents' features into one
      val neg = spark.read.parquet(negDir)
        .select((col("doc_id") + lit(1L << 40)).as("doc_id"), col("text"),
          lit(0).as("label"))
      val feats =
        QualityClassifier.featurizePacked(pos.union(neg), buckets).cache()
      val model =
        QualityClassifier.trainPacked(feats, buckets, iters, lr = 4.0)
      feats.unpersist()
      QualityClassifier.save(model, spark, modelDir)
      println(s"[quality] trained $buckets buckets, $iters iters -> " +
        s"$modelDir (${model.weightsU.count(_ != 0L)} nonzero weights)")
      if (!reused) spark.stop()
    case "quality" :: "score" :: docsDir :: modelDir :: outDir :: Nil =>
      import org.apache.spark.sql.functions.{col, lit}
      import graft.operators.QualityClassifier
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-quality")
      val model = QualityClassifier.load(spark, modelDir)
      val docs = spark.read.parquet(docsDir)
        .select(col("doc_id"), col("text"), lit(0).as("label"))
      // the in-row kernel: map-only corpus scoring, no shuffle
      QualityClassifier.scoreKernel(docs, model)
        .select("doc_id", "score_u", "predicted")
        .write.mode("overwrite").parquet(outDir)
      println(s"[quality] scored ${spark.read.parquet(outDir).count()} " +
        s"docs -> $outDir")
      if (!reused) spark.stop()
    // warc <warcGlob> <outRoot>: the crawl front door — parse WARC
    // archives (plain or per-record gzip), keep 200 text/html
    // responses, canonicalize URLs, strip HTML to visible text, land
    // the documents-table shape; framing errors → _dead_letters. Batch
    // (a crawl segment is a fixed artifact, not a drop stream); dedup
    // belongs to the downstream cascade, so the landing is map-only.
    case "warc" :: warcPath :: outRoot :: _ =>
      import org.apache.spark.sql.functions.{col, xxhash64}
      import graft.functions.Web
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-warc")
      val recs = graft.sources.Warc.read(spark, warcPath).cache()
      recs.filter(col("_corrupt").isNotNull)
        .select(col("file"), col("record_id"), col("_corrupt"))
        .write.mode("overwrite").parquet(s"$outRoot/_dead_letters")
      val url = Web.urlNormalize(col("target_uri"))
      val docs = graft.sources.Warc.responses(recs)
        .filter(col("mime") === "text/html" && col("status") === 200)
        .select(xxhash64(url).as("doc_id"), url.as("url"),
          col("warc_date"), Web.htmlText(col("body")).as("text"))
      docs.write.mode("overwrite").parquet(s"$outRoot/docs")
      val nDocs = spark.read.parquet(s"$outRoot/docs").count()
      val nDead = spark.read.parquet(s"$outRoot/_dead_letters").count()
      recs.unpersist()
      println(s"[warc] docs=$nDocs dead_letters=$nDead")
      if (!reused) spark.stop()
    // optimize <inDir> <outDir> --zorder x,y: the maintenance pass —
    // re-cluster an arrival-order parquet directory on the 2-D z-value
    // so point/range predicates on either dimension prune files
    // (operators.ZOrder.compact). Output is written BESIDE the live
    // directory; swapping it in is the operator's deploy step.
    // stats <docsDir> <outDir> [--col name] [--alpha a] [--qs list]:
    // profile a positive numeric column (default: whitespace token
    // count of `text`) into a DDSketch register table plus quantile
    // estimates — the batch face of the streaming CorpusStats monitor;
    // the landed registers merge with any other run's by bucketwise
    // addition.
    case "stats" :: docsDir :: outDir :: flags =>
      def flagVal(name: String): Option[String] = flagValIn(flags, name)
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-stats")
      import org.apache.spark.sql.functions.{col, size, split}
      val alpha = flagVal("--alpha").map(_.toDouble).getOrElse(0.01)
      val qs = flagVal("--qs")
        .map(_.split(",").map(_.trim.toDouble).toSeq)
        .getOrElse(Seq(0.25, 0.5, 0.75, 0.9, 0.99))
      val docs = spark.read.parquet(docsDir)
      val values = flagVal("--col") match {
        case Some(c) => docs.select(col(c).cast("double").as("v"))
        case None => docs.select(
          size(split(col("text"), " ")).cast("double").as("v"))
      }
      graft.operators.Sketch.ddSketch(values, "v", alpha)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/sketch")
      // quantiles read the LANDED sketch: ddQuantiles references its
      // input three times and the corpus must not re-aggregate per
      // reference — the bucket table is the sufficient statistic
      val landed = spark.read.parquet(s"$outDir/sketch")
      graft.operators.Sketch.ddQuantiles(landed, alpha, qs)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/quantiles")
      val est = spark.read.parquet(s"$outDir/quantiles").count()
      println(s"stats: ${landed.count()} buckets, $est quantiles -> $outDir")
      if (!reused) spark.stop()
    // upsert <tableDir> <changesDir> <outDir> --key k [--version c]
    // [--tombstone c]: keyed MERGE (SCD1, last-writer-wins) into a
    // landed parquet table — copy-on-write at file granularity, so
    // only files containing affected keys are decoded and rewritten
    // (operators.Upsert). The natural consumer of Scd2Stats' closed
    // intervals / current rows. Output lands BESIDE the live table
    // (the optimize deploy contract).
    // --scd2 switches to Type-2 merge: <changesDir> is RAW NEW EVENTS
    // (--keys k1,k2 + payload + --ts), the open version per key closes
    // at the key's first new timestamp and the batch's chained
    // versions append (operators.Upsert.mergeScd2) — append-only in
    // event time, loud on history rewrites.
    // On a TableLog-versioned tableDir the merge reads the HEAD
    // SNAPSHOT's file list, never the raw directory (which holds every
    // retained version's files side by side — a plain listing would
    // silently fold stale/duplicate rows in; Upsert.listFlat fails
    // loudly on it). The output contract is unchanged: a full merged
    // table at outDir (untouched snapshot files copy byte-for-byte);
    // commit it back with `table commit` for the zero-copy path.
    case "upsert" :: tableDir :: changesDir :: outDir :: flags =>
      def flagVal(name: String): Option[String] = flagValIn(flags, name)
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-upsert")
      val versioned = graft.ingest.TableLog.head(spark, tableDir)
        .isDefined
      def tableFiles: Seq[String] =
        if (versioned) graft.ingest.TableLog.snapshotFiles(spark, tableDir)
        else graft.operators.Upsert.listFlat(spark, tableDir)
          .map(_.toString)
      if (flags.contains("--scd2")) {
        val ks = flagVal("--keys").getOrElse(
          sys.error("--keys k1,k2 is required with --scd2"))
          .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        val (st0, untouched) = graft.operators.Upsert.mergeScd2Shared(
          spark, tableFiles, changesDir, outDir, ks,
          tsCol = flagVal("--ts").getOrElse("ts"),
          seqCol = flagVal("--seq").getOrElse("event_id"))
        val st = st0.copy(filesCopied = graft.operators.Upsert.copyFiles(
          spark, untouched.map(new org.apache.hadoop.fs.Path(_)),
          outDir, Set.empty))
        println(s"upsert --scd2: ${st.versionsClosed} versions closed, " +
          s"${st.versionsAppended} appended (${st.newKeys} new keys); " +
          s"${st.filesRewritten} files rewritten, " +
          s"${st.filesCopied} copied -> $outDir")
      } else {
        val ks = flagVal("--key")
          .getOrElse(sys.error("--key k (or --key a,b for a " +
            "composite key) is required"))
          .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        // versioned tables bound the touched-file probe via the
        // log's per-file key stats (sound: files the keys cannot
        // live in are carried without a scan)
        val probe =
          if (!versioned) None
          else Some(graft.ingest.TableLog.statsCandidates(spark,
            tableDir, ks.head,
            spark.read.parquet(changesDir).select(ks.head)))
        val (st0, untouched) = graft.operators.Upsert.mergeShared(spark,
          tableFiles, changesDir, outDir, ks,
          versionCol = flagVal("--version"),
          tombstoneCol = flagVal("--tombstone"),
          probeFiles = probe)
        val st = st0.copy(filesCopied = graft.operators.Upsert.copyFiles(
          spark, untouched.map(new org.apache.hadoop.fs.Path(_)),
          outDir, Set.empty))
        println(s"upsert: ${st.upserts} updated, ${st.inserts} inserted, " +
          s"${st.deletes} deleted; ${st.filesRewritten} files rewritten, " +
          s"${st.filesCopied} copied -> $outDir")
      }
      if (!reused) spark.stop()
    // rollup --init <deltaDir> <outDir> --keys ... --agg ...: build
    // the landed rollup from scratch (a distinct arity — the init
    // form reads no table, so it takes no tableDir; r15's shared
    // arity silently ignored a real tableDir passed with --init).
    case "rollup" :: "--init" :: deltaDir :: outDir :: flags =>
      val (ks, aggs) = rollupSpec(flags)
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-rollup")
      graft.operators.IncrementalAgg
        .rollup(spark.read.parquet(deltaDir), ks, aggs)
        .write.parquet(outDir)
      println(s"rollup: initialized $outDir from $deltaDir")
      if (!reused) spark.stop()
    // rollup <tableDir> <deltaDir> <outDir> --keys k1,k2
    // --agg name:count --agg name:sum:col: incremental aggregate
    // maintenance (operators.IncrementalAgg) — absorb a raw delta
    // into a landed mergeable rollup. Stage the output, then
    // `table commit`.
    case "rollup" :: tableDir :: deltaDir :: outDir :: flags =>
      require(!flags.contains("--init"),
        "the init form takes no tableDir: rollup --init <deltaDir> " +
          "<outDir> --keys ... --agg ...")
      val (ks, aggs) = rollupSpec(flags)
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-rollup")
      // versioned rollups read the head snapshot's files (see upsert)
      val files =
        if (graft.ingest.TableLog.head(spark, tableDir).isDefined)
          graft.ingest.TableLog.snapshotFiles(spark, tableDir)
        else graft.operators.Upsert.listFlat(spark, tableDir)
          .map(_.toString)
      val st = graft.operators.IncrementalAgg.incrementFiles(spark,
        files, deltaDir, outDir, ks, aggs)
      println(s"rollup: ${st.keysMerged} keys merged, " +
        s"${st.keysInserted} inserted; ${st.filesRewritten} files " +
        s"rewritten, ${st.filesCopied} copied -> $outDir")
      if (!reused) spark.stop()
    // skipindex <tableDir> <column> [--bits B] [--k K] | skipindex
    // lookup <tableDir> <column> <key,key,...>: per-file Bloom
    // sidecars for point-lookup file skipping on non-clustered
    // columns (ingest.FileSkipIndex); lossless — skipped files
    // provably lack the key.
    case "skipindex" :: "lookup" :: tableDir :: column :: keyCsv :: _ =>
      val reusedL =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val sparkL = Sessions.get("graft-skipindex")
      val keys = keyCsv.split(",").toSeq
      // versioned tables probe the HEAD snapshot (candidates
      // intersected with its file list; sidecar-unindexed snapshot
      // files scan unconditionally — lossless either way); a raw
      // lookup over the directory would mix retained versions' files
      val versionedL =
        graft.ingest.TableLog.head(sparkL, tableDir).isDefined
      val n =
        if (versionedL)
          graft.ingest.FileSkipIndex.lookupSnapshot(sparkL, tableDir,
            column, keys).count()
        else graft.ingest.FileSkipIndex.lookup(sparkL, tableDir,
          column, keys).count()
      val cands = graft.ingest.FileSkipIndex.candidateFiles(sparkL,
        tableDir, column, keys)
      println(s"skipindex: ${keys.size} keys -> ${cands.size} candidate " +
        s"files, $n rows" + (if (versionedL) " (head snapshot)" else ""))
      if (!reusedL) sparkL.stop()
    // skipindex refresh <tableDir> <column>: incremental sidecar
    // maintenance after a TableLog commit — re-aggregates only the
    // snapshot's new files, carries quiet files' rows.
    case "skipindex" :: "refresh" :: tableDir :: column :: _ =>
      val reusedR =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val sparkR = Sessions.get("graft-skipindex")
      val rs = graft.ingest.FileSkipIndex.refresh(sparkR, tableDir,
        column)
      println(s"skipindex: refreshed $column — ${rs.filesIndexed} " +
        s"files indexed, ${rs.filesKept} kept, ${rs.filesDropped} " +
        "dropped")
      if (!reusedR) sparkR.stop()
    case "skipindex" :: tableDir :: column :: flags =>
      def flagVal(name: String): Option[String] = flagValIn(flags, name)
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-skipindex")
      val mBits = flagVal("--bits").map(_.toLong).getOrElse(1L << 20)
      val k = flagVal("--k").map(_.toInt).getOrElse(4)
      // versioned tables index the CURRENT snapshot's files
      if (graft.ingest.TableLog.head(spark, tableDir).isDefined)
        // allowDvs: indexing raw files only adds candidates; the
        // snapshot lookup applies active deletion vectors
        graft.ingest.FileSkipIndex.buildFiles(spark, tableDir, column,
          graft.ingest.TableLog.snapshotFiles(spark, tableDir,
            allowDvs = true),
          mBits, k)
      else
        graft.ingest.FileSkipIndex.build(spark, tableDir, column,
          mBits, k)
      println(s"skipindex: built $column index under $tableDir")
      if (!reused) spark.stop()
    // table <dir> init | commit <fromDir> [--action a] [--expect N] |
    // history | read [--version N] | expire --retain N: the versioned
    // snapshot log (ingest.TableLog) that turns optimize/upsert's
    // "output lands beside the table" into an atomic swap with time
    // travel and optimistic conflict detection.
    case "table" :: dir :: rest =>
      def flagVal(name: String): Option[String] = flagValIn(rest, name)
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-table")
      rest match {
        case "init" :: _ =>
          graft.ingest.TableLog.init(spark, dir)
          println(s"table: initialized $dir at v0")
        case "commit" :: fromDir :: _ =>
          val v = graft.ingest.TableLog.commit(spark, dir, fromDir,
            action = flagVal("--action").getOrElse("commit"),
            expectedHead = flagVal("--expect").map(_.toInt))
          println(s"table: committed $fromDir as v$v")
        case "history" :: _ =>
          graft.ingest.TableLog.history(spark, dir).foreach { m =>
            val ts = m.tsMs.map(t => " " +
              java.time.Instant.ofEpochMilli(t).toString).getOrElse("")
            println(s"v${m.version} ${m.action} ${m.files.size} files$ts")
          }
        // read [--version N | --as-of <epochMillis|ISO-8601 instant>]:
        // version or timestamp time travel (as-of resolves the
        // newest commit stamped at or before the target, clock-skew
        // monotonicized)
        case "read" :: _ =>
          val version = flagVal("--version").map(_.toInt)
            .orElse(flagVal("--as-of").map { s =>
              val ts = s.toLongOption.getOrElse(
                java.time.Instant.parse(s).toEpochMilli)
              graft.ingest.TableLog.asOfVersion(spark, dir, ts)
            })
          val df = graft.ingest.TableLog.read(spark, dir, version)
          println(s"table: ${df.count()} rows at " +
            version.map("v" + _).getOrElse("head"))
        // scan --where <sqlPredicate> [--version N]: stats-pruned
        // snapshot scan — opens only files whose log-recorded
        // per-file stats can match the predicate (lossless; the full
        // predicate re-applies after the scan)
        case "scan" :: _ =>
          val predSql = flagVal("--where").getOrElse(
            sys.error("--where <sql predicate> is required"))
          val pred = org.apache.spark.sql.functions.expr(predSql)
          val ver = flagVal("--version").map(_.toInt)
          val (keptF, total) = graft.ingest.TableLog.prunedFiles(
            spark, dir, pred, ver)
          val n = graft.ingest.TableLog.scanWhere(spark, dir, pred,
            ver).count()
          println(s"table: $n rows from ${keptF.size}/$total files " +
            "(stats-pruned)")
        case "expire" :: _ =>
          val st = graft.ingest.TableLog.expire(spark, dir,
            flagVal("--retain").map(_.toInt).getOrElse(2),
            minAgeMs = flagVal("--min-age-hours").map(_.toDouble)
              .map(h => (h * 3600000L).toLong)
              .getOrElse(graft.ingest.TableLog.DefaultExpireAgeMs),
            allowBatchActionDrop = rest.contains("--allow-batch-drop"))
          println(s"table: expired ${st.manifestsDropped} manifests, " +
            s"${st.filesDropped} files")
        case "diff" :: _ =>
          val from = flagVal("--from").map(_.toInt).getOrElse(
            sys.error("--from version is required"))
          val to = flagVal("--to").map(_.toInt).getOrElse(
            graft.ingest.TableLog.head(spark, dir).get)
          val d = graft.ingest.TableLog.diff(spark, dir, from, to)
            .groupBy("_change_type").count().collect()
            .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted
          println(s"table: v$from..v$to ${d.mkString(", ")}")
        // changes --cursor <path> [--seed N] [--max-versions K]
        // [--out <dir>]: resumable per-commit change feed — consume
        // the unconsumed batch, optionally land it as parquet, ack
        // the cursor. Crash before the ack re-delivers the batch.
        case "changes" :: _ =>
          val cursor = flagVal("--cursor").getOrElse(
            sys.error("--cursor <path> is required (per-consumer " +
              "position file)"))
          flagVal("--seed").map(_.toInt).foreach { v =>
            graft.ingest.ChangeFeed.seed(spark, cursor, v)
            println(s"table: seeded $cursor after v$v")
          }
          graft.ingest.ChangeFeed.next(spark, dir, cursor,
            flagVal("--max-versions").map(_.toInt)
              .getOrElse(Int.MaxValue)) match {
            case None => println("table: caught up, nothing to consume")
            case Some(b) =>
              flagVal("--out").foreach(o => b.changes.write
                .mode("overwrite")
                .parquet(s"$o/v${b.fromV + 1}-v${b.toV}"))
              val counts = b.changes.groupBy("_change_type").count()
                .collect()
                .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted
              graft.ingest.ChangeFeed.ack(spark, cursor, b)
              println(s"table: consumed (v${b.fromV}, v${b.toV}] " +
                s"${counts.mkString(", ")}; cursor -> v${b.toV}")
          }
        // delete --where <sqlPredicate> [--expect N]: merge-on-read
        // delete — publishes a deletion-vector sidecar, rewrites
        // ZERO data files (ingest.TableLog.deleteWhere); reads apply
        // it; run compact-deletes before the next maintenance pass.
        case "delete" :: _ =>
          val pred = flagVal("--where").getOrElse(
            sys.error("--where <sql predicate> is required"))
          val st = graft.ingest.TableLog.deleteWhere(spark, dir,
            org.apache.spark.sql.functions.expr(pred),
            expectedHead = flagVal("--expect").map(_.toInt))
          println(s"table: deleted ${st.rowsDeleted} rows " +
            s"merge-on-read at v${st.version} (0 data files rewritten)")
        // compact-deletes [--expect N]: materialize every active
        // deletion vector (rewrites only DV-bearing files, carries
        // the rest) and unblock the maintenance loop.
        case "compact-deletes" :: _ =>
          graft.ingest.TableLog.compactDeletes(spark, dir,
            expectedHead = flagVal("--expect").map(_.toInt)) match {
            case None => println("table: no active deletion vectors")
            case Some(st) => println(s"table: materialized deletes " +
              s"at v${st.version}; ${st.filesRewritten} files rewritten")
          }
        // import <srcDir> --cluster k1,k2 [--files N]: re-land an
        // existing hive-partitioned k=v/ tree (or flat dir) as a
        // TableLog-versioned flat+clustered table at <dir> —
        // partition columns become ordinary columns reconstructed
        // from the paths, data range-clustered, v0 committed.
        case "import" :: srcDir :: _ =>
          val ks = flagVal("--cluster").getOrElse(
            sys.error("--cluster k1[,k2] is required (the downstream " +
              "merge/lookup key to range-cluster on)"))
            .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
          val st = graft.ingest.TableImport.importHive(spark, srcDir,
            dir, ks, flagVal("--files").map(_.toInt).getOrElse(16))
          println(s"table: imported ${st.rows} rows from $srcDir " +
            s"into ${st.files} files at v${st.version}" +
            (if (st.partitionCols.nonEmpty)
              s" (partition columns reconstructed: " +
                s"${st.partitionCols.mkString(", ")})"
            else ""))
        case other => sys.error(s"unknown table subcommand: $other")
      }
      if (!reused) spark.stop()
    // vacuum <tableRoot> [--retention-hours N] [--dry-run]: remove a
    // crashed run's protocol byproducts from a RangeSink root —
    // published-range staging, dead merge temps, the empty template,
    // committer _temporary — under the retention guard (never race a
    // live writer; unpublished staging is replayable state, kept at
    // any age). Published data files are never touched.
    case "vacuum" :: root :: flags =>
      def flagVal(name: String): Option[String] = flagValIn(flags, name)
      val hours = flagVal("--retention-hours").map(_.toLong).getOrElse(24L)
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-vacuum")
      val st = graft.ingest.Vacuum.run(spark, root,
        retentionMs = hours * 3600000L,
        dryRun = flags.contains("--dry-run"))
      println(s"vacuum: ${st.stagedDropped} published-range staging dirs, " +
        s"${st.inprogressDropped} merge temps, ${st.tmpDropped} _temporary, " +
        s"${st.templatesDropped} templates removed; " +
        s"${st.stagedKept} replayable staging + ${st.inprogressKept} " +
        s"live temps kept")
      if (!reused) spark.stop()
    case "optimize" :: inDir :: outDir :: flags =>
      def flagVal(name: String): Option[String] = flagValIn(flags, name)
      val dims = flagVal("--zorder").map(_.split(",")).getOrElse(
        sys.error("--zorder colX,colY is required"))
      require(dims.length == 2, "--zorder takes exactly two columns")
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-optimize")
      val n = graft.operators.ZOrder.compact(spark, inDir, outDir,
        dims(0), dims(1),
        numFiles = flagVal("--files").map(_.toInt).getOrElse(64),
        bits = flagVal("--bits").map(_.toInt).getOrElse(8))
      println(s"optimized $n rows -> $outDir")
      if (!reused) spark.stop()
    // reduce <embeddingsDir> <outDir> [--k N]: train PCA on the
    // embedding column, land the model (components/meta) and the
    // projected corpus — the dimensionality-cut front-end of the index
    // family (operators.Pca).
    case "reduce" :: embDir :: outDir :: flags =>
      def flagVal(name: String): Option[String] = flagValIn(flags, name)
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-reduce")
      val k = flagVal("--k").map(_.toInt).getOrElse(8)
      val emb = spark.read.parquet(embDir)
      val model = graft.operators.Pca.train(emb, kOut = k)
      graft.operators.Pca.write(spark, model, outDir)
      graft.operators.Pca.project(emb, model)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("pc"))
        .write.mode("overwrite").parquet(s"$outDir/projected")
      println(f"pca: dim ${model.dim} -> $k, " +
        f"variance explained ${model.varianceExplained}%.4f -> $outDir")
      if (!reused) spark.stop()
    // select <docsDir> <outDir> --target <sql-predicate> [--top N]:
    // DSIR-style importance selection — score every document by the
    // unigram log-likelihood ratio toward the target-domain predicate
    // (add-1 smoothed, integer micro-nats; Pipeline.dsirScores) and
    // land the top-N (doc_id, n_tokens, score_u).
    case "select" :: docsDir :: outDir :: flags =>
      def flagVal(name: String): Option[String] = flagValIn(flags, name)
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-select")
      import org.apache.spark.sql.functions.{col, expr}
      val target = flagVal("--target").getOrElse(
        sys.error("--target <sql-predicate> is required (e.g. " +
          "\"source = 'src0'\")"))
      val top = flagVal("--top").map(_.toInt).getOrElse(1000)
      val docs = spark.read.parquet(docsDir)
      val picked = graft.queries.Pipeline
        .dsirScores(docs, expr(target))
        .orderBy(col("score_u").desc, col("doc_id"))
        .limit(top)
      picked.coalesce(1).write.mode("overwrite").parquet(outDir)
      // no docs.count() here: it would re-scan the full input parquet
      // solely for the log line (ADVICE r13)
      println(s"select: top $top docs by LR toward ($target) -> $outDir")
      if (!reused) spark.stop()
    // index <embeddingsDir> <outDir> --kind ivf|pq: build + materialize
    // an ANN index from an embeddings parquet — the write side of the
    // similarity-search story. ivf lands cell-partitioned assignments
    // (probes become partition-pruned scans, Ann.writeIvf); pq lands the
    // m-byte codes table + codebooks (ADC scans the codes, Pq.writePq).
    case "index" :: embDir :: outDir :: flags =>
      def flagVal(name: String): Option[String] = flagValIn(flags, name)
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-index")
      val emb = spark.read.parquet(embDir)
      val iters = flagVal("--iters").map(_.toInt).getOrElse(2)
      // --append: incremental maintenance — assign the new vectors with
      // the index's FROZEN models and add files into the cell
      // partitions (no retrain, probes keep pruning)
      if (flags.contains("--append")) {
        flagVal("--kind").getOrElse("ivf") match {
          case "ivf" =>
            graft.operators.Ann.appendToIvf(spark, outDir, emb)
            println(s"ivf append: ${emb.count()} vectors -> $outDir")
          case "ivfpq" =>
            graft.operators.Pq.appendToIvfPq(spark, outDir, emb)
            println(s"ivfpq append: ${emb.count()} vectors -> $outDir")
          case "ivfsq" =>
            graft.operators.Sq.appendToIvfSq(spark, outDir, emb)
            println(s"ivfsq append: ${emb.count()} vectors -> $outDir")
          case "graph" =>
            // HNSW insert: new vectors descend the existing hierarchy;
            // --corpus points at the EXISTING embeddings the descent
            // scores against
            val corpusDir = flagVal("--corpus").getOrElse(sys.error(
              "graph append needs --corpus <existing embeddings dir>"))
            val degree = flagVal("--degree").map(_.toInt).getOrElse(16)
            graft.operators.GraphAnn.append(spark, outDir, emb,
              spark.read.parquet(corpusDir), degree)
            println(s"graph append: ${emb.count()} vectors -> $outDir")
          case other => sys.error(s"append unsupported for kind: $other")
        }
        if (!reused) spark.stop()
        return
      }
      flagVal("--kind").getOrElse("ivf") match {
        case "ivf" =>
          val k = flagVal("--k").map(_.toInt).getOrElse(256)
          val idx = graft.operators.Ann.buildIvf(emb, k, iters)
          graft.operators.Ann.writeIvf(idx, outDir)
          println(s"ivf index: $k cells -> $outDir")
        case "pq" =>
          val m = flagVal("--m").map(_.toInt).getOrElse(16)
          val k = flagVal("--k").map(_.toInt).getOrElse(16)
          val model = graft.operators.Pq.train(emb, m, k, iters)
          val codes = graft.operators.Pq.encode(
            emb.selectExpr("vec_id", "embedding"), model)
          graft.operators.Pq.writePq(model, codes, outDir)
          println(s"pq index: $m x $k codebooks -> $outDir")
        case "ivfpq" =>
          // the composed production index: coarse cells for partition-
          // pruned probes, m-byte PQ codes as the scanned payload
          val kCells = flagVal("--kcells").map(_.toInt).getOrElse(256)
          val m = flagVal("--m").map(_.toInt).getOrElse(16)
          val k = flagVal("--k").map(_.toInt).getOrElse(16)
          val idx = graft.operators.Pq.buildIvfPq(emb, kCells, m, k, iters)
          graft.operators.Pq.writeIvfPq(idx, outDir)
          println(s"ivfpq index: $kCells cells, $m x $k codebooks -> $outDir")
        case "sq" =>
          // scalar quantization (SQ8): per-dim 8-bit grid — exact
          // min/max training, 4x-compressed byte codes
          val model = graft.operators.Sq.train(emb)
          val codes = graft.operators.Sq.encode(
            emb.selectExpr("vec_id", "embedding"), model)
          graft.operators.Sq.writeSq(model, codes, outDir)
          println(s"sq index: dim ${model.dim} 8-bit grid -> $outDir")
        case "ivfsq" =>
          // composed FAISS "IVF_k,SQ8": coarse cells + byte codes
          val kCells = flagVal("--kcells").map(_.toInt).getOrElse(256)
          val idx = graft.operators.Sq.buildIvfSq(emb, kCells, iters)
          graft.operators.Sq.writeIvfSq(idx, outDir)
          println(s"ivfsq index: $kCells cells, dim ${idx.model.dim} " +
            s"8-bit grid -> $outDir")
        case "bq" =>
          // binary quantization: 1 bit/dim at the exact median, 32x
          val model = graft.operators.Bq.train(emb)
          val codes = graft.operators.Bq.encode(
            emb.selectExpr("vec_id", "embedding"), model)
          graft.operators.Bq.writeBq(model, codes, outDir)
          println(s"bq index: dim ${model.dim} 1-bit codes -> $outDir")
        case "graph" =>
          // proximity-graph index (GraphAnn — the HNSW/DiskANN family):
          // NN-Descent-refined kNN graph + medoid entry points
          val degree = flagVal("--degree").map(_.toInt).getOrElse(16)
          val kCells = flagVal("--kcells").map(_.toInt).getOrElse(64)
          val probes = flagVal("--nprobe").map(_.toInt).getOrElse(2)
          val rounds = flagVal("--descent").map(_.toInt).getOrElse(1)
          val idx = graft.operators.GraphAnn.build(emb, degree, kCells,
            iters, probes, rounds)
          graft.operators.GraphAnn.write(idx, outDir)
          println(s"graph index: degree $degree, " +
            s"${idx.entries.length} entry points -> $outDir")
        case "opq" =>
          // rotated PQ (Opq): the PCA+allocation rotation rides in the
          // index layout next to the codebooks and codes
          val m = flagVal("--m").map(_.toInt).getOrElse(16)
          val k = flagVal("--k").map(_.toInt).getOrElse(16)
          val model = graft.operators.Opq.train(emb, m, k, iters)
          val codes = graft.operators.Opq.encode(
            emb.selectExpr("vec_id", "embedding"), model)
          graft.operators.Opq.writeOpq(model, codes, outDir)
          println(s"opq index: dim ${model.dim} rotation, " +
            s"$m x $k codebooks -> $outDir")
        case "opqivfpq" =>
          // the full production composition (FAISS "OPQ,IVF,PQ"):
          // rotation + coarse cells + codes, one layout
          val kCells = flagVal("--kcells").map(_.toInt).getOrElse(256)
          val m = flagVal("--m").map(_.toInt).getOrElse(16)
          val k = flagVal("--k").map(_.toInt).getOrElse(16)
          val idx = graft.operators.Opq.buildIvfPq(emb, kCells, m, k, iters)
          graft.operators.Opq.writeOpqIvfPq(idx, outDir)
          println(s"opq-ivfpq index: $kCells cells, $m x $k codebooks, " +
            s"dim ${idx.dim} rotation -> $outDir")
        case other => sys.error(s"unknown index kind: $other")
      }
      if (!reused) spark.stop()
    // tokenize train <docsDir> <modelDir> [--algo bpe|unigram|wordpiece]
    // [--merges N | --vocab N --max-piece N]: learn a tokenizer from a
    // documents parquet and persist the model (BPE: merges + base
    // charset; unigram: the piece table; wordpiece: the piece
    // inventory). tokenize encode <docsDir> <modelDir> <outDir>: apply
    // a persisted model to a corpus, landing (doc_id, ids ARRAY<INT>)
    // parquet — the training-data pipeline's token production step,
    // map-only through the codegen'd kernel. Encode detects the model
    // kind from the on-disk layout.
    case "tokenize" :: "train" :: docsDir :: modelDir :: flags =>
      def flagVal(name: String): Option[String] = flagValIn(flags, name)
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-tokenize")
      val docs = spark.read.parquet(docsDir)
      flagVal("--algo").getOrElse("bpe") match {
        case "bpe" =>
          val n = flagVal("--merges").map(_.toInt).getOrElse(1000)
          val merges = graft.operators.Bpe.train(docs, n)
          val model = graft.operators.Bpe.rankModel(merges, docs)
          graft.operators.Bpe.writeModel(model, spark, modelDir)
          println(s"bpe model: ${model.merges.length} merges, " +
            s"vocab ${model.vocabSize} -> $modelDir")
        case "unigram" =>
          val v = flagVal("--vocab").map(_.toInt).getOrElse(8000)
          val maxPiece = flagVal("--max-piece").map(_.toInt).getOrElse(6)
          // seed must exceed the vocab target or the prune has nothing
          // to cut (Unigram.train requires it); 4x is the profile-tested
          // ratio (ProfileUnigram).
          val seed = flagVal("--seed").map(_.toInt).getOrElse(4 * v)
          val table = graft.operators.Unigram.train(docs, vocabSize = v,
            maxPieceLen = maxPiece, seedSize = seed)
          val model = graft.operators.Unigram.modelOf(table)
          graft.operators.Unigram.writeModel(model, spark, modelDir)
          println(s"unigram model: ${model.vocabSize} pieces -> $modelDir")
        case "wordpiece" =>
          val n = flagVal("--merges").map(_.toInt).getOrElse(1000)
          val model = graft.operators.WordPiece.train(docs, n)
          graft.operators.WordPiece.writeModel(model, spark, modelDir)
          println(s"wordpiece model: ${model.pieces.length} pieces " +
            s"(vocab ${model.vocabSize} with continuations) -> $modelDir")
        case other => sys.error(s"unknown tokenizer algo: $other")
      }
      if (!reused) spark.stop()
    case "tokenize" :: "encode" :: docsDir :: modelDir :: outDir :: _ =>
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-tokenize")
      val docs = spark.read.parquet(docsDir)
      val tok = loadTokenizer(spark, modelDir)
      val encoded = docs.select(
        org.apache.spark.sql.functions.col("doc_id"),
        tok.tokenIds(org.apache.spark.sql.functions.col("text")).as("ids"))
      encoded.write.mode("overwrite").parquet(outDir)
      println(s"encoded ${spark.read.parquet(outDir).count()} docs -> $outDir")
      if (!reused) spark.stop()
    // search <indexDir> <embDir> <outDir> --kind ivf|ivfpq [--q ids]
    // [--topk N] [--nprobe N] [--shortlist N]: load a materialized index
    // and run top-k queries against it, landing (q_id, rnk, vec_id,
    // score) parquet — the read side of the similarity-search story.
    // Queries default to the first 5 corpus vectors; --q takes a
    // comma-separated vec_id list from the same embeddings parquet.
    // --filter-label L (kinds ivf|graph): metadata-FILTERED search —
    // the predicate pre-filters before scoring (never post-); graph
    // routes through FilteredSearch.auto (--scan-budget N overrides
    // the exact-scan crossover).
    case "search" :: indexDir :: embDir :: outDir :: flags =>
      def flagVal(name: String): Option[String] = flagValIn(flags, name)
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-search")
      import org.apache.spark.sql.functions.col
      val emb = spark.read.parquet(embDir)
      val qIds = flagVal("--q")
        .map(_.split(",").map(_.trim.toLong).toSeq)
        .getOrElse(Seq(0L, 1L, 2L, 3L, 4L))
      val queries = emb.filter(col("vec_id").isin(qIds: _*))
        .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
      val topK = flagVal("--topk").map(_.toInt).getOrElse(10)
      val nprobe = flagVal("--nprobe").map(_.toInt).getOrElse(8)
      val eligible = flagVal("--filter-label").map(l =>
        emb.filter(col("label") === l.toInt).select("vec_id"))
      val kind = flagVal("--kind").getOrElse("ivfpq")
      require(eligible.isEmpty || kind == "ivf" || kind == "graph",
        s"--filter-label supports --kind ivf|graph, not $kind")
      val result = kind match {
        case "ivf" =>
          val idx = graft.operators.Ann.loadIvf(spark, indexDir)
          eligible match {
            case Some(e) =>
              graft.operators.Ann.searchFiltered(idx, queries, e, topK,
                nprobe)
            case None =>
              graft.operators.Ann.search(idx, queries, topK, nprobe)
          }
        case "ivfpq" =>
          val idx = graft.operators.Pq.loadIvfPq(spark, indexDir)
          graft.operators.Pq.searchIvfPq(idx, queries, emb, topK, nprobe,
            shortlist = flagVal("--shortlist").map(_.toInt)
              .getOrElse(topK * 5))
        case "opq" =>
          val (model, codes) = graft.operators.Opq.loadOpq(spark, indexDir)
          graft.operators.Opq.searchRerank(codes, model, emb, queries,
            topK, shortlist = flagVal("--shortlist").map(_.toInt)
              .getOrElse(topK * 5))
        case "opqivfpq" =>
          val idx = graft.operators.Opq.loadOpqIvfPq(spark, indexDir)
          graft.operators.Opq.searchIvfPq(idx, queries, emb, topK,
            nprobe, shortlist = flagVal("--shortlist").map(_.toInt)
              .getOrElse(topK * 5))
        case "sq" =>
          val (model, codes) = graft.operators.Sq.loadSq(spark, indexDir)
          graft.operators.Sq.searchRerank(codes, model, emb, queries,
            topK, shortlist = flagVal("--shortlist").map(_.toInt)
              .getOrElse(topK * 3))
        case "ivfsq" =>
          val idx = graft.operators.Sq.loadIvfSq(spark, indexDir)
          graft.operators.Sq.searchIvfSq(idx, queries, emb, topK, nprobe,
            shortlist = flagVal("--shortlist").map(_.toInt)
              .getOrElse(topK * 3))
        case "bq" =>
          // 1-bit hamming shortlist + exact rerank; default shortlist
          // is deep (10x) because hamming resolves neighborhoods, not
          // within-neighborhood ranking
          val (model, codes) = graft.operators.Bq.loadBq(spark, indexDir)
          graft.operators.Bq.searchRerank(codes, model, emb, queries,
            topK, shortlist = flagVal("--shortlist").map(_.toInt)
              .getOrElse(topK * 10))
        case "graph" =>
          // beam search over the proximity graph (--ef = beam width)
          val idx = graft.operators.GraphAnn.load(spark, indexDir)
          val ef = flagVal("--ef").map(_.toInt).getOrElse(math.max(32, topK))
          eligible match {
            case Some(e) =>
              graft.operators.FilteredSearch.auto(idx, emb, queries, e,
                topK, ef, scanBudget = flagVal("--scan-budget")
                  .map(_.toLong).getOrElse(100000L))
            case None =>
              graft.operators.GraphAnn.search(idx, emb, queries, topK, ef)
          }
        case other => sys.error(s"unknown search kind: $other")
      }
      result.write.mode("overwrite").parquet(outDir)
      println(s"search: ${qIds.size} queries, top-$topK -> $outDir")
      if (!reused) spark.stop()
    case "run" :: blocksDir :: outRoot :: flags =>
      def flagVal(name: String): Option[String] = flagValIn(flags, name)
      val pt = RangePartitioner(
        start = flagVal("--start").map(_.toLong).getOrElse(0L),
        size = flagVal("--partition-size").map(_.toLong).getOrElse(5000L))
      val tuning = ParquetTuning(
        compression = flagVal("--compression").getOrElse("zstd"),
        compressionLevel = flagVal("--compression-level").map(_.toInt),
        rowGroupBytes = flagVal("--row-group-bytes").map(_.toLong),
        pageSizeBytes = flagVal("--page-size-bytes").map(_.toLong),
        dictionaryEncoding = !flags.contains("--no-dictionary"))
      val checkpoint = flagVal("--checkpoint")
        .getOrElse(s"$outRoot/_checkpoint")
      // Manifest-driven schema (factory.go:183 / converter_proto.go:24-45):
      // a FileDescriptorSet (protoc --descriptor_set_out) or substreams
      // .spkg names the output message; without one the built-in sample
      // schema stands in (SURVEY.md §7.3).
      val schema = (flagVal("--descriptor-set"), flagVal("--message")) match {
        case (Some(ds), Some(m)) => DescriptorSet.load(ds, m)
        case (Some(_), None) | (None, Some(_)) =>
          System.err.println("--descriptor-set and --message go together")
          sys.exit(2)
        case _ => SampleBlocks.output
      }
      // only stop a session this command created — under tests (or an
      // embedding app) the session is shared and outlives the command
      val reused =
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
      val spark = Sessions.get("graft-run")
      // --endpoint host:port streams from a live Substreams gRPC endpoint
      // (run.go:100-108 endpoint resolution; <blocksDir> is ignored — pass
      // `-`); without it, a block-parquet directory stands in (§7.3)
      // --endpoint host:port, or --network <name> resolved through the
      // registry (run.go:73-92: endpoint > network > manifest network;
      // env override SUBSTREAMS_ENDPOINTS_CONFIG_<NETWORK>)
      val endpointOpt = (flagVal("--endpoint"), flagVal("--network")) match {
        case (None, None) => None
        case (ep, net) =>
          Some(graft.sources.Networks.resolve(ep, net))
      }
      val blocks = endpointOpt match {
        case Some(ep) =>
          spark.readStream.format("graft.sources.BlockStreamProvider")
            .option("client",
              classOf[graft.sources.GrpcBlockClientFactory].getName)
            .option("endpoint", ep)
            .option("outputModule",
              flagVal("--output-module").getOrElse("map_output"))
            // --confirmations (alias --undo-buffer-size, kept for
            // compat): on this DSv2 path the source consumes FINALIZED
            // ranges only, so the value lags the exposed offset behind
            // the probed head — no UndoBuffer is engaged here (the
            // live()/UndoBuffer composition is the streaming client's
            // unfinalized-tail path)
            .option("confirmations",
              flagVal("--confirmations")
                .orElse(flagVal("--undo-buffer-size")).getOrElse("0"))
            .load()
        case None => spark.readStream.schema(blockSchema).parquet(blocksDir)
      }
      val q = BlockPipeline.start(blocks, schema, outRoot, pt,
        checkpoint, explode = flags.contains("--explode"),
        trigger = Trigger.AvailableNow(), tuning = tuning)
      q.processAllAvailable()
      q.stop()
      if (!reused) spark.stop()
    case _ =>
      System.err.println(
        """usage:
          |  graft.CliMain run <blocksDir> <outRoot> [--explode]
          |    [--partition-size N] [--start N] [--compression C]
          |    [--checkpoint DIR] [--descriptor-set F --message M]
          |    [--compression-level N] [--row-group-bytes N]
          |    [--page-size-bytes N] [--no-dictionary]
          |    [--endpoint host:port | --network NAME]
          |    [--output-module M]
          |     [--confirmations K]]  (K: how many blocks the exposed
          |      offset lags the probed head; finalized ranges only —
          |      alias: --undo-buffer-size)
          |  graft.CliMain corpus <jsonlDir> <outRoot> [--near-dup]
          |    [--bag-dedup] [--watermark W] [--checkpoint DIR]
          |    [--tokenizer MODELDIR]
          |  graft.CliMain warc <warcGlob> <outRoot>
          |  graft.CliMain quality train <posDir> <negDir> <modelDir>
          |    [--buckets B] [--iters N]
          |  graft.CliMain quality score <docsDir> <modelDir> <outDir>
          |  graft.CliMain upsert <tableDir> <changesDir> <outDir>
          |    --key k[,k2] [--version c] [--tombstone c]
          |    | --scd2 --keys k1,k2 [--ts c] [--seq c]
          |  graft.CliMain rollup --init <deltaDir> <outDir>
          |    --keys k1,k2 --agg n:count [--agg s:sum:col]
          |  graft.CliMain rollup <tableDir> <deltaDir> <outDir>
          |    --keys k1,k2 --agg n:count [--agg s:sum:col]
          |  graft.CliMain skipindex <tableDir> <column>
          |    [--bits B] [--k K]
          |  graft.CliMain skipindex lookup <tableDir> <column> <keys>
          |  graft.CliMain skipindex refresh <tableDir> <column>
          |  graft.CliMain table <dir> init | commit <fromDir>
          |    [--action a] [--expect N] | history
          |    | read [--version N]
          |    | expire --retain N [--min-age-hours H]
          |      [--allow-batch-drop]
          |    | diff --from V [--to V]
          |  graft.CliMain optimize <inDir> <outDir> --zorder colX,colY
          |    [--files N] [--bits B]
          |  graft.CliMain reduce <embeddingsDir> <outDir> [--k N]
          |  graft.CliMain select <docsDir> <outDir>
          |    --target <sql-predicate> [--top N]
          |  graft.CliMain index <embeddingsDir> <outDir>
          |    [--kind ivf|pq|ivfpq|opq|opqivfpq|sq|ivfsq|bq|graph] [--k K] [--m M]
          |    [--kcells K] [--iters N] [--append]
          |    [--degree D --nprobe P --descent R]  (graph kind)
          |  graft.CliMain search <indexDir> <embeddingsDir> <outDir>
          |    [--kind ivf|ivfpq|opq|opqivfpq|sq|ivfsq|bq|graph] [--topk N]
          |    [--nprobe P] [--shortlist N] [--ef N] [--q id,id,...]
          |  graft.CliMain tokenize train <docsDir> <modelDir>
          |    [--algo bpe|unigram|wordpiece] [--merges N | --vocab N --max-piece N]
          |  graft.CliMain tokenize encode <docsDir> <modelDir> <outDir>
          |  graft.CliMain stats <docsDir> <outDir>
          |    [--col name] [--alpha a] [--qs q,q,...]
          |  graft.CliMain setup <store_url>""".stripMargin)
      sys.exit(2)
  }
}
