package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus ingestion — the LLM-data analog of [[BlockPipeline]]:
  * a live document stream (web crawl, feed dump) flows through the same
  * operators the batch pipeline oracle-checks (graft.queries.Pipeline),
  * continuously:
  *
  *   quality filter (map-only)
  *     → exact dedup on a content fingerprint, stateful WITHIN the
  *       watermark (`dropDuplicatesWithinWatermark` — state is bounded
  *       by event time, so the dedup map can't grow unboundedly the way
  *       an un-watermarked global dedup would at 100 TB/day)
  *     → context-window chunking (64-token windows, stride 48; map-only
  *       posexplode)
  *     → append-mode parquet sink with checkpointed exactly-once.
  *
  * Duplicates SEPARATED by more than the watermark are deliberately kept:
  * bounded state is the scale contract. The batch exact-dedup pass
  * (q_dedup_exact) remains the global guarantee; the streaming stage is
  * the cheap first filter that drops the near-in-time duplicate storm
  * (reposts, crawler revisits) before it costs storage.
  *
  * Input schema: (doc_id long, ts timestamp, text string, source string).
  */
object CorpusPipeline {

  /** The filter/dedup/chunk transform, shared by the streaming entry and
    * its batch-equivalence tests (same Dataset code runs in both).
    *
    * @param bagDedup when true, the dedup fingerprint is the md5 of the
    *   SORTED token multiset instead of the raw text — token-permuted
    *   duplicates (title/byline reshuffles, the near-dup class the batch
    *   MinHash stage exists for) collapse too, still exact-match cheap:
    *   one array_sort per doc, no signatures, no candidate join. */
  /** Optional final stage: tokenize each chunk with a pre-trained
    * model — BPE or unigram-LM, anything implementing
    * [[graft.functions.RowTokenizer]] (trained offline, model rides in
    * as codegen reference state — map-only and STATELESS, so it is
    * legal in any streaming output mode and adds no state store). The
    * streamed corpus then lands training-ready: (…, chunk_text, ids). */
  private def withIds(df: DataFrame,
      tokenizer: Option[graft.functions.RowTokenizer]): DataFrame =
    tokenizer.fold(df)(m => df.withColumn("ids",
      m.tokenIds(col("chunk_text"))))

  /** Optional LEARNED quality gate ahead of the heuristic rules: a
    * pre-trained classifier (graft.operators.QualityClassifier, trained
    * offline like the BPE model) scores each doc through the in-row
    * kernel — map-only and stateless, so it is legal in any output mode
    * and adds no state store. Docs scoring below `minScoreU`
    * (micro-units) drop before the dedup state ever sees them. */
  private def modelGate(df: DataFrame,
      qualityModel: Option[(graft.operators.QualityClassifier.QcModel, Long)])
      : DataFrame =
    qualityModel.fold(df) { case (m, minScoreU) =>
      df.filter(graft.functions.QcExpressions.qcScoreU(col("text"),
        m.weightsU, m.buckets,
        graft.operators.QualityClassifier.HashSeed) >= minScoreU)
    }

  def transform(docs: DataFrame, watermark: String,
                bagDedup: Boolean = false,
                tokenizer: Option[graft.functions.RowTokenizer] = None,
                qualityModel: Option[
                  (graft.operators.QualityClassifier.QcModel, Long)] = None)
      : DataFrame = {
    val fp =
      if (bagDedup) md5(concat_ws(" ", array_sort(split(col("text"), " "))))
      else md5(col("text"))
    val chunks = expr(
      """element_at(transform(array(split(text, ' ')), tk ->
        |  transform(sequence(1, size(tk), 48),
        |    st -> concat_ws(' ', slice(tk, int(st), 64)))), 1)""".stripMargin)
    val out = modelGate(docs, qualityModel)
      .withColumn("n_chars", length(col("text")))
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .filter(col("n_chars") >= 10 &&
        !(col("n_tokens") > 4 &&
          size(array_distinct(split(col("text"), " "))) * 4 < col("n_tokens")))
      .withColumn("fp", fp)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .select(col("doc_id"), col("ts"), col("source"), col("fp"),
        posexplode(chunks))
      .select(col("doc_id"), col("ts"), col("source"), col("fp"),
        (col("pos") + 1).cast("long").as("chunk_id"),
        col("col").as("chunk_text"))
    withIds(out, tokenizer)
  }

  def start(docs: DataFrame, root: String, checkpoint: String,
            watermark: String = "10 minutes",
            trigger: Trigger = Trigger.ProcessingTime("1 second"),
            bagDedup: Boolean = false,
            tokenizer: Option[graft.functions.RowTokenizer] = None,
            qualityModel: Option[
              (graft.operators.QualityClassifier.QcModel, Long)] = None)
      : StreamingQuery =
    transform(docs, watermark, bagDedup, tokenizer, qualityModel)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", root)
      .outputMode("append")
      .start()

  /** The quality-filter stage alone (shared by the near-dup variant,
    * which does its own dedup and chunking inside foreachBatch). */
  private[streaming] def qualityFilter(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_chars", length(col("text")))
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .filter(col("n_chars") >= 10 &&
        !(col("n_tokens") > 4 &&
          size(array_distinct(split(col("text"), " "))) * 4 < col("n_tokens")))
      .drop("n_chars", "n_tokens")

  private[streaming] def chunked(docs: DataFrame): DataFrame = {
    val chunks = expr(
      """element_at(transform(array(split(text, ' ')), tk ->
        |  transform(sequence(1, size(tk), 48),
        |    st -> concat_ws(' ', slice(tk, int(st), 64)))), 1)""".stripMargin)
    docs
      .select(col("doc_id"), col("ts"), col("source"), posexplode(chunks))
      .select(col("doc_id"), col("ts"), col("source"),
        (col("pos") + 1).cast("long").as("chunk_id"),
        col("col").as("chunk_text"))
  }

  /** NEAR-dup variant: quality filter → streaming MinHash/LSH dedup
    * ([[NearDupStage]]: bucket-claim registry, watermark-bounded state)
    * → chunking → parquet. foreachBatch-driven because the LSH drop
    * decision is cross-key (see NearDupStage scaladoc); the sink write
    * is epoch-deterministic, the registry append epoch-idempotent, and
    * the checkpoint makes the whole composition exactly-once. */
  /** @param docsRoot when set, the DOC-level survivor corpus (pre-chunk,
    *   full rows) also lands there per epoch — the feed for periodic
    *   batch re-clustering (graft.queries.Llm.lshCascade over the
    *   survivor corpus), the composition CorpusPipelineSpec pins. */
  def startNearDup(docs: DataFrame, root: String, checkpoint: String,
                   registryDir: String,
                   watermark: String = "10 minutes",
                   trigger: Trigger = Trigger.ProcessingTime("1 second"),
                   docsRoot: Option[String] = None,
                   tokenizer: Option[graft.functions.RowTokenizer] = None,
                   qualityModel: Option[
                     (graft.operators.QualityClassifier.QcModel, Long)] = None)
      : StreamingQuery = {
    val stage = NearDupStage(registryDir, watermarkMs = parseMs(watermark))
    qualityFilter(modelGate(docs, qualityModel))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        // per-epoch overwrite dirs (partition-style names): an epoch
        // replay rewrites its own output instead of appending dups.
        // processWith overlaps the registry claim write with this sink
        // write — independent jobs, both complete before the epoch commits
        stage.processWith(batch, epochId) { survivors =>
          val pinned =
            if (docsRoot.isEmpty) survivors
            else {
              // both sinks consume survivors: pin once, write docs first
              val p = survivors.localCheckpoint()
              p.write.mode("overwrite")
                .parquet(s"${docsRoot.get}/epoch=$epochId")
              p
            }
          withIds(chunked(pinned), tokenizer)
            .write.mode("overwrite").parquet(s"$root/epoch=$epochId")
        }
      }
      .start()
  }

  /** Embedding-space variant: streaming SemDeDup ([[EmbedNearDupStage]]:
    * IVF-cell claims, exact cosine verify within cell) → survivor
    * parquet per epoch, same epoch-overwrite exactly-once contract as
    * [[startNearDup]]. The coarse model is trained OFFLINE on a corpus
    * sample (`CliMain index --kind ivf` / [[graft.operators.Ann.buildIvf]])
    * and rides in as model state — the stream never re-clusters. */
  def startEmbedNearDup(docs: DataFrame, root: String, checkpoint: String,
      registryDir: String, centroids: Array[Array[Float]], tau: Double,
      watermark: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery = {
    val stage = EmbedNearDupStage(registryDir,
      watermarkMs = parseMs(watermark), centroids = centroids, tau = tau)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        stage.process(batch, epochId)
          .write.mode("overwrite").parquet(s"$root/epoch=$epochId")
      }
      .start()
  }

  /** Streaming ANN-index maintenance — the HNSW insert as a stream
    * stage: each micro-batch of (vec_id, embedding) rows is inserted
    * into the materialized graph index ([[graft.operators.GraphAnn
    * .append]] — frozen level draw and entry contract) and landed into
    * the corpus store as its own epoch partition, so later batches (and
    * later rebuilds) see the grown corpus.
    *
    * Idempotency under epoch replay, by construction: the corpus epoch
    * dir OVERWRITES (a replayed epoch rewrites its own rows, never
    * duplicates), and while edge appends are at-least-once, the search
    * path dedups adjacency (symmetrize → distinct) — so a replayed
    * epoch's duplicate edge rows cannot change ANY search result
    * (GraphAnnStreamSpec pins replay ≡ once). `corpusDir` must hold the
    * index's build-time corpus as `epoch=...` partitions (write the
    * initial corpus under `epoch=0`). */
  def startGraphAppend(vectors: DataFrame, indexDir: String,
      corpusDir: String, checkpoint: String, degree: Int = 16,
      trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val spark = batch.sparkSession
        val b = batch.select(col("vec_id"), col("embedding"))
          .localCheckpoint()
        if (b.count() > 0) {
          // existing corpus FIRST (pre-batch): the insert descends the
          // graph as it stood, the HNSW batch contract
          val corpus = spark.read.parquet(corpusDir)
            .select(col("vec_id"), col("embedding"))
          graft.operators.GraphAnn.append(spark, indexDir, b, corpus,
            degree)
          b.write.mode("overwrite")
            .parquet(s"$corpusDir/epoch=${epochId + 1}")
        }
      }
      .start()

  private[streaming] def parseMs(interval: String): Long = {
    val m = raw"(\d+)\s*(millisecond|second|minute|hour|day)s?".r
      .findFirstMatchIn(interval.trim.toLowerCase(java.util.Locale.ROOT))
      .getOrElse(throw new IllegalArgumentException(
        s"unparseable interval: $interval"))
    val unit = Map("millisecond" -> 1L, "second" -> 1000L,
      "minute" -> 60000L, "hour" -> 3600000L, "day" -> 86400000L)(m.group(2))
    m.group(1).toLong * unit
  }
}
