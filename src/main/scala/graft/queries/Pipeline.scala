package graft.queries

import graft.{QueryFamily, Tables}
import graft.operators.{Bloom, QualityClassifier}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond the reference's surface
  * (SURVEY.md §2.C-10 extensions): deterministic dataset splitting,
  * context-window sequence packing, benchmark-contamination checks,
  * intra-document repetition signals, and PII scrubbing. All DuckDB-
  * oracled — cross-engine determinism comes from integer/md5 arithmetic
  * (no engine-specific hashes) and floor-scaled ratios (§7.5).
  *
  * Scale design (100 TB):
  *  - split/scrub/repetition are map-only (or one partial-agg shuffle) —
  *    embarrassingly parallel;
  *  - packing is windowed per SHARD, never a global single-partition
  *    window — each shard packs independently, so 1000 executors pack
  *    1000 shards concurrently;
  *  - contamination broadcasts the (small) benchmark n-gram set and
  *    aggregates map-side, so the corpus never shuffles its n-grams.
  */
object Pipeline extends QueryFamily {

  private def toks: Column = split(col("text"), " ")

  /** Packing shard count — bounds the parallelism of the per-shard packing
    * window. The DEFAULT is a fixed 8 so that shard / pack_id assignment is
    * deterministic across hosts (a host-parallelism default made the output
    * itself machine-dependent, which poisons pinned results and cross-host
    * reproducibility). A real deployment opts into cluster-scaled sharding
    * via -Dgraft.packShards=executors×cores — the contract is that shard
    * assignment is a FUNCTION OF the configured shard count, documented
    * here rather than hidden in a bench note. The oracle SQL interpolates
    * the SAME value, so the Spark and DuckDB legs agree either way. */
  private[graft] val packShards: Int =
    sys.props.get("graft.packShards").map(_.toInt).getOrElse(8)

  /** Word bigrams with the token array bound ONCE per row (see
    * Llm.shingles: HOF lambdas get no CSE — an unbound split(text) would
    * re-tokenize per element). Empty for docs with <2 tokens. Shared with
    * Llm.q_ngrams, where this binding replaces a repartition-as-CSE-barrier
    * that shuffled full token arrays. */
  private[graft] def bigrams: Column = expr(
    """case when size(split(text, ' ')) < 2 then array()
      |else flatten(transform(array(split(text, ' ')), tk ->
      |  transform(sequence(1, size(tk) - 1),
      |    i -> concat_ws(' ', element_at(tk, int(i)),
      |                        element_at(tk, int(i) + 1)))))
      |end""".stripMargin)

  /** Oracle-checkable SimHash: 16-bit fingerprint from md5-derived token
    * hashes (engine-agnostic, unlike xxhash64 in Llm.q_simhash). Shape =
    * explode → per-(doc, bit) votes as 16 conditional sums in ONE
    * partial-aggregated pass — the shuffle carries 17 ints per doc, never
    * token instances. */
  private def simhash16(docs: DataFrame): DataFrame =
    simhashN(docs, 16, "simhash16")

  /** Vote-based SimHash over the first bits/4 md5 nibbles of each token —
    * engine-portable (the DuckDB oracle mirrors it nibble for nibble). */
  private def simhashN(docs: DataFrame, bits: Int, outCol: String): DataFrame = {
    val h = conv(substring(md5(col("token")), 1, bits / 4), 16, 10)
      .cast("long")
    val votes = (0 until bits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1)) === 1, 1)
        .otherwise(-1)).as(s"v$b"))
    val fp = (0 until bits).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    docs
      .select(col("doc_id"), explode(toks).as("token"))
      .withColumn("h", h)
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), fp.as(outCol))
  }

  /** Planted ground truth for the learned quality filter
    * (q_quality_classifier): positives are the real documents; negatives
    * are the same documents with a word-hash-selected third of the
    * VOCABULARY corrupted by a suffix — consistent per word type, so the
    * corrupted tokens form a negative-only vocabulary the classifier must
    * discover (the curated-vs-crawl label construction of the GPT-3
    * quality filter, §A of arXiv:2005.14165, with a synthesizable ground
    * truth). Corruption and the train/test split are xxhash64 functions
    * of the data — deterministic across hosts and partitionings. `orig`
    * keeps a positive and its corrupted twin in the SAME split fold so
    * the held-out task is never leaked its training twins. */
  private[graft] def qualityLabeled(docs: DataFrame): DataFrame = {
    val corrupted = array_join(
      transform(split(col("text"), " "),
        t => when(pmod(xxhash64(lit(7), t), lit(3)) === 0,
          concat(t, lit("zq"))).otherwise(t)), " ")
    val pos = docs.select(col("doc_id"), col("text"), lit(1).as("label"),
      col("doc_id").as("orig"))
    // 1L<<40 keeps the twin id space disjoint at ANY sweep size (a 1e7
    // offset aliased corrupted twins onto real ids past 10M docs)
    val neg = docs.select((col("doc_id") + lit(1L << 40)).as("doc_id"),
      corrupted.as("text"), lit(0).as("label"), col("doc_id").as("orig"))
    pos.union(neg)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_image_neardup" -> { (s, d) =>
      // Multimodal near-dup (multimodal.PerceptualHash): the testdata
      // ships no media payloads, so the corpus is synthesized
      // DETERMINISTICALLY from the documents table's doc_ids
      // (SyntheticImages gradient PNGs through the real JDK codec) with
      // every 5th image given a resized re-encoded twin — then dHash +
      // banded hamming join (the SimHash band discipline; exact by
      // pigeonhole). Rows-only (perceptual bits are codec-path
      // specific); PerceptualHashSpec pins drift/precision/exactness.
      import s.implicits._
      val ids = Tables.documents(s, d).select("doc_id")
        .orderBy("doc_id").limit(40).as[Long].collect()
      val rows = ids.map { i =>
        graft.multimodal.Media.MediaRow(i, "image",
          graft.multimodal.SyntheticImages.png(
            graft.multimodal.SyntheticImages.structured(seed = i)),
          graft.multimodal.Media.MediaMeta(96, 80, 0, 0))
      } ++ ids.filter(_ % 5 == 0).map { i =>
        graft.multimodal.Media.MediaRow(i + 1000000L, "image",
          graft.multimodal.ImageCodec.resizePng(
            graft.multimodal.SyntheticImages.structured(seed = i), 72, 60),
          graft.multimodal.Media.MediaMeta(72, 60, 0, 0))
      }
      val media = rows.toSeq.toDS()
      val hs = graft.multimodal.PerceptualHash.hashes(media, "dhash")
      graft.multimodal.PerceptualHash.nearDupPairs(hs, bandBits = 16,
        maxHamming = 3)
    },
    "q_audio_neardup" -> { (s, d) =>
      // The audio arm of the multimodal cascade
      // (multimodal.AudioFingerprint): Philips-family band-difference
      // fingerprints over REAL JDK-decoded WAVs synthesized
      // deterministically from doc_ids, with every 5th clip given a
      // resampled + volume-shifted twin (the transformations a
      // re-encoded copy undergoes) — then the SAME banded hamming join
      // as q_image_neardup: one exact join serves every modality.
      // Rows-only; AudioFingerprintSpec pins gain/resample/precision.
      import s.implicits._
      val ids = Tables.documents(s, d).select("doc_id")
        .orderBy("doc_id").limit(40).as[Long].collect()
      val rows = ids.map { i =>
        graft.multimodal.Media.MediaRow(i, "audio",
          graft.multimodal.SyntheticAudio.wav(i, ms = 400),
          graft.multimodal.Media.MediaMeta(0, 0, 16000, 400))
      } ++ ids.filter(_ % 5 == 0).map { i =>
        graft.multimodal.Media.MediaRow(i + 1000000L, "audio",
          graft.multimodal.SyntheticAudio.wav(i, ms = 400, rate = 44100,
            volume = 0.4),
          graft.multimodal.Media.MediaMeta(0, 0, 44100, 400))
      }
      val media = rows.toSeq.toDS()
      val hs = graft.multimodal.AudioFingerprint.hashes(media)
      graft.multimodal.PerceptualHash.nearDupPairs(hs, bandBits = 16,
        maxHamming = 3)
    },
    "q_video_neardup" -> { (s, d) =>
      // The multi-frame arm (multimodal.VideoFingerprint): synthetic
      // animated GIFs through the real JDK multi-frame decoder, every
      // 4th clip given a per-frame-resized re-encoded twin — per-frame
      // dHash sequences, then the slot-aligned banded hamming join
      // (matched_slots is EXACT per the per-slot pigeonhole).
      // Rows-only; VideoFingerprintSpec pins banded ≡ all-pairs,
      // planted resize/trim recall, and leniency.
      import s.implicits._
      val ids = Tables.documents(s, d).select("doc_id")
        .orderBy("doc_id").limit(16).as[Long].collect()
      val rows = ids.map { i =>
        graft.multimodal.Media.MediaRow(i, "video",
          graft.multimodal.SyntheticImages.animatedGif(
            graft.multimodal.SyntheticImages.video(i, nFrames = 6)),
          graft.multimodal.Media.MediaMeta(96, 80, 0, 0))
      } ++ ids.filter(_ % 4 == 0).map { i =>
        graft.multimodal.Media.MediaRow(i + 1000000L, "video",
          graft.multimodal.SyntheticImages.animatedGif(
            graft.multimodal.SyntheticImages.video(i, nFrames = 6).map(f =>
              graft.multimodal.ImageCodec.decode(
                graft.multimodal.ImageCodec.resizePng(f, 72, 60)).get)),
          graft.multimodal.Media.MediaMeta(72, 60, 0, 0))
      }
      val media = rows.toSeq.toDS()
      val fh = graft.multimodal.VideoFingerprint.frameHashes(media, 6)
      graft.multimodal.VideoFingerprint.nearDupPairs(fh, bandBits = 16,
        maxHamming = 3, minMatched = 5)
    },
    "q_split_hash" -> { (s, d) =>
      // Deterministic train/val/test assignment from a content hash —
      // stable across runs, engines, and partitionings (a random split
      // would leak val docs into train on every re-run). Buckets from the
      // first 8 hex digits of md5: engine-agnostic, uniform.
      val h = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"), pmod(h, lit(1000)).as("bucket"))
        .select(col("doc_id"), col("bucket"),
          when(col("bucket") < 900, "train")
            .when(col("bucket") < 950, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    },
    "q_pack_sequences" -> { (s, d) =>
      // Greedy context-window packing: running token total per shard,
      // window id = floor(preceding_total / ctx). Sharded window — the
      // global-order variant would serialize on one partition at scale.
      val shard = pmod(col("doc_id"), lit(packShards))
      val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), shard.as("shard"),
          size(toks).as("n_tokens"))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .withColumn("pack_id",
          floor((col("cum_tokens") - col("n_tokens")) / lit(2048.0))
            .cast("long"))
        .orderBy("doc_id")
    },
    "q_contamination" -> { (s, d) =>
      // Benchmark-contamination check: corpus docs sharing word bigrams
      // with a held-out benchmark set (doc_id < 20 stands in). The
      // benchmark n-gram set is broadcast; the corpus side aggregates
      // map-side — its n-grams never shuffle.
      val docs = Tables.documents(s, d)
      val bench = docs.filter(col("doc_id") < 20)
        .select(explode(bigrams).as("bigram")).distinct()
      // corpus bigrams are NOT pre-distinct'd: that was a full shuffle of
      // every (doc, bigram) pair. The broadcast join keeps duplicates
      // map-side and count_distinct dedups them in its partial
      // aggregation — same result, one corpus shuffle instead of two.
      val corpus = docs.filter(col("doc_id") >= 20)
        .select(col("doc_id"), explode(bigrams).as("bigram"))
      corpus.join(broadcast(bench), Seq("bigram"))
        .groupBy("doc_id")
        .agg(count_distinct(col("bigram")).as("n_shared_bigrams"))
        .orderBy("doc_id")
    },
    "q_contamination_bloom" -> { (s, d) =>
      // q_contamination's 100 TB shape: the benchmark bigram set rides
      // as Bloom BITS instead of broadcast strings (operators/Bloom —
      // a real held-out suite is ~1e8 grams, gigabytes of strings but
      // ~1 GB of bits at a 1e-4 FP rate). Per-doc counts are a
      // deterministic SUPERSET of the exact ones: no false negatives
      // structurally, false positives at the filter's measured epsilon
      // (both pinned in BloomSpec against q_contamination).
      val docs = Tables.documents(s, d)
      val bench = docs.filter(col("doc_id") < 20)
        .select(explode(bigrams).as("bigram")).distinct()
      val mBits = 1L << 16
      val filt = Bloom.build(bench, "bigram", mBits, k = 4)
      val corpus = docs.filter(col("doc_id") >= 20)
        .select(col("doc_id"), explode(bigrams).as("bigram"))
      // the probe is row-preserving and map-side; count_distinct dedups
      // duplicate (doc, bigram) survivors in its partial aggregation —
      // the corpus side's ONLY shuffle (the q_contamination discipline)
      Bloom.mightContain(filt, corpus, "bigram", mBits, k = 4)
        .groupBy("doc_id")
        .agg(count_distinct(col("bigram")).as("n_flagged_bigrams"))
        .orderBy("doc_id")
    },
    "q_repetition" -> { (s, d) =>
      // Intra-doc repetition signals (the boilerplate/spam filter):
      // distinct-token ratio and the hottest token's share. Two partial
      // aggregations — token instances never leave their executor
      // un-combined. Ratios floor-scaled per §7.5.
      Tables.documents(s, d)
        .select(col("doc_id"), explode(toks).as("token"))
        .groupBy("doc_id", "token")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id")
        .agg(sum("cnt").as("n_tokens"),
             count(lit(1)).as("n_distinct"),
             max("cnt").as("top_cnt"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          floor(col("n_distinct").cast("double") / col("n_tokens") * 1000000)
            .cast("long").as("distinct_ratio_u"),
          floor(col("top_cnt").cast("double") / col("n_tokens") * 1000000)
            .cast("long").as("top_token_ratio_u"))
        .orderBy("doc_id")
    },
    "q_simhash16" -> { (s, d) =>
      simhash16(Tables.documents(s, d)).orderBy("doc_id")
    },
    "q_quality_filter" -> { (s, d) =>
      // The filter cascade every corpus pass runs: cheap signals → keep
      // or the FIRST failing rule (rule order is part of the contract —
      // downstream attrition dashboards group by reason). Map-only.
      val nTok = size(split(col("text"), " "))
      val uniq = size(array_distinct(split(col("text"), " ")))
      Tables.documents(s, d)
        .select(col("doc_id"), nTok.as("n_tokens"), uniq.as("n_distinct"),
          length(col("text")).as("n_chars"))
        .withColumn("verdict",
          when(col("n_chars") < 10, "too_short")
          .when(col("n_tokens") > lit(4) && // ratio rule needs support
            col("n_distinct") * 4 < col("n_tokens"), "repetitive")
          .when(col("n_chars") > col("n_tokens") * 30, "tokens_too_long")
          .otherwise("keep"))
        .orderBy("doc_id")
    },
    "q_quality_classifier" -> { (s, d) =>
      // The LEARNED member of the filter family: fastText-style hashed
      // n-gram logistic regression (operators/QualityClassifier) trained
      // on the planted corruption task, scoring the hash-held-out 20%.
      // Fixed-point gradient aggregation makes the trained weights — and
      // therefore every score — bit-deterministic under any partitioning.
      val all = qualityLabeled(Tables.documents(s, d))
      val isTest = pmod(xxhash64(lit(3), col("orig")), lit(5)) === 0
      val buckets = 4096
      val trainFeats =
        QualityClassifier.featurizePacked(all.filter(!isTest), buckets).cache()
      val model =
        try QualityClassifier.trainPacked(trainFeats, buckets,
          iters = 6, lr = 4.0)
        finally trainFeats.unpersist()
      // scoring is the in-row kernel: map-only, no featurize, no shuffle
      // (bit-equal to the join path — QualityClassifierSpec)
      QualityClassifier.scoreKernel(all.filter(isTest), model)
        .orderBy("doc_id")
    },
    "q_simhash_pairs" -> { (s, d) =>
      // SimHash near-dup terminal: pairs within hamming distance ≤ 3 of
      // the 16-bit fingerprint — bit_count(xor) is a built-in on both
      // engines, no custom expression needed. All-pairs here (fingerprints
      // are 1 long/doc); the banded-LSH shape (q_minhash_neardup) is the
      // scale path when even the fingerprint self-join is too wide.
      // barrier: the nested-loop join's broadcast side cannot reuse the
      // stream side's plan — without this the simhash aggregation runs
      // once per side
      val sh = simhash16(Tables.documents(s, d)).repartition(col("doc_id"))
      val a = sh.select(col("doc_id").as("id_a"), col("simhash16").as("sh_a"))
      val b = sh.select(col("doc_id").as("id_b"), col("simhash16").as("sh_b"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          expr("bit_count(sh_a ^ sh_b)").as("hamming"))
        .filter(col("hamming") <= 3)
        .orderBy("id_a", "id_b")
    },
    "q_simhash_banded" -> { (s, d) =>
      // q_simhash_pairs without the all-pairs (see simhashBanded):
      // 16-bit fingerprint × 4-bit bands — output = q_simhash_pairs
      // row-for-row (PlanSpec pins the no-cartesian plan shape).
      simhashBanded(Tables.documents(s, d), bits = 16, bandBits = 4,
        outCol = "simhash16")
    },
    "q_simhash_banded32" -> { (s, d) =>
      // The banded contract at a width where banding actually WINS: the
      // 16-bit demo's 4-bit buckets are vote-bias-skewed (hottest bucket
      // holds ~40% of the corpus ⇒ 8.5M candidate pairs at sf0.1 —
      // slower than all-pairs). 8-bit bands split 256 ways: candidates
      // drop ~40×, and the same pigeonhole keeps it exact. This is the
      // production shape; only the fingerprint width separates it from
      // the 64-bit scale path.
      simhashBanded(Tables.documents(s, d), bits = 32, bandBits = 8,
        outCol = "simhash32")
    },
    "q_tfidf" -> { (s, d) =>
      // Top-3 characteristic terms per doc by tf·idf with a RATIONAL idf
      // ((N+1)/(df+1), no log): +,*,/ are IEEE correctly-rounded, so the
      // score is bit-identical across engines — ln() is library-dependent
      // and could flip ranks at the ulp. Two partial-agg shuffles (term
      // frequency, document frequency). The df scoring join rides the
      // Zipf head-split (r14): a full vocab broadcast is the same
      // 100 TB hazard calibJoin routes around (web vocab ≈ 10⁸ tokens),
      // and a plain token-keyed SHJ would hand "the"'s df(t) ≈ n_docs
      // rows to one partition — top-4096 head broadcast, tail SHJ.
      // tf checkpointed: the df aggregation AND the join's big side
      // both read the doc-term frame.
      val docs = Tables.documents(s, d)
      val tf = docs.select(col("doc_id"), explode(toks).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
        .localCheckpoint()
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val score = (col("tf") * (col("n_docs") + 1)).cast("double") /
        (col("df") + 1)
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(score.desc, col("token").asc)
      val hot = dfreq.orderBy(col("df").desc, col("token")).limit(4096)
      graft.operators.Skew
        .headSplitJoin(tf, dfreq, Seq("token"), col("doc_id"), hot,
          requireMatch = true)
        .crossJoin(broadcast(nDocs))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("token"),
          floor(score * 1000000).cast("long").as("tfidf_u"))
        .orderBy("doc_id", "rnk")
    },
    "q_chunk_windows" -> { (s, d) =>
      // Context-length chunking: overlapping token windows (64 tokens,
      // stride 48) per document — how corpora are cut for training.
      // Map-only (posexplode of a per-row transform); chunk text leaves
      // the operator fingerprinted, not verbatim. Token array bound once
      // via the outer single-element transform (no-CSE rule, see
      // bigrams); sequence(1, n, 48) is ascending for every n >= 1 and
      // size(split(...)) >= 1 even for empty text, so short docs emit
      // exactly one (possibly partial) chunk.
      val chunks = expr(
        """element_at(transform(array(split(text, ' ')), tk ->
          |  transform(sequence(1, size(tk), 48),
          |    st -> concat_ws(' ', slice(tk, int(st), 64)))), 1)""".stripMargin)
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(chunks))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("chunk_id"),
          size(split(col("col"), " ")).as("n_chunk_tokens"),
          md5(col("col")).as("chunk_fp"))
        .orderBy("doc_id", "chunk_id")
    },
    "q_chunk_pack" -> { (s, d) =>
      // Composition of the two sequence-prep stages: context chunking
      // (q_chunk_windows) feeding sharded greedy packing
      // (q_pack_sequences) — the actual "prepare training sequences"
      // pipeline, end-to-end in one plan: map-only generate, then ONE
      // shuffle for the per-shard packing window.
      val chunks = expr(
        """element_at(transform(array(split(text, ' ')), tk ->
          |  transform(sequence(1, size(tk), 48),
          |    st -> concat_ws(' ', slice(tk, int(st), 64)))), 1)""".stripMargin)
      val shard = pmod(col("doc_id"), lit(packShards))
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("doc_id"), col("chunk_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(chunks))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("chunk_id"),
          size(split(col("col"), " ")).as("n_chunk_tokens"))
        .withColumn("shard", shard)
        .withColumn("cum_tokens", sum(col("n_chunk_tokens")).over(w))
        .withColumn("pack_id",
          floor((col("cum_tokens") - col("n_chunk_tokens")) / lit(2048.0))
            .cast("long"))
        .orderBy("doc_id", "chunk_id")
    },
    "q_sample_weighted" -> { (s, d) =>
      // Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
      // 2006, "Weighted random sampling with a reservoir", IPL 97(5)):
      // minimize key_i = −ln(u_i)/w_i — the top-k by key IS an exact
      // without-replacement sample with inclusion odds ∝ weight. u_i
      // is a deterministic hash of doc_id (the first 52 md5 bits →
      // (0,1], the engine-neutral q_mix_sample hash), so there is no
      // RNG state anywhere: the sample is a pure function of (corpus,
      // seed), reproducible across runs and partitionings. ORACLED
      // (r15): the rank key is quantized to integer micro-nats —
      // floor((1e6·−ln(u))/w), the q_unigram_logprob ln discipline:
      // (h+1)·2⁻⁵² is EXACT in double, both engines evaluate ONE ln +
      // one multiply + one divide in identical operand order, and the
      // 1e-6 grid plus the doc_id tiebreak makes the top-200 cut
      // identical — ulp drift would need to straddle a grid boundary
      // AND decide slot 200. Map-only + distributed
      // TakeOrderedAndProject — per-partition heaps, no corpus
      // shuffle; weight = token count (the longer-docs-proportionally-
      // likelier subsample shape). PipelineSpec still pins the sample
      // bit-for-bit against a local reference and the zero/dominant
      // weight laws.
      val h = conv(substring(md5(col("doc_id").cast("string")), 1, 13),
        16, 10).cast("long")
      val u = (h + 1).cast("double") * lit(2.220446049250313e-16) // 2^-52
      val w = size(split(col("text"), " ")).cast("double")
      Tables.documents(s, d)
        // zero/NULL weight is EXCLUDED by definition, not sorted: a
        // NULL text makes size() return -1, and a negative weight
        // would flip the key sign and win every sample slot
        .filter(col("text").isNotNull && w > 0)
        .select(col("doc_id"), col("source"),
          floor((lit(1e6) * -log(u)) / w).cast("long").as("key_u"))
        .orderBy(col("key_u").asc, col("doc_id").asc)
        .limit(200)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    },
    "q_sample_stratified" -> { (s, d) =>
      // Exact fixed-quota stratified sampling: precisely 100 docs per
      // source (the "equal representation" corpus-assembly step, vs
      // q_mix_sample's rate-based thinning), chosen by a content-
      // independent md5 rank — no RNG, identical across engines and
      // partitionings. The window partitions by the stratum so the
      // rank distributes by source, and Catalyst's WindowGroupLimit
      // prunes each partition to the quota before the final exchange
      // (the q_win_topk_per_group plan shape) — at 100 TB the quota
      // rows, not the corpus, reach the presentation sort.
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 100)
        .select("source", "rnk", "doc_id")
        .orderBy("source", "rnk")
    },
    "q_mix_sample" -> { (s, d) =>
      // Deterministic weighted mixture sampling: per-source keep rates
      // (the data-mixing step of corpus assembly) decided by a content-
      // independent doc_id hash against a per-source threshold — integer
      // compare, no RNG, stable across runs/engines/partitionings.
      // Map-only; at 100 TB this is a free rider on any scan.
      val h = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
      val thresh = when(col("source") === "src0", 4294967296L)      // 1.0
        .when(col("source") === "src1", 2147483648L)                // 0.5
        .when(col("source") === "src2", 1073741824L)                // 0.25
        .otherwise(536870912L)                                      // 0.125
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), h.as("h32"), thresh.as("thresh"))
        .filter(col("h32") < col("thresh"))
        .select("doc_id", "source", "h32")
        .orderBy("doc_id")
    },
    "q_mix_token_budget" -> { (s, d) =>
      // Token-BUDGET domain mixing (the τ=0.5 temperature-reweighting
      // recipe of multilingual/multi-domain corpus assembly): each
      // source's allocation is budget·√T_s / Σ√T — square-root
      // temperature flattens the head domains — then docs fill the
      // allocation longest-first until the cumulative token count hits
      // it. Exact cross-engine arithmetic: IEEE sqrt is correctly
      // rounded (unlike pow), and for integer T the true sqrt sits
      // ≥ 1/(2√T+1) from any integer, so floor(sqrt) can never
      // straddle; allocations multiply in DECIMAL(38,0) (DuckDB:
      // HUGEINT) — budget·√T ≈ T^1.5/2 would wrap a BIGINT at ~7e12
      // total tokens, squarely inside the 100 TB design point.
      // Shape: two tiny aggregates broadcast back, ONE corpus shuffle
      // on source for the cumulative window, final per-source agg
      // reuses that partitioning.
      // checkpointed: the per-source totals AND the cumulative window
      // both read it — tokenize the corpus once
      val toksDf = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"),
          size(toks).cast("long").as("tok"))
        .localCheckpoint()
      val wt = toksDf.groupBy("source").agg(sum(col("tok")).as("t"))
        .withColumn("w", floor(sqrt(col("t").cast("double"))).cast("long"))
      // DIV, not "/": double division would lose bits past 2^53 token
      // corpora before the truncating cast
      val tb = wt.agg(expr("sum(t) DIV 2").as("budget"),
        sum(col("w")).as("wsum"))
      val alloc = wt.crossJoin(broadcast(tb))
        .select(col("source"),
          expr("CAST((CAST(budget AS DECIMAL(38,0)) * w) DIV wsum " +
            "AS BIGINT)").as("alloc"))
      val cum = toksDf.withColumn("ctok",
        sum(col("tok")).over(Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      cum.join(broadcast(alloc), "source")
        .filter(col("ctok") <= col("alloc"))
        .groupBy(col("source"), col("alloc"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tokens_used"))
        .orderBy("source")
    },
    "q_token_rarity" -> { (s, d) =>
      // Corpus-frequency doc scoring (the cheap stand-in for LM-based
      // quality filtering): mean corpus frequency of a doc's tokens.
      // Integer-exact until ONE final division — float sums would be
      // aggregation-order-dependent, so the numerator stays a BIGINT sum
      // of per-token corpus counts. The count join rides the Zipf
      // head-split (r14): the old full-vocab broadcast is the calibJoin
      // hazard at web scale, and the instance side is maximally skewed
      // ("the" = ~5% of all rows) — top-4096 head broadcast, tail SHJ,
      // head instances spread per-doc. cnts checkpointed: the total,
      // the head, the anti-filter and the cold side all read it.
      val docs = Tables.documents(s, d)
      val inst = docs.select(col("doc_id"), explode(toks).as("token"))
      val cnts = inst.groupBy("token").agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val total = cnts.agg(sum(col("cnt")).as("total"))
      val hot = cnts.orderBy(col("cnt").desc, col("token")).limit(4096)
      graft.operators.Skew
        .headSplitJoin(inst, cnts, Seq("token"), col("doc_id"), hot,
          requireMatch = true)
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum(col("cnt")).as("sum_cnt"),
          max(col("total")).as("total"))
        .select(col("doc_id"), col("n_tokens"),
          floor(col("sum_cnt").cast("double") * 1000000 /
            (col("n_tokens") * col("total"))).cast("long")
            .as("avg_tok_freq_u"))
        .orderBy("doc_id")
    },
    "q_source_cap" -> { (s, d) =>
      // Per-source document caps (the over-represented-domain guard of
      // web-corpus pipelines): keep the first 15 docs per source in
      // doc_id order. One shuffle on source; at scale the window is
      // per-source-partition and never global.
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 15)
        .orderBy("doc_id")
    },
    "q_pii_scrub" -> { (s, d) =>
      // PII scrubbing: count + redact email-shaped and long-digit tokens
      // (map-only; the scrubbed text is fingerprinted so the compare
      // carries 32 bytes/doc, not documents)
      val email = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
      val num = "[0-9]{3,}"
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(email), lit(0)))
            .as("n_emails"),
          size(regexp_extract_all(col("text"), lit(num), lit(0)))
            .as("n_longnums"),
          md5(regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
            num, "<NUM>")).as("fp_scrubbed"))
        .orderBy("doc_id")
    },
    "q_zorder_layout" -> { (s, d) =>
      // Z-order (Morton) clustering key for the two-dimensional
      // (user_id, day) access pattern: quantize each dim to 8 bits over
      // its observed range, interleave bits — the write-time layout key
      // that makes parquet min/max stats prune scans on EITHER dim
      // (operators.ZOrder; ZOrderSpec pins the file-pruning win and the
      // write path). The min/max frame is a 1-row broadcast, the rest is
      // map-only shifts/masks inside whole-stage codegen.
      import graft.operators.ZOrder
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day"))
      val b = ev.agg(min("user_id").as("minu"), max("user_id").as("maxu"),
        min("day").as("mind"), max("day").as("maxd"))
      ev.crossJoin(broadcast(b))
        .select(col("event_id"),
          ZOrder.quantize(col("user_id"), col("minu"), col("maxu")).as("xq"),
          ZOrder.quantize(col("day"), col("mind"), col("maxd")).as("yq"))
        .withColumn("zval", ZOrder.zvalue(col("xq"), col("yq")))
        .orderBy("zval", "event_id")
    },
    "q_zorder3_layout" -> { (s, d) =>
      // 3-D z-order curriculum key (user, day, hour-of-day): the
      // (source, quality, time) clustering shape of a training corpus —
      // a predicate on ANY of the three dims prunes files. Same
      // broadcast-frame + codegen'd shift/mask plan as the 2-D query,
      // with the part1by2 spread (ZOrder.zvalue3, 10 bits/dim).
      import graft.operators.ZOrder
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day"),
          expr("(unix_micros(cast(ts as timestamp)) div 3600000000) % 24")
            .as("hour"))
      val b = ev.agg(min("user_id").as("minu"), max("user_id").as("maxu"),
        min("day").as("mind"), max("day").as("maxd"))
      ev.crossJoin(broadcast(b))
        .select(col("event_id"),
          ZOrder.quantize(col("user_id"), col("minu"), col("maxu"), 10)
            .as("xq"),
          ZOrder.quantize(col("day"), col("mind"), col("maxd"), 10).as("yq"),
          ZOrder.quantize(col("hour"), lit(0L), lit(23L), 10).as("zq"))
        .withColumn("zval3",
          ZOrder.zvalue3(col("xq"), col("yq"), col("zq")))
        .orderBy("zval3", "event_id")
    },
    "q_hilbert_layout" -> { (s, d) =>
      // Hilbert-curve clustering key over the same (user_id, day)
      // space as q_zorder_layout — strictly better locality than
      // Morton (unit steps vs quadrant jumps; operators.Hilbert,
      // HilbertSpec pins the classic xy2d reference bit-for-bit and
      // the side-by-side pruning). The rotate/reflect recursion
      // unrolls to 8 projection rounds of integer built-ins, so the
      // SAME arithmetic runs as chained CTEs in the DuckDB oracle.
      import graft.operators.{Hilbert, ZOrder}
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day"))
      val b = ev.agg(min("user_id").as("minu"), max("user_id").as("maxu"),
        min("day").as("mind"), max("day").as("maxd"))
      Hilbert.withIndex(
        ev.crossJoin(broadcast(b))
          .select(col("event_id"),
            ZOrder.quantize(col("user_id"), col("minu"), col("maxu"))
              .as("xq"),
            ZOrder.quantize(col("day"), col("mind"), col("maxd"))
              .as("yq")),
        col("xq"), col("yq"), bits = 8)
        .orderBy("hval", "event_id")
    },
    "q_unigram_logprob" -> { (s, d) =>
      // CCNet-style statistical quality score: mean unigram surprisal
      // −ln p(token) under the corpus's OWN unigram model (p = tf/total).
      // Low surprisal ⇒ templated/repetitive text, high ⇒ rare-token
      // noise; the standard perplexity-band filter for training data,
      // here with the corpus itself as the language model — two
      // partial-aggregated passes (token tf, then per-doc mean via one
      // corpus-keyed join), the scalar total a 1-row broadcast.
      // Determinism: the mean is aggregated in FIXED POINT — each
      // token's surprisal is quantized to integer micro-nats
      // (floor(1e6·−ln p), identical operand order in both engines)
      // BEFORE summing, so the per-doc aggregate is an exact integer
      // sum + integer divide. A float avg would hinge on summation
      // order (partial aggregation vs DuckDB's single pass) whenever
      // the mean lands near a 1e-6 rounding boundary.
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
      // checkpointed: the total, the hot head, the anti-filter and the
      // cold side all read the vocab-sized frame
      val tf = toks.groupBy("token").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val tot = tf.agg(sum("tf").cast("double").as("total"))
      // Zipf-head-hardened scoring join (VERDICT r13 #3): top-4096
      // tokens broadcast, tail SHUFFLE_HASH — the hottest token's
      // instances spread by doc_id instead of landing on one partition
      val hot = tf.orderBy(col("tf").desc, col("token")).limit(4096)
      graft.operators.Skew
        .headSplitJoin(toks, tf, Seq("token"), col("doc_id"), hot,
          requireMatch = true)
        .crossJoin(broadcast(tot))
        .withColumn("nll_fp",
          floor(lit(1e6) * -log(col("tf").cast("double") / col("total")))
            .cast("long"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum(col("nll_fp")).as("sum_fp"))
        .select(col("doc_id"), col("n_tokens"),
          expr("sum_fp div n_tokens").as("avg_nll_micro"))
        .orderBy("doc_id")
    },
    "q_bigram_logprob" -> { (s, d) =>
      // The CCNet perplexity filter proper: per-doc mean CONDITIONAL
      // surprisal −ln P(w|prev) under the corpus's own bigram model with
      // add-one smoothing, P = (c(prev,w)+1)/(c(prev)+V). Unigram
      // surprisal (q_unigram_logprob) only sees token rarity; the bigram
      // model sees word ORDER, so shuffled/boilerplate text scores
      // differently from fluent text with the same vocabulary — the
      // filter CCNet actually runs (Wenzek 2020 uses a 5-gram KenLM; the
      // smoothing differs, the pipeline shape is identical). Plan shape:
      // bigram instances come from an in-row transform over the token
      // array (map-only — no self-join, no window shuffle to pair
      // neighbors); two partial-aggregated count passes (bigram,
      // context); scoring joins pin the vocabulary-scaled count side as
      // the SHUFFLE_HASH build; V is a 1-row broadcast. Determinism:
      // same fixed-point micro-nat contract as q_unigram_logprob —
      // all counts integer, one double divide + ln per DISTINCT bigram
      // evaluated with identical operand order in both engines, floor
      // to integer BEFORE the per-doc sum.
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          expr("filter(split(text, ' '), t -> t <> '')").as("ts"))
        .filter(size(col("ts")) >= 2)
      val big = docs.select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ts) - 1), " +
            "i -> struct(ts[i-1] AS prev, ts[i] AS cur))")).as("bg"))
        .select(col("doc_id"), col("bg.prev").as("prev"),
          col("bg.cur").as("cur"))
      // cb checkpointed: it is read three ways by the head-split join
      // (hot head, anti-filter, cold side) AND feeds cp — which
      // re-aggregates the vocab-sized cb instead of re-shuffling the
      // corpus (the q_collocations marginals trick): c(prev) = Σ_cur
      // c(prev,cur) exactly, one corpus shuffle total
      val cb = big.groupBy("prev", "cur").agg(count(lit(1)).as("cb"))
        .localCheckpoint()
      val cp = cb.groupBy("prev").agg(sum(col("cb")).as("cp"))
      val v = docs.select(explode(col("ts")).as("token"))
        .agg(countDistinct(col("token")).as("v"))
      // Zipf-head-hardened scoring joins (VERDICT r13 #3): head bigrams
      // and head contexts broadcast, tails SHUFFLE_HASH — neither the
      // hottest bigram nor the hottest context owns a partition
      val hotCb = cb.orderBy(col("cb").desc, col("prev"), col("cur"))
        .limit(4096)
      val hotCp = cp.orderBy(col("cp").desc, col("prev")).limit(4096)
      val scored = graft.operators.Skew.headSplitJoin(
        graft.operators.Skew.headSplitJoin(
          big, cb, Seq("prev", "cur"), col("doc_id"), hotCb,
          requireMatch = true),
        cp, Seq("prev"), col("doc_id"), hotCp, requireMatch = true)
      scored
        .crossJoin(broadcast(v))
        .withColumn("nll_fp",
          floor(lit(1e6) * -log((col("cb") + lit(1)).cast("double") /
            (col("cp") + col("v")).cast("double"))).cast("long"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_fp")).as("sum_fp"))
        .select(col("doc_id"), col("n_bigrams"),
          expr("sum_fp div n_bigrams").as("avg_nll_micro"))
        .orderBy("doc_id")
    },
    "q_span_dedup" -> { (s, d) =>
      // Span-level (substring) dedup: doc-level dedup misses the long
      // verbatim passages repeated ACROSS otherwise-distinct documents
      // (licenses, quoted articles, templates). Every 8-token span is
      // hashed; a span is a duplicate if the same hash occurs in an
      // earlier doc (corpus order = doc_id). Per doc: span count, spans
      // duplicating earlier text, and the removal ratio a span-dedup
      // pass would cut. Shuffle key is the 16-byte span hash — partial
      // aggregation on both passes, nothing corpus².
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          expr("filter(split(text, ' '), t -> t <> '')").as("ts"))
      val spans = toks
        .select(col("doc_id"), col("ts"), posexplode(col("ts")))
        .filter(col("pos") + 8 <= size(col("ts")))
        .select(col("doc_id"),
          md5(array_join(slice(col("ts"), col("pos") + 1, lit(8)), " "))
            .as("h"))
      // first-occurrence via whole-partition window min — the firsts
      // frame is corpus-sized (span hashes are mostly unique), so the
      // old groupBy+SHUFFLE_HASH join built a corpus-sized hash table;
      // the window is one spillable shuffle (see spanExcise)
      spans
        .withColumn("first_doc",
          min("doc_id").over(Window.partitionBy("h")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("first_doc") < col("doc_id"), 1L).otherwise(0L))
            .as("dup_spans"))
        .withColumn("dup_ratio",
          round(col("dup_spans").cast("double") / col("n_spans"), 6))
        .orderBy("doc_id")
    },
    "q_span_dedup_rolling" -> { (s, d) =>
      // q_span_dedup's statistics from O(tokens) rolling-hash span
      // fingerprints (TextFunctions.spanHashes — one rolling polynomial
      // pass) instead of the O(tokens×n) per-position md5 strings. Span
      // IDENTITY is all that reaches the output, so the SAME DuckDB
      // oracle certifies both paths: absent 64-bit collisions, every
      // exact-span method yields identical dedup counts. This is the
      // form the 100 TB pass runs.
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          expr("filter(split(text, ' '), t -> t <> '')").as("ts"))
      val spans = toks.select(col("doc_id"),
        explode(graft.functions.TextFunctions.spanHashes(col("ts"), 8))
          .as("h"))
      spans
        .withColumn("first_doc",
          min("doc_id").over(Window.partitionBy("h")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("first_doc") < col("doc_id"), 1L).otherwise(0L))
            .as("dup_spans"))
        .withColumn("dup_ratio",
          round(col("dup_spans").cast("double") / col("n_spans"), 6))
        .orderBy("doc_id")
    },
    "q_span_excise" -> { (s, d) =>
      // Maximal repeated-region EXCISION — the ExactSubstr dedup of Lee
      // et al. 2021 ("Deduplicating Training Data Makes Language Models
      // Better", arXiv:2107.06499 §4.1): cut every token run repeating
      // earlier text (global first occurrence wins), never drop whole
      // docs. Any repeat of length ≥ 8 is a union of overlapping
      // 8-token span repeats, so the rolling fingerprints already carry
      // the evidence; merging duplicate span STARTS within 8 positions
      // (gaps-and-islands over a per-doc window) reconstructs the
      // maximal regions exactly — no suffix array needed for a fixed
      // minimum match length. Shuffles: span hash (partial-agged), the
      // firsts join (SHUFFLE_HASH — span frames mis-promote under AQE),
      // and the per-doc window (doc-partitioned, never global).
      // key = doc_id * 1e6 + pos assumes < 1e6 tokens/doc — the
      // packShards-style documented bound.
      spanExcise(Tables.documents(s, d))
    },
    "q_corpus_shuffle" -> { (s, d) =>
      // Deterministic global training-order shuffle, sharded the way a
      // 100 TB corpus is laid out: hash each doc to one of 64 shards,
      // rank within the shard by the hash. The shard is the
      // write-partition unit, the within-shard rank the training
      // cursor; reruns reproduce the order bit-for-bit and no window
      // is ever global.
      val k = md5(concat(lit("shuf42:"), col("doc_id").cast("string")))
      val w = Window.partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), k.as("k"))
        .withColumn("shard",
          pmod(conv(substring(col("k"), 1, 4), 16, 10).cast("long"), lit(64)))
        .withColumn("pos", row_number().over(w))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    },
    "q_curriculum" -> { (s, d) =>
      // Curriculum training order (easy→hard): docs ascend through
      // per-source quality-percentile TIERS (the q_quality_normalize
      // CDF, quartiled — cross-source calibrated, so no source
      // monopolizes a tier), deterministically shuffled WITHIN each
      // tier, and sharded for the write layout — the q_corpus_shuffle
      // shape with a curriculum prefix on the sort key. Composes the
      // calibration pass with the training-order pass; one value-level
      // aggregation + one per-shard window, nothing global.
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          // quantized like the CDF side (identity here) — see
          // Quality.cdfBin's join contract
          Quality.cdfBin(col("n_chars")).as("n_chars"))
      val k = md5(concat(lit("curr42:"), col("doc_id").cast("string")))
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("tier"), col("k"), col("doc_id"))
      Quality.calibJoin(docs)
        .select(col("doc_id"),
          expr("least(below * 4 DIV greatest(n_src, 1), 3)").as("tier"),
          k.as("k"))
        .withColumn("shard",
          pmod(conv(substring(col("k"), 1, 4), 16, 10).cast("long"),
            lit(16)))
        .withColumn("pos", row_number().over(w))
        .select("doc_id", "tier", "shard", "pos")
        .orderBy("shard", "pos")
    },
    "q_collocations" -> { (s, d) =>
      // PMI collocation mining — the corpus-statistics pass behind
      // tokenizer-vocab curation and boilerplate phrase discovery:
      // pointwise mutual information ln(p(xy)/(p(x)p(y))) over adjacent
      // token pairs, support-filtered (c_xy ≥ 5), top-100. Shape: ONE
      // corpus-sized shuffle builds the bigram count table (the
      // sufficient statistic, localCheckpointed — it feeds the
      // marginals, the total AND the filter, and is only |vocab|²
      // rows); marginals re-aggregate it, the scoring joins are
      // vocab-sized SHUFFLE_HASH, N is a 1-row broadcast, top-100 is
      // TakeOrdered. Determinism: the q_bigram_logprob micro-nat
      // contract — counts exact BIGINTs, ONE double divide + ln per
      // surviving bigram with identical operand order in both engines,
      // floored to integer micro-nats before the rank.
      val big = Tables.documents(s, d)
        .select(expr("filter(split(text, ' '), t -> t <> '')").as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(explode(expr("transform(sequence(1, size(ts) - 1), " +
          "i -> struct(ts[i-1] AS prev, ts[i] AS cur))")).as("bg"))
        .select(col("bg.prev").as("prev"), col("bg.cur").as("cur"))
      val cb = big.groupBy("prev", "cur").agg(count(lit(1)).as("c_xy"))
        .localCheckpoint()
      val cx = cb.groupBy("prev").agg(sum(col("c_xy")).as("c_x"))
      val cy = cb.groupBy("cur").agg(sum(col("c_xy")).as("c_y"))
      val n = cb.agg(sum(col("c_xy")).as("n"))
      cb.filter(col("c_xy") >= 5)
        .join(cx.hint("shuffle_hash"), Seq("prev"))
        .join(cy.hint("shuffle_hash"), Seq("cur"))
        .crossJoin(broadcast(n))
        .select(col("prev"), col("cur"), col("c_xy"),
          floor(lit(1000000) * log(
            (col("c_xy").cast("double") * col("n").cast("double")) /
            (col("c_x").cast("double") * col("c_y").cast("double"))))
            .cast("long").as("pmi_u"))
        .orderBy(col("pmi_u").desc, col("prev"), col("cur"))
        .limit(100)
    },
    "q_vocab_growth" -> { (s, d) =>
      // Heaps-law vocabulary growth over 3-gram shingle types — the
      // curve that sizes shingle dictionaries, dedup fingerprint stores
      // and tokenizer vocabularies before a full-corpus pass commits
      // the memory: per corpus decile (doc_id order), shingle instances
      // seen, NEW shingle types first appearing there, and both
      // cumulatives. ONE corpus-sized shuffle builds (decile, gram)
      // counts (localCheckpointed — instance rollup AND first-decile
      // pass both read it, and it is |types|·10 rows at most);
      // everything downstream is type-sized, and the running sums
      // partition on the pmod constant key (bounded 10-row frame,
      // machine-checkably never SinglePartition — the
      // q_running_distinct discipline).
      val nd = Tables.documents(s, d)
        .agg((max(col("doc_id")) + 1).as("n_docs"))
      val grams = Tables.documents(s, d)
        .crossJoin(broadcast(nd))
        .select(expr("least(doc_id * 10 DIV n_docs, 9)").as("decile"),
          expr("filter(split(text, ' '), t -> t <> '')").as("ts"))
        .filter(size(col("ts")) >= 3)
        .select(col("decile"), explode(expr(
          "transform(sequence(1, size(ts) - 2), " +
            "i -> concat(ts[i-1], ' ', ts[i], ' ', ts[i+1]))")).as("g"))
      val gc = grams.groupBy("decile", "g").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val perDec = gc.groupBy("decile").agg(sum(col("c")).as("n_grams"))
      val newTypes = gc.groupBy("g").agg(min(col("decile")).as("decile"))
        .groupBy("decile").agg(count(lit(1)).as("new_types"))
      val cumW = Window.partitionBy(pmod(col("decile"), lit(1)))
        .orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perDec.join(newTypes, Seq("decile"), "left")
        .select(col("decile"), col("n_grams"),
          coalesce(col("new_types"), lit(0L)).as("new_types"))
        .select(col("decile"), col("n_grams"),
          sum(col("n_grams")).over(cumW).as("cum_grams"),
          col("new_types"),
          sum(col("new_types")).over(cumW).as("cum_types"))
        .orderBy("decile")
    },
    "q_dsir_sample" -> { (s, d) =>
      // DSIR-style importance resampling (Xie et al. 2023, "Data
      // Selection for Language Models via Importance Resampling"):
      // score every document by the unigram log-likelihood ratio
      // between a target domain (sources src0/src1 here) and the whole
      // corpus, add-1 smoothed, and keep the top-50 — the
      // domain-upweighting selection pass a pretraining pipeline runs
      // after dedup and before mixing (q_mix_token_budget allocates
      // BETWEEN domains; this selects WITHIN one). Shape: one
      // corpus-sized token shuffle builds per-token (corpus, target)
      // counts TOGETHER (single aggregation, localCheckpointed — the
      // totals and the scoring join both read the vocab-sized frame);
      // the per-token log-ratio joins back token-keyed with the
      // vocab-sized side SHUFFLE_HASH-pinned; top-50 is TakeOrdered.
      // Determinism: the micro-nat contract — one double expression
      // per DISTINCT token with identical operand order in both
      // engines, floored BEFORE the per-doc sum.
      dsirScores(Tables.documents(s, d),
          col("source").isin("src0", "src1"))
        .orderBy(col("score_u").desc, col("doc_id"))
        .limit(50)
    }
  )

  /** DSIR unigram log-likelihood-ratio score for EVERY document
    * against a target-domain predicate (add-1 smoothed, integer
    * micro-nats) — factored so the declared query and the CLI `select`
    * command share the kernel. Output: (doc_id, n_tokens, score_u). */
  private[graft] def dsirScores(docs: DataFrame,
      isTarget: Column): DataFrame = {
    val toks = docs
      .select(col("doc_id"), isTarget.as("is_target"),
        explode(expr("filter(split(text, ' '), t -> t <> '')"))
          .as("token"))
    val counts = toks.groupBy("token").agg(
        count(lit(1)).as("c_a"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("c_t"))
      .localCheckpoint()
    val tots = counts.agg(sum(col("c_a")).as("t_a"),
      sum(col("c_t")).as("t_t"), count(lit(1)).as("v"))
    // checkpointed (vocab-sized): the head-split join reads lr three
    // ways (hot head, anti-filter, cold side) — one totals crossJoin,
    // not three replicated nested-loop subtrees
    val lr = counts.crossJoin(broadcast(tots))
      .select(col("token"), col("c_a"),
        floor(lit(1000000) * log(
          ((col("c_t").cast("double") + 1) *
            (col("t_a").cast("double") + col("v").cast("double"))) /
          ((col("c_a").cast("double") + 1) *
            (col("t_t").cast("double") + col("v").cast("double")))))
          .cast("long").as("lr_u"))
      .localCheckpoint()
    // Zipf-head-hardened scoring join (VERDICT r13 #3): the corpus's
    // hottest tokens (top-4096 by frequency, deterministic tiebreak)
    // ride a broadcast; everything else shuffle-hash-joins the tail —
    // no token's partition ever holds the Zipf head's instance mass
    val hot = lr.orderBy(col("c_a").desc, col("token")).limit(4096)
    graft.operators.Skew.headSplitJoin(toks, lr.drop("c_a"),
        Seq("token"), col("doc_id"), hot.drop("c_a"), requireMatch = true)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr_u")).as("score_u"))
  }

  /** q_span_excise's core over any (doc_id, text) frame — factored so
    * the spec can run it against planted repeats. */
  private[graft] def spanExcise(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("ts"))
    val spans = toks
      .select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.spanHashes(col("ts"), 8)))
      .select(col("doc_id"), col("pos"),
        (col("doc_id") * 1000000 + col("pos")).as("key"),
        col("col").as("h"))
    // first-occurrence via a whole-partition window min, NOT a
    // groupBy+join: span hashes are mostly unique, so a "firsts" frame
    // is CORPUS-sized and a hash-join build of it cannot fit any
    // executor at scale (measured: 1M docs × ~100 spans kills an 8 GB
    // local heap; 100 TB kills anything). The window is one shuffle of
    // the span frame by h with a spillable sort — the q_span_dedup
    // join shape's scale-safe replacement.
    val firstW = Window.partitionBy("h")
    val dupStarts = spans
      .withColumn("first_key", min("key").over(firstW))
      .filter(col("key") > col("first_key"))
      .select(col("doc_id"), col("pos"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val prev = lag("pos", 1).over(w)
    dupStarts
      .withColumn("newi",
        when(prev.isNull || col("pos") - prev > 8, 1).otherwise(0))
      .withColumn("island", sum("newi").over(w))
      .groupBy("doc_id", "island")
      .agg(min("pos").as("s"), (max("pos") + 7).as("e"))
      .select(col("doc_id"), col("s").cast("long").as("start_pos"),
        col("e").cast("long").as("end_pos"),
        (col("e") - col("s") + 1).cast("long").as("n_tokens"))
      .orderBy("doc_id", "start_pos")
  }

  /** One oracle for BOTH span-dedup paths (md5 and rolling-hash): the
    * output depends only on span identity, never the hash. */
  private val spanDedupSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '),
      |                             t -> t <> '') AS ts
      |  FROM documents),
      |spans AS (
      |  SELECT doc_id, md5(array_to_string(ts[i:i+7], ' ')) AS h
      |  FROM toks, unnest(range(1, len(ts) - 6)) AS t(i)),
      |firsts AS (SELECT h, min(doc_id) AS first_doc FROM spans GROUP BY h)
      |SELECT doc_id, count(*) AS n_spans,
      |  CAST(sum(CASE WHEN first_doc < doc_id THEN 1 ELSE 0 END)
      |    AS BIGINT) AS dup_spans,
      |  round(CAST(sum(CASE WHEN first_doc < doc_id THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6) AS dup_ratio
      |FROM spans JOIN firsts USING (h)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Positional polynomial over the first `chars` hex nibbles of
    * `hexExpr` — the engine-neutral hex→int every shard/bucket/simhash
    * oracle uses (matches Spark's conv(substring(…), 16, 10) exactly);
    * ONE definition so a width or decoding fix reaches all of them. */
  private def hexPrefixSum(hexExpr: String, chars: Int): String =
    (1 to chars).map(i =>
      s"(strpos('0123456789abcdef', substring($hexExpr, $i, 1)) - 1) * " +
        s"${math.pow(16, chars - i).toLong}").mkString(" + ")

  /** DuckDB mirror of [[simhash16]]: token hash = first 4 md5 nibbles as
    * an int (strpos polynomial — matches the Spark conv() exactly). */
  private def simhashSql(bits: Int, outCol: String): String = {
    val nibbles = bits / 4
    val h = hexPrefixSum("md5(token)", nibbles)
    val votes = (0 until bits).map(b =>
      s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(", ")
    val fp = (0 until bits).map(b =>
      s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    s"""SELECT doc_id, CAST($fp AS BIGINT) AS $outCol FROM (
       |  SELECT doc_id, $votes
       |  FROM (SELECT doc_id, ($h) AS h FROM (
       |          SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |          FROM documents))
       |  GROUP BY doc_id)""".stripMargin
  }

  private val simhash16Sql: String = simhashSql(16, "simhash16")

  /** Banded-hamming SimHash near-dup: split a `bits`-wide fingerprint
    * into bands of `bandBits`; a pair within hamming ≤ bands−1 flips
    * fewer bits than there are bands, so by pigeonhole it agrees on ≥1
    * whole band (EXACT, unlike MinHash banding's probabilistic recall).
    * Candidates join on (band, band_bits) — the shuffle groups docs per
    * band bucket, never corpus². Verify BEFORE distinct: bit_count is a
    * single codegen'd instruction, so scoring raw band-join output
    * (map-side, no shuffle) and deduplicating only qualifying pairs
    * beats shuffling every multi-band candidate — the usual LSH order
    * (dedup, then verify) only pays off when the verify is expensive.
    * The repartition barrier stops the fingerprint aggregation (md5 per
    * token) running once per join side (a BroadcastExchange build side
    * cannot reuse the probe side's plan). */
  private def simhashBanded(docs: DataFrame, bits: Int, bandBits: Int,
      outCol: String): DataFrame = {
    val nBands = bits / bandBits
    val mask = (1 << bandBits) - 1
    // localCheckpoint, not a repartition barrier: the band self-join's
    // build side is a BroadcastExchange, which can never reuse the probe
    // side's shuffle — with plain lineage (or a repartition) the whole
    // fingerprint pass (md5 per token + vote aggregation over the corpus)
    // ran once PER SIDE (observed in the r6 plan: two full scan→agg
    // subtrees). Checkpointing the per-doc fingerprint frame (2 longs/doc
    // — corpus-count rows, not corpus bytes) computes it once and both
    // sides read the materialized blocks.
    val sh = simhashN(docs, bits, outCol).localCheckpoint()
    val bands = sh.select(col("doc_id"), col(outCol),
        posexplode(expr(
          s"""transform(sequence(0, ${nBands - 1}),
             |  b -> shiftright($outCol, int(b) * $bandBits) & $mask)"""
            .stripMargin)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_bits"))
    bands.select(col("band"), col("band_bits"),
        col("doc_id").as("id_a"), col(outCol).as("sh_a"))
      .join(bands.select(col("band"), col("band_bits"),
        col("doc_id").as("id_b"), col(outCol).as("sh_b")),
        Seq("band", "band_bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(sh_a ^ sh_b)").as("hamming"))
      .filter(col("hamming") <= nBands - 1)
      .distinct()
      .orderBy("id_a", "id_b")
  }

  /** DuckDB oracle for [[simhashBanded]], same parameterization. */
  private def bandedSql(bits: Int, bandBits: Int, outCol: String): String = {
    val nBands = bits / bandBits
    val mask = (1 << bandBits) - 1
    s"""WITH sh AS (${simhashSql(bits, outCol)}),
       |bands AS (
       |  SELECT doc_id, $outCol, band,
       |         (($outCol >> (band * $bandBits)) & $mask) AS band_bits
       |  FROM sh, (SELECT unnest(generate_series(0, ${nBands - 1})) AS band))
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  bit_count(xor(a.$outCol, b.$outCol)) AS hamming
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.band_bits = b.band_bits
       | AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.$outCol, b.$outCol)) <= ${nBands - 1}
       |ORDER BY id_a, id_b""".stripMargin
  }


  /** q_hilbert_layout oracle: base quantization + 8 chained CTE rounds
    * of the classic xy2d rotate/reflect recursion (s = 128..1, n=256),
    * each round reading only the previous round's columns — the exact
    * arithmetic of [[graft.operators.Hilbert.withIndex]]. */
  private def hilbertOracleSql: String = {
    val base = """WITH b AS (
      |  SELECT min(user_id) AS minu, max(user_id) AS maxu,
      |         min(epoch_us(ts) // 86400000000) AS mind,
      |         max(epoch_us(ts) // 86400000000) AS maxd
      |  FROM events),
      |r0 AS (
      |  SELECT event_id,
      |    CAST(floor((user_id - minu) * 255.0
      |      / greatest(maxu - minu, 1)) AS BIGINT) AS xq,
      |    CAST(floor(((epoch_us(ts) // 86400000000) - mind) * 255.0
      |      / greatest(maxd - mind, 1)) AS BIGINT) AS yq,
      |    CAST(floor((user_id - minu) * 255.0
      |      / greatest(maxu - minu, 1)) AS BIGINT) AS x,
      |    CAST(floor(((epoch_us(ts) // 86400000000) - mind) * 255.0
      |      / greatest(maxd - mind, 1)) AS BIGINT) AS y,
      |    CAST(0 AS BIGINT) AS d
      |  FROM events, b)""".stripMargin
    val rounds = (0 until 8).map { i =>
      val sv = 128L >> i
      s"""r${i + 1} AS (SELECT event_id, xq, yq,
         |  CASE WHEN (y & $sv) > 0 THEN x
         |       WHEN (x & $sv) > 0 THEN 255 - y ELSE y END AS x,
         |  CASE WHEN (y & $sv) > 0 THEN y
         |       WHEN (x & $sv) > 0 THEN 255 - x ELSE x END AS y,
         |  d + ${sv * sv} * xor(
         |    3 * (CASE WHEN (x & $sv) > 0 THEN 1 ELSE 0 END),
         |    CASE WHEN (y & $sv) > 0 THEN 1 ELSE 0 END) AS d
         |  FROM r$i)""".stripMargin
    }.mkString(",\n", ",\n", "")
    base + rounds +
      "\nSELECT event_id, xq, yq, d AS hval FROM r8 ORDER BY hval, event_id"
  }

  def oracle: Map[String, String] = Map(
    "q_split_hash" -> {
      // hex → int without engine-specific casts: positional polynomial
      // over the first 8 md5 nibbles (16^7 … 16^0)
      val h = hexPrefixSum("md5(text)", 8)
      s"""SELECT doc_id, bucket,
         |  CASE WHEN bucket < 900 THEN 'train'
         |       WHEN bucket < 950 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id, ($h) % 1000 AS bucket FROM documents)
         |ORDER BY doc_id""".stripMargin
    },
    "q_pack_sequences" ->
      s"""SELECT doc_id, shard, n_tokens, cum_tokens,
        |  CAST(floor((cum_tokens - n_tokens) / 2048.0) AS BIGINT) AS pack_id
        |FROM (
        |  SELECT doc_id, doc_id % $packShards AS shard,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    CAST(sum(len(string_split(text, ' '))) OVER (
        |      PARTITION BY doc_id % $packShards ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_tokens
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_contamination" ->
      """WITH bg AS (
        |  SELECT doc_id, unnest(list_transform(
        |    range(1, greatest(len(string_split(text, ' ')), 1)),
        |    i -> string_split(text, ' ')[i] || ' ' ||
        |         string_split(text, ' ')[i + 1])) AS bigram
        |  FROM documents),
        |bench AS (SELECT DISTINCT bigram FROM bg WHERE doc_id < 20),
        |corpus AS (SELECT DISTINCT doc_id, bigram FROM bg WHERE doc_id >= 20)
        |SELECT doc_id, count(*) AS n_shared_bigrams
        |FROM corpus JOIN bench USING (bigram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_repetition" ->
      """SELECT doc_id, n_tokens, n_distinct,
        |  CAST(floor(CAST(n_distinct AS DOUBLE) / n_tokens * 1000000)
        |    AS BIGINT) AS distinct_ratio_u,
        |  CAST(floor(CAST(top_cnt AS DOUBLE) / n_tokens * 1000000)
        |    AS BIGINT) AS top_token_ratio_u
        |FROM (
        |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |         count(*) AS n_distinct,
        |         max(cnt) AS top_cnt
        |  FROM (SELECT doc_id, token, count(*) AS cnt
        |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |              FROM documents)
        |        GROUP BY doc_id, token)
        |  GROUP BY doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_simhash16" -> s"""$simhash16Sql
         |ORDER BY doc_id""".stripMargin,
    "q_simhash_pairs" ->
      s"""WITH sh AS ($simhash16Sql)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  bit_count(xor(a.simhash16, b.simhash16)) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash16, b.simhash16)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    "q_simhash_banded" -> bandedSql(16, 4, "simhash16"),
    "q_simhash_banded32" -> bandedSql(32, 8, "simhash32"),
    "q_quality_filter" ->
      """SELECT doc_id, n_tokens, n_distinct, n_chars,
        |  CASE WHEN n_chars < 10 THEN 'too_short'
        |       WHEN n_tokens > 4 AND n_distinct * 4 < n_tokens
        |         THEN 'repetitive'
        |       WHEN n_chars > n_tokens * 30 THEN 'tokens_too_long'
        |       ELSE 'keep' END AS verdict
        |FROM (SELECT doc_id,
        |        len(string_split(text, ' ')) AS n_tokens,
        |        len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |        length(text) AS n_chars
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  GROUP BY doc_id, token),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, rnk, token, tfidf_u FROM (
        |  SELECT doc_id, token,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY CAST(tf * (n_docs + 1) AS DOUBLE) / (df + 1) DESC,
        |               token ASC) AS rnk,
        |    CAST(floor(CAST(tf * (n_docs + 1) AS DOUBLE) / (df + 1)
        |      * 1000000) AS BIGINT) AS tfidf_u
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n)
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "q_chunk_windows" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
        |           FROM documents),
        |c AS (SELECT doc_id, tk,
        |        unnest(range(1, len(tk) + 1, 48)) AS st
        |      FROM t)
        |SELECT doc_id, CAST((st - 1) // 48 + 1 AS BIGINT) AS chunk_id,
        |  len(list_slice(tk, st, st + 63)) AS n_chunk_tokens,
        |  md5(array_to_string(list_slice(tk, st, st + 63), ' ')) AS chunk_fp
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q_chunk_pack" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
        |           FROM documents),
        |c AS (SELECT doc_id, tk,
        |        unnest(range(1, len(tk) + 1, 48)) AS st
        |      FROM t),
        |ch AS (SELECT doc_id,
        |         CAST((st - 1) // 48 + 1 AS BIGINT) AS chunk_id,
        |         len(list_slice(tk, st, st + 63)) AS n_chunk_tokens
        |       FROM c)
        |SELECT doc_id, chunk_id, n_chunk_tokens, doc_id % $packShards AS shard,
        |  CAST(sum(n_chunk_tokens) OVER (
        |    PARTITION BY doc_id % $packShards ORDER BY doc_id, chunk_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tokens,
        |  CAST(floor((CAST(sum(n_chunk_tokens) OVER (
        |    PARTITION BY doc_id % $packShards ORDER BY doc_id, chunk_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    - n_chunk_tokens) / 2048.0) AS BIGINT) AS pack_id
        |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,
    "q_sample_weighted" -> {
      val h = hexPrefixSum("md5(CAST(doc_id AS VARCHAR))", 13)
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source, key_u FROM (
         |    SELECT doc_id, source,
         |      CAST(floor((1000000.0 * -ln((($h) + 1)
         |        * 2.220446049250313e-16))
         |        / CAST(len(string_split(text, ' ')) AS DOUBLE))
         |        AS BIGINT) AS key_u
         |    FROM documents
         |    WHERE text IS NOT NULL
         |      AND len(string_split(text, ' ')) > 0)
         |  ORDER BY key_u, doc_id LIMIT 200)
         |ORDER BY doc_id""".stripMargin
    },
    "q_sample_stratified" ->
      """SELECT source, rnk, doc_id FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
        |  FROM documents)
        |WHERE rnk <= 100
        |ORDER BY source, rnk""".stripMargin,
    "q_mix_sample" -> {
      val h = hexPrefixSum("md5(CAST(doc_id AS VARCHAR))", 8)
      s"""SELECT doc_id, source, h32 FROM (
         |  SELECT doc_id, source, ($h) AS h32,
         |    CASE WHEN source = 'src0' THEN 4294967296
         |         WHEN source = 'src1' THEN 2147483648
         |         WHEN source = 'src2' THEN 1073741824
         |         ELSE 536870912 END AS thresh
         |  FROM documents)
         |WHERE h32 < thresh ORDER BY doc_id""".stripMargin
    },
    "q_mix_token_budget" ->
      """WITH toks AS (
        |  SELECT doc_id, source, n_chars,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |  FROM documents),
        |tot AS (SELECT source, CAST(sum(tok) AS BIGINT) AS t
        |        FROM toks GROUP BY 1),
        |wt AS (SELECT source, t,
        |       CAST(floor(sqrt(CAST(t AS DOUBLE))) AS BIGINT) AS w
        |       FROM tot),
        |tb AS (SELECT CAST(sum(t) // 2 AS BIGINT) AS budget,
        |              CAST(sum(w) AS BIGINT) AS wsum FROM wt),
        |alloc AS (
        |  SELECT wt.source,
        |         CAST((CAST(tb.budget AS HUGEINT) * wt.w) // tb.wsum
        |              AS BIGINT) AS alloc
        |  FROM wt CROSS JOIN tb),
        |cum AS (
        |  SELECT t.doc_id, t.source, t.tok,
        |         sum(t.tok) OVER (PARTITION BY t.source
        |            ORDER BY t.n_chars DESC, t.doc_id
        |            ROWS UNBOUNDED PRECEDING) AS ctok
        |  FROM toks t)
        |SELECT c.source, a.alloc, count(*) AS n_docs,
        |       CAST(sum(c.tok) AS BIGINT) AS tokens_used
        |FROM cum c JOIN alloc a ON c.source = a.source
        |WHERE c.ctok <= a.alloc
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "q_token_rarity" ->
      """WITH inst AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |cnts AS (SELECT token, count(*) AS cnt FROM inst GROUP BY token),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM cnts)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(floor(CAST(sum(cnt) AS DOUBLE) * 1000000
        |    / (count(*) * max(total))) AS BIGINT) AS avg_tok_freq_u
        |FROM inst JOIN cnts USING (token) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_source_cap" ->
      """SELECT doc_id, source, rn FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 15 ORDER BY doc_id""".stripMargin,
    "q_pii_scrub" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[a-z0-9]+@[a-z0-9]+\.[a-z]+'))
        |    AS n_emails,
        |  len(regexp_extract_all(text, '[0-9]{3,}')) AS n_longnums,
        |  md5(regexp_replace(
        |    regexp_replace(text, '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g'),
        |    '[0-9]{3,}', '<NUM>', 'g')) AS fp_scrubbed
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_zorder_layout" ->
      // magic-number Morton spread, nibble-identical to ZOrder.spread16:
      // masks 0x00FF00FF / 0x0F0F0F0F / 0x33333333 / 0x55555555
      """WITH b AS (
        |  SELECT min(user_id) AS minu, max(user_id) AS maxu,
        |         min(epoch_us(ts) // 86400000000) AS mind,
        |         max(epoch_us(ts) // 86400000000) AS maxd
        |  FROM events),
        |q AS (
        |  SELECT event_id,
        |    CAST(floor((user_id - minu) * 255.0
        |      / greatest(maxu - minu, 1)) AS BIGINT) AS xq,
        |    CAST(floor(((epoch_us(ts) // 86400000000) - mind) * 255.0
        |      / greatest(maxd - mind, 1)) AS BIGINT) AS yq
        |  FROM events, b),
        |s1 AS (SELECT event_id, xq, yq,
        |  ((xq | (xq << 8)) & 16711935) AS x1,
        |  ((yq | (yq << 8)) & 16711935) AS y1 FROM q),
        |s2 AS (SELECT event_id, xq, yq,
        |  ((x1 | (x1 << 4)) & 252645135) AS x2,
        |  ((y1 | (y1 << 4)) & 252645135) AS y2 FROM s1),
        |s3 AS (SELECT event_id, xq, yq,
        |  ((x2 | (x2 << 2)) & 858993459) AS x3,
        |  ((y2 | (y2 << 2)) & 858993459) AS y3 FROM s2),
        |s4 AS (SELECT event_id, xq, yq,
        |  ((x3 | (x3 << 1)) & 1431655765) AS x4,
        |  ((y3 | (y3 << 1)) & 1431655765) AS y4 FROM s3)
        |SELECT event_id, xq, yq, (x4 | (y4 << 1)) AS zval
        |FROM s4 ORDER BY zval, event_id""".stripMargin,
    "q_zorder3_layout" ->
      // part1by2 Morton spread, nibble-identical to ZOrder.spread10:
      // masks 0xFF0000FF / 0x0F00F00F / 0xC30C30C3 / 0x49249249
      """WITH b AS (
        |  SELECT min(user_id) AS minu, max(user_id) AS maxu,
        |         min(epoch_us(ts) // 86400000000) AS mind,
        |         max(epoch_us(ts) // 86400000000) AS maxd
        |  FROM events),
        |q AS (
        |  SELECT event_id,
        |    CAST(floor((user_id - minu) * 1023.0
        |      / greatest(maxu - minu, 1)) AS BIGINT) AS xq,
        |    CAST(floor(((epoch_us(ts) // 86400000000) - mind) * 1023.0
        |      / greatest(maxd - mind, 1)) AS BIGINT) AS yq,
        |    CAST(floor(((epoch_us(ts) // 3600000000) % 24) * 1023.0 / 23)
        |      AS BIGINT) AS zq
        |  FROM events, b),
        |s1 AS (SELECT event_id, xq, yq, zq,
        |  (((xq & 1023) | ((xq & 1023) << 16)) & 4278190335) AS x1,
        |  (((yq & 1023) | ((yq & 1023) << 16)) & 4278190335) AS y1,
        |  (((zq & 1023) | ((zq & 1023) << 16)) & 4278190335) AS z1 FROM q),
        |s2 AS (SELECT event_id, xq, yq, zq,
        |  ((x1 | (x1 << 8)) & 251719695) AS x2,
        |  ((y1 | (y1 << 8)) & 251719695) AS y2,
        |  ((z1 | (z1 << 8)) & 251719695) AS z2 FROM s1),
        |s3 AS (SELECT event_id, xq, yq, zq,
        |  ((x2 | (x2 << 4)) & 3272356035) AS x3,
        |  ((y2 | (y2 << 4)) & 3272356035) AS y3,
        |  ((z2 | (z2 << 4)) & 3272356035) AS z3 FROM s2),
        |s4 AS (SELECT event_id, xq, yq, zq,
        |  ((x3 | (x3 << 2)) & 1227133513) AS x4,
        |  ((y3 | (y3 << 2)) & 1227133513) AS y4,
        |  ((z3 | (z3 << 2)) & 1227133513) AS z4 FROM s3)
        |SELECT event_id, xq, yq, zq,
        |  (x4 | (y4 << 1) | (z4 << 2)) AS zval3
        |FROM s4 ORDER BY zval3, event_id""".stripMargin,
    // the same 8 rotate/reflect rounds the Spark side unrolls as
    // projections, generated as chained CTEs (engine-exact integers)
    "q_hilbert_layout" -> hilbertOracleSql,
    "q_unigram_logprob" ->
      """WITH inst AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |inst2 AS (SELECT doc_id, token FROM inst WHERE token <> ''),
        |tf AS (SELECT token, count(*) AS tf FROM inst2 GROUP BY token),
        |tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS total FROM tf),
        |per AS (SELECT doc_id,
        |  CAST(floor(1e6 * -ln(CAST(tf AS DOUBLE) / total)) AS BIGINT)
        |    AS nll_fp
        |  FROM inst2 JOIN tf USING (token) CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(nll_fp) AS BIGINT) // count(*) AS avg_nll_micro
        |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_bigram_logprob" ->
      // Parallel unnests at the same SELECT level zip positionally in
      // DuckDB (Postgres semantics), so the two shifted list slices pair
      // adjacent tokens exactly like the Spark-side in-row transform.
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |  FROM documents),
        |d2 AS (SELECT doc_id, ts FROM d WHERE len(ts) >= 2),
        |big AS (
        |  SELECT doc_id,
        |    unnest(ts[1:len(ts)-1]) AS prev,
        |    unnest(ts[2:len(ts)]) AS cur
        |  FROM d2),
        |cb AS (SELECT prev, cur, count(*) AS cb FROM big GROUP BY prev, cur),
        |cp AS (SELECT prev, count(*) AS cp FROM big GROUP BY prev),
        |v AS (SELECT count(DISTINCT token) AS v FROM
        |        (SELECT unnest(ts) AS token FROM d2)),
        |per AS (
        |  SELECT doc_id,
        |    CAST(floor(1e6 * -ln(CAST(cb + 1 AS DOUBLE) /
        |      CAST(cp + v AS DOUBLE))) AS BIGINT) AS nll_fp
        |  FROM big JOIN cb USING (prev, cur) JOIN cp USING (prev)
        |       CROSS JOIN v)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(nll_fp) AS BIGINT) // count(*) AS avg_nll_micro
        |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_span_dedup" -> spanDedupSql,
    // span identity is all that reaches the output (the spanDedupSql
    // argument), so the md5 oracle certifies the rolling-hash engine path
    "q_span_excise" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '),
        |                             t -> t <> '') AS ts
        |  FROM documents),
        |spans AS (
        |  SELECT doc_id, i - 1 AS pos,
        |         doc_id * 1000000 + (i - 1) AS key,
        |         md5(array_to_string(ts[i:i+7], ' ')) AS h
        |  FROM toks, unnest(range(1, len(ts) - 6)) AS t(i)),
        |firsts AS (SELECT h, min(key) AS first_key FROM spans GROUP BY h),
        |dups AS (
        |  SELECT doc_id, pos FROM spans JOIN firsts USING (h)
        |  WHERE key > first_key),
        |flags AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
        |           IS NULL
        |         OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
        |           > 8
        |    THEN 1 ELSE 0 END AS newi
        |  FROM dups),
        |isl AS (
        |  SELECT doc_id, pos, sum(newi) OVER (PARTITION BY doc_id
        |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS island
        |  FROM flags)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_pos,
        |  CAST(max(pos) + 7 AS BIGINT) AS end_pos,
        |  CAST(max(pos) + 7 - min(pos) + 1 AS BIGINT) AS n_tokens
        |FROM isl GROUP BY doc_id, island
        |ORDER BY doc_id, start_pos""".stripMargin,
    // identical statistics contract — the rolling-hash path must agree
    // with the md5 path span for span, so one oracle certifies both
    "q_span_dedup_rolling" -> spanDedupSql,
    "q_corpus_shuffle" -> {
      val h4 = hexPrefixSum("k", 4)
      s"""WITH h AS (
         |  SELECT doc_id,
         |         md5(concat('shuf42:', CAST(doc_id AS VARCHAR))) AS k
         |  FROM documents),
         |s AS (SELECT doc_id, k, ($h4) % 64 AS shard FROM h)
         |SELECT doc_id, shard,
         |  row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) AS pos
         |FROM s ORDER BY shard, pos""".stripMargin
    },
    "q_curriculum" -> {
      val h4 = hexPrefixSum("k", 4)
      s"""WITH docs AS (
         |  SELECT doc_id, source,
         |    least(greatest(CAST(n_chars AS BIGINT), 0), 1048575)
         |      AS n_chars
         |  FROM documents),
         |byv AS (
         |  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
         |  FROM docs GROUP BY 1, 2),
         |cum AS (
         |  SELECT source, n_chars,
         |    CAST(coalesce(sum(c) OVER (PARTITION BY source
         |      ORDER BY n_chars
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS below,
         |    CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n_src
         |  FROM byv),
         |h AS (
         |  SELECT d.doc_id,
         |    least(below * 4 // greatest(n_src, 1), 3) AS tier,
         |    md5(concat('curr42:', CAST(d.doc_id AS VARCHAR))) AS k
         |  FROM docs d JOIN cum USING (source, n_chars)),
         |s AS (SELECT doc_id, tier, k, ($h4) % 16 AS shard FROM h)
         |SELECT doc_id, tier, shard,
         |  row_number() OVER (PARTITION BY shard
         |    ORDER BY tier, k, doc_id) AS pos
         |FROM s ORDER BY shard, pos""".stripMargin
    },
    "q_collocations" ->
      """WITH toks AS (
        |  SELECT list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |  FROM documents),
        |big AS (
        |  SELECT ts[i] AS prev, ts[i+1] AS cur
        |  FROM toks, unnest(range(1, len(ts))) AS t(i)
        |  WHERE len(ts) >= 2),
        |cb AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c_xy
        |       FROM big GROUP BY 1, 2),
        |cx AS (SELECT prev, CAST(sum(c_xy) AS BIGINT) AS c_x
        |       FROM cb GROUP BY 1),
        |cy AS (SELECT cur, CAST(sum(c_xy) AS BIGINT) AS c_y
        |       FROM cb GROUP BY 1),
        |n AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n FROM cb)
        |SELECT prev, cur, c_xy,
        |  CAST(floor(1000000 * ln(
        |    (CAST(c_xy AS DOUBLE) * CAST(n AS DOUBLE)) /
        |    (CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE)))) AS BIGINT)
        |    AS pmi_u
        |FROM cb JOIN cx USING (prev) JOIN cy USING (cur) CROSS JOIN n
        |WHERE c_xy >= 5
        |ORDER BY pmi_u DESC, prev, cur LIMIT 100""".stripMargin,
    "q_vocab_growth" ->
      """WITH nd AS (SELECT max(doc_id) + 1 AS n_docs FROM documents),
        |toks AS (
        |  SELECT least(doc_id * 10 // n_docs, 9) AS decile,
        |         list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |  FROM documents CROSS JOIN nd),
        |grams AS (
        |  SELECT decile, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
        |  FROM toks, unnest(range(1, len(ts) - 1)) AS t(i)
        |  WHERE len(ts) >= 3),
        |gc AS (SELECT decile, g, CAST(count(*) AS BIGINT) AS c
        |       FROM grams GROUP BY 1, 2),
        |per_dec AS (SELECT decile, CAST(sum(c) AS BIGINT) AS n_grams
        |            FROM gc GROUP BY 1),
        |newt AS (
        |  SELECT decile, CAST(count(*) AS BIGINT) AS new_types FROM (
        |    SELECT g, min(decile) AS decile FROM gc GROUP BY 1)
        |  GROUP BY 1)
        |SELECT decile, n_grams,
        |  CAST(sum(n_grams) OVER (ORDER BY decile
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_grams,
        |  coalesce(new_types, 0) AS new_types,
        |  CAST(sum(coalesce(new_types, 0)) OVER (ORDER BY decile
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
        |FROM per_dec LEFT JOIN newt USING (decile)
        |ORDER BY decile""".stripMargin,
    "q_dsir_sample" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    unnest(list_filter(string_split(text, ' '), t -> t <> ''))
        |      AS token
        |  FROM documents),
        |counts AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS c_a,
        |    CAST(count(*) FILTER (WHERE source IN ('src0', 'src1'))
        |      AS BIGINT) AS c_t
        |  FROM toks GROUP BY 1),
        |tots AS (
        |  SELECT CAST(sum(c_a) AS BIGINT) AS t_a,
        |         CAST(sum(c_t) AS BIGINT) AS t_t,
        |         CAST(count(*) AS BIGINT) AS v
        |  FROM counts),
        |lr AS (
        |  SELECT token, CAST(floor(1000000 * ln(
        |      ((CAST(c_t AS DOUBLE) + 1) *
        |       (CAST(t_a AS DOUBLE) + CAST(v AS DOUBLE))) /
        |      ((CAST(c_a AS DOUBLE) + 1) *
        |       (CAST(t_t AS DOUBLE) + CAST(v AS DOUBLE)))))
        |    AS BIGINT) AS lr_u
        |  FROM counts CROSS JOIN tots)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(lr_u) AS BIGINT) AS score_u
        |FROM toks JOIN lr USING (token)
        |GROUP BY doc_id ORDER BY score_u DESC, doc_id LIMIT 50""".stripMargin
  )
}
