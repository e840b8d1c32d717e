package graft.queries

import graft.{QueryFamily, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-data-pipeline family (SURVEY.md §2.C-10, driver north star):
  * deduplication, text analysis, document fingerprinting, similarity
  * search. Everything is Spark built-ins / higher-order functions — no
  * UDFs — so the whole family stays codegen'd and scales by partitioning.
  *
  * Scale design (100 TB):
  *  - exact dedup = one hash shuffle on the dedup key (or its md5 — 16
  *    bytes/row shuffled, not the document body);
  *  - MinHash+LSH near-dup: per-doc signature (map-only) → explode to
  *    (band, bandHash) → shuffle groups only docs sharing a band bucket —
  *    the all-pairs O(n²) never materializes; candidate verification
  *    joins only within buckets;
  *  - brute-force cosine top-k broadcasts the (small) query set and
  *    scans+scores the corpus map-side; per-query top-k via window over a
  *    partial aggregation, no global sort of all scores.
  *
  * Oracle-checked where DuckDB can express the op; MinHash/SimHash/LSH are
  * declared without oracles (driver rows-only check) and pinned by
  * LlmSpec invariants instead.
  */
object Llm extends QueryFamily {

  private def toks: Column = split(col("text"), " ")

  /** 3-gram word shingles — the ONE definition shared with the streaming
    * near-dup stage ([[graft.functions.TextFunctions.shingles3]]), so the
    * batch LSH queries and NearDupStage can never drift apart on what a
    * shingle is (ANSI-safe short-doc fallback and the bind-tokens-once
    * CSE trick documented there). */
  private def shingles: Column =
    graft.functions.TextFunctions.shingles3(col("text"))

  /** The 100 TB dedup cascade (declared as q_dedup_cascade_lsh): LSH
    * candidates → exact shingle-Jaccard verify → connected components →
    * cluster per doc. Same clustering contract as the exact
    * q_dedup_cascade (integer-arithmetic J ≥ 0.5 on 3-gram shingle
    * sets), with candidate generation swapped from the complete inverted
    * index to MinHash banding — the shape that stays sub-quadratic when
    * boilerplate makes the index's hot-key term blow up. Probabilistic
    * band recall ⇒ no DuckDB oracle (rows-only); LlmSpec pins precision
    * 1.0 and measured recall against the exact cascade's ground truth.
    *
    * Takes any (doc_id, text, …) frame so a pipeline can re-cluster a
    * STREAMED survivor corpus (CorpusPipeline/NearDupStage output)
    * periodically — the batch leg of the streaming near-dup composition,
    * spec-pinned in CorpusPipelineSpec.
    */
  def lshCascade(documents: DataFrame, bands: Int = 8): DataFrame = {
    // Banding is the recall dial (32 permutations split into `bands`
    // bands of 32/bands rows): collision probability at Jaccard J is
    // 1 − (1 − J^rows)^bands. The default 8×4 is cheap but has a
    // measured recall CLIFF near the J = 0.5 threshold (42% at J≈0.52
    // on 1M boiler docs — PLANS.md round 6 sweep); 16×2 lifts that to
    // ~0.99 at the cost of more (still bounded) candidates. Callers
    // pick per corpus: 8×4 when dups sit well above threshold, 16×2
    // when near-threshold recall matters.
    val docs = documents
      .select(col("doc_id"), array_distinct(shingles).as("sset"))
      .repartition(col("doc_id")) // barrier: shingle sets computed once,
                                  // reused by signature AND verify sides
    // banding (validation + band self-join pins) lives in operators.Lsh —
    // the ONE copy the sweep harness shares; array-carrying verify sides
    // below pinned SHUFFLE_HASH (SetSimJoin scaladoc / PLANS round 6)
    val candidates = graft.operators.Lsh.bandCandidates(docs, bands)
    val edges = candidates.hint("shuffle_hash")
      .join(docs.select(col("doc_id").as("id_a"), col("sset").as("set_a")),
        Seq("id_a"))
      .hint("shuffle_hash")
      .join(docs.select(col("doc_id").as("id_b"), col("sset").as("set_b")),
        Seq("id_b"))
      .filter(size(array_intersect(col("set_a"), col("set_b"))) * 3 >=
        size(col("set_a")) + size(col("set_b")))
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val cc = graft.operators.Dedup.components(edges)
    val ids = documents.select(col("doc_id"))
    ids.join(cc.hint("shuffle_hash"), ids("doc_id") === cc("id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("cluster"))
      .orderBy("doc_id")
  }

  /** BM25 scores (k1=1.2, b=0.75) for the fixed 3-term query, in integer
    * micro-units — the scoring core shared by q_bm25_topk and the hybrid
    * fusion query. Rational idf (N−df+0.5)/(df+0.5) — no ln(), so every
    * arithmetic step is a correctly-rounded IEEE op and the score is
    * bit-identical across engines (same trick as q_tfidf). Plan shape:
    * per-doc tf via higher-order filter (map-only, no explode/shuffle of
    * the corpus), ONE 1-row global aggregate for (N, Σdl, df_t) broadcast
    * back, then map-side scoring. avgdl never materializes as a float:
    * b·dl/avgdl is computed as ((0.9·dl)·N)/Σdl from exact integers, one
    * rounding per op. */
  private def bm25Scores(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("spark", "window", "merge")
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .withColumn("dl", size(col("tk")).cast("long"))
    val withTf = terms.foldLeft(docs) { (df, t) =>
      df.withColumn(s"tf_$t",
        size(filter(col("tk"), x => x === lit(t))).cast("long"))
    }
    val aggs = Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")) ++
      terms.map(t =>
        sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = withTf.agg(aggs.head, aggs.tail: _*)
    def termScore(t: String): Column = {
      val tf = col(s"tf_$t"); val df = col(s"df_$t")
      val idf = ((col("n_docs") - df) + lit(0.5)) / (df + lit(0.5))
      val den = (tf + lit(0.3)) +
        (((lit(0.9) * col("dl")) * col("n_docs")) / col("sum_dl"))
      (idf * (tf * lit(2.2))) / den
    }
    withTf.crossJoin(broadcast(stats))
      .withColumn("bm25_u",
        floor(terms.map(termScore).reduce(_ + _) * lit(1000000.0))
          .cast("long"))
      .filter(col("bm25_u") > 0)
      .select(col("doc_id"), col("bm25_u"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- deduplication ----------------------------------------------
    "q_dedup_exact" -> { (s, d) =>
      // Keep the lowest doc_id per exact text; shuffle key is md5(text)
      // (16 bytes) rather than the document body — at 100 TB the shuffle
      // moves fingerprints, not corpora.
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    },
    "q_dedup_prefix" -> { (s, d) =>
      // Near-dup by normalized prefix fingerprint (first 8 tokens) —
      // the cheap first pass of a dedup cascade.
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat_ws(" ", slice(toks, 1, 8)).as("prefix8"))
        .groupBy("prefix8")
        .agg(min(col("doc_id")).as("keep_id"),
             count(lit(1)).as("group_size"))
        .filter(col("group_size") >= 2)
        .select("keep_id", "group_size")
        .orderBy("keep_id")
    },
    "q_dedup_cluster" -> { (s, d) =>
      // Dedup-cascade terminal: near-dup PAIRS → connected COMPONENTS →
      // canonical keeper (min doc_id per component), via
      // graft.operators.Dedup.connectedComponents (min-label propagation
      // with pointer jumping — O(log diameter) rounds; see Scaladoc).
      val docs = Tables.documents(s, d)
        .filter(col("doc_id") < 40)
        .select(col("doc_id"), array_distinct(toks).as("tset"))
      val a = docs.select(col("doc_id").as("id_a"), col("tset").as("set_a"))
      val b = docs.select(col("doc_id").as("id_b"), col("tset").as("set_b"))
      val pairs = a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          floor(size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
                size(array_union(col("set_a"), col("set_b"))) * 1000000)
            .cast("long").as("j"))
        .filter(col("j") >= 500000)
        .select("id_a", "id_b")
      val cc = graft.operators.Dedup.components(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      // singletons (docs with no near-dup edge) are their own cluster
      docs.join(cc, docs("doc_id") === cc("id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("cluster"))
        .orderBy("doc_id")
    },
    "q_dedup_cascade" -> { (s, d) =>
      // The FULL dedup cascade over the WHOLE corpus, end-to-end and
      // exactly: candidate pairs from an inverted-index self-join over
      // 3-gram SHINGLE sets (docs sharing ≥1 shingle — complete for any
      // Jaccard threshold, unlike LSH, whose band recall is
      // probabilistic and therefore un-oracle-able; shingles, not
      // tokens, because Jaccard over a small-vocabulary token set is
      // saturated — every doc shares most tokens with every other),
      // |intersection| counted BY the index join itself (shingles are
      // deduped per doc, so count(*) per pair IS the overlap),
      // threshold J ≥ 0.5 applied in exact integer arithmetic
      // (3·shared ≥ n_a+n_b ⟺ shared/(n_a+n_b−shared) ≥ ½ — no floats
      // anywhere), then connected components → canonical cluster per doc.
      //
      // Scale shape: the explode shuffles (shingle, doc_id) pairs —
      // corpus shingle volume, not O(n²); the pair aggregation
      // partial-aggregates map-side; the size join attaches two small
      // int columns. Hot shingles (boilerplate) are the known cost
      // driver at 100 TB — the exact-preserving refinement is
      // ppjoin-style prefix filtering (sort shingles by global df,
      // index only each doc's first ⌈(1−J)·n⌉+1 rarest; any pair above
      // J must share one), which drops the hot-key quadratic term
      // without losing recall.
      // ONE shingle computation: the repartition barrier below makes the
      // exploded index a canonicalized exchange both join sides (and the
      // size column, carried THROUGH the explode instead of re-joined
      // later) reuse — without it the shingle projection runs 3× over
      // the corpus, and the two size joins re-shuffle the pair table
      // twice (measured 5.2 s → 2.6 s at sf0.1)
      val inv = Tables.documents(s, d)
        .select(col("doc_id"), array_distinct(shingles).as("sset"))
        .select(col("doc_id"), size(col("sset")).as("n"), col("sset"))
        .repartition(col("doc_id")) // barrier BEFORE the explode: measured
        // faster than repartition(sh) after it — hash(doc_id) stays
        // skew-free where hot shingles aren't, and the join's two hash(sh)
        // exchanges shuffle skinny post-explode rows anyway
        .select(col("doc_id"), col("n"), explode(col("sset")).as("sh"))
      val shared = inv.select(col("sh"), col("doc_id").as("id_a"),
          col("n").as("n_a"))
        // merge, not shuffle_hash: the naive index's shingle key is
        // skewed by design (hot shingles), and SMJ spills where a hash
        // build would not; the hint also blocks AQE broadcast promotion
        .join(inv.select(col("sh"), col("doc_id").as("id_b"),
          col("n").as("n_b")).hint("merge"), Seq("sh"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("shared"),
          first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      val edges = shared
        .filter(col("shared") * 3 >= col("n_a") + col("n_b"))
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val cc = graft.operators.Dedup.components(edges)
      val ids = Tables.documents(s, d).select(col("doc_id"))
      ids.join(cc.hint("shuffle_hash"), ids("doc_id") === cc("id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("cluster"))
        .orderBy("doc_id")
    },
    "q_dedup_cascade_ppjoin" -> { (s, d) =>
      // The exact cascade with ppjoin-style PREFIX-FILTERED candidates
      // (graft.operators.SetSimJoin) — identical clusters to
      // q_dedup_cascade (same DuckDB oracle), but candidate generation
      // indexes only each doc's ⌊n/2⌋+1 rarest shingles, so boilerplate
      // (hot-shingle) corpora lose the quadratic term that is the naive
      // inverted index's 100 TB failure mode. See SetSimJoin's scaladoc
      // for the completeness argument; SetSimJoinSpec pins the ≥10×
      // candidate reduction on a planted boilerplate corpus.
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), array_distinct(shingles).as("sset"))
        .select(col("doc_id"), size(col("sset")).as("n"), col("sset"))
        .repartition(col("doc_id")) // one canonicalized exchange feeds the
        // df pass and the ranked-doc build — shingles are computed once,
        // same barrier rationale as q_dedup_cascade
      val edges = graft.operators.SetSimJoin.edges(docs, 1, 2)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val cc = graft.operators.Dedup.components(edges)
      val ids = Tables.documents(s, d).select(col("doc_id"))
      ids.join(cc.hint("shuffle_hash"), ids("doc_id") === cc("id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("cluster"))
        .orderBy("doc_id")
    },
    "q_dedup_cascade_auto" -> { (s, d) =>
      // The ROUTED exact cascade (SetSimJoin.edgesAuto): one df-profile
      // aggregation computes the r6 crossover statistic (naive
      // candidates C = Σ df(df−1)/2 vs corpus volume V = Σ df) and
      // picks naive or prefix-filtered candidates — no manual variant
      // selection, identical clusters either way (both exact; same
      // recursive-CTE oracle as q_dedup_cascade). LSH is never routed
      // to silently: probabilistic recall is a semantics change.
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), array_distinct(shingles).as("sset"))
        .select(col("doc_id"), size(col("sset")).as("n"), col("sset"))
        .repartition(col("doc_id"))
      val edges = graft.operators.SetSimJoin.edgesAuto(docs, 1, 2)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val cc = graft.operators.Dedup.components(edges)
      val ids = Tables.documents(s, d).select(col("doc_id"))
      ids.join(cc.hint("shuffle_hash"), ids("doc_id") === cc("id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("cluster"))
        .orderBy("doc_id")
    },
    // ---- text analysis ----------------------------------------------
    "q_text_quality" -> { (s, d) =>
      // Length / token / stopword-ratio quality signals.
      val nTok = size(toks)
      val stop = expr(
        """size(filter(split(text, ' '),
          |  t -> array_contains(array('a', 'the', 'of', 'dup'), t)))""".stripMargin)
      // ratio outputs floor-scaled (tie-free across engines, see Windows
      // q_win_cume note): k/n with n = 2^a·5^b token counts can land
      // exactly on a round-half tie
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          length(col("text")).as("n_chars_actual"),
          nTok.as("n_tokens"),
          floor(length(regexp_replace(col("text"), " ", ""))
            .cast("double") / nTok * 1000000).cast("long").as("avg_tok_len_u"),
          floor(stop.cast("double") / nTok * 1000000).cast("long")
            .as("stopword_ratio_u"))
        .orderBy("doc_id")
    },
    "q_tokenize_regex" -> { (s, d) =>
      // BPE-ish regex tokenization (word / number / punctuation classes —
      // the pre-tokenizer split BPE vocabularies are trained on) vs plain
      // whitespace counting, per doc.
      val pat = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_ws_tokens"),
          size(regexp_extract_all(col("text"), lit(pat), lit(0)))
            .as("n_re_tokens"),
          // try_element_at: a doc with no pattern match yields an EMPTY
          // array, and ANSI element_at(arr, 1) on it crashes — null here
          // matches the DuckDB oracle's arr[1] semantics
          try_element_at(regexp_extract_all(col("text"), lit(pat), lit(0)),
            lit(1)).as("first_re_token"))
        .orderBy("doc_id")
    },
    "q_token_counts" -> { (s, d) =>
      // Corpus token frequencies — partial-aggregated map-side, so the
      // shuffle carries (token, count) not token instances.
      Tables.documents(s, d)
        .select(explode(toks).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
    },
    "q_ngrams" -> { (s, d) =>
      // corpus bigram counts, top-100: n-gram generation distributed
      // map-side, shuffle carries (bigram, count) partials. Pipeline.bigrams
      // binds split(text) once via the single-element outer transform — the
      // previous CSE barrier here was a repartition(doc_id) that shuffled
      // every token array just to stop re-tokenization.
      Tables.documents(s, d)
        .select(explode(Pipeline.bigrams).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(100)
    },
    "q_lang_id" -> { (s, d) =>
      // Heuristic language-ID: score tokens against fixed per-lang marker
      // sets, argmax with deterministic tie-break, 'und' when no signal.
      // (The synthetic corpus shares one vocabulary across langs — this
      // checks the operator's determinism, not linguistic accuracy.)
      val scoreOf: String => Column = markers =>
        expr(s"""size(filter(split(text, ' '),
                 |  t -> array_contains(array($markers), t)))""".stripMargin)
      val en = scoreOf("'the', 'a', 'of', 'and'")
      val fr = scoreOf("'le', 'la', 'et', 'de'")
      val es = scoreOf("'el', 'los', 'y', 'de'")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          en.as("score_en"), fr.as("score_fr"), es.as("score_es"))
        .withColumn("pred_lang",
          when(greatest(col("score_en"), col("score_fr"), col("score_es")) === 0,
            lit("und"))
          .when(col("score_en") >= greatest(col("score_fr"), col("score_es")), lit("en"))
          .when(col("score_fr") >= col("score_es"), lit("fr"))
          .otherwise(lit("es")))
        .orderBy("doc_id")
    },
    "q_fingerprint" -> { (s, d) =>
      // Content-defined fingerprints: md5 of full text, md5 of the sorted
      // distinct token set (order-insensitive near-dup key), and a
      // token-level rolling polynomial hash (engine-agnostic arithmetic,
      // kept under 2^31 per step so both engines stay in exact range).
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(col("text")).as("fp_exact"),
          md5(concat_ws(" ", array_sort(array_distinct(toks))))
            .as("fp_tokenset"),
          expr(
            """aggregate(split(text, ' '), 7L, (acc, t) ->
              |  (acc * 131 + ascii(substring(t, 1, 1)) * 7 + length(t))
              |    % 2147483647)""".stripMargin).as("fp_rolling"))
        .orderBy("doc_id")
    },
    "q_ann_ivf_topk" -> { (s, d) =>
      // IVF coarse-quantized ANN (graft.operators.Ann) as a declared
      // query: index 16 cells, probe 6, top-10 for 5 query vectors. No
      // DuckDB oracle (k-means model state); AnnSpec pins recall.
      val e = Tables.embeddings(s, d)
      val index = graft.operators.Ann.buildIvf(e, k = 16, iters = 2)
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
      graft.operators.Ann.search(index, queries, topK = 10, nprobe = 6)
    },
    "q_ann_graph_topk" -> { (s, d) =>
      // Graph-based ANN (operators.GraphAnn — the HNSW/DiskANN family):
      // NN-Descent-refined kNN graph + medoid entries, then distributed
      // beam search (iterative frontier joins) for 5 query vectors. No
      // DuckDB oracle (iterative graph model); GraphAnnSpec pins
      // recall@10 vs exact above the IVFPQ shortlist at equal
      // scored-pair budget.
      // bench-sized config: two layers and a short beam loop — the
      // layered frontier loop is JOB-count-dominated at toy scale
      // (measured 9.0 s at the deep default config); the deep
      // hierarchy's recall/exactness/connectivity pins live in
      // GraphAnnSpec, where they are measured against brute force
      val e = Tables.embeddings(s, d)
      val idx = graft.operators.GraphAnn.build(e, degree = 8,
        kCells = 8, iters = 1, probes = 2, descentRounds = 0,
        minTopLayer = 128)
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
      graft.operators.GraphAnn.search(idx, e, queries, topK = 10,
        ef = 12, maxRounds = 3)
    },
    "q_ann_filtered_topk" -> { (s, d) =>
      // Metadata-FILTERED vector search (operators.FilteredSearch):
      // top-10 among label = 3 vectors only — the production retrieval
      // shape (predicate + vector). Cardinality-routed: the ~10%-
      // selective eligible set here is far below the scan budget, so
      // auto takes the EXACT eligible-subset path — deterministic
      // brute force, hence a DuckDB oracle (the graph path's recall
      // pins live in FilteredSearchSpec and q_ann_filtered_graph_topk).
      // Never a post-filter: the predicate prunes BEFORE scoring.
      val e = Tables.embeddings(s, d)
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
      val eligible = e.filter(col("label") === 3).select("vec_id")
      graft.operators.FilteredSearch.exactFiltered(
        e.select(col("vec_id"), col("embedding")), queries, eligible,
        topK = 10)
    },
    "q_ann_filtered_ivf_topk" -> { (s, d) =>
      // The filtered-IVF form at FULL probe: the eligible semi join
      // prunes the assignments before scoring and every cell is
      // scanned, so the result is exactly filtered brute force on the
      // eligible subset — independent of the k-means model — and the
      // query shares q_ann_filtered_topk's oracle (the q_dbscan_ivf
      // pattern). Partial-probe recall lives in FilteredSearchSpec.
      val e = Tables.embeddings(s, d)
      val idx = graft.operators.Ann.buildIvf(e, k = 16, iters = 2)
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
      val eligible = e.filter(col("label") === 3).select("vec_id")
      graft.operators.Ann.searchFiltered(idx, queries, eligible,
        topK = 10, nprobe = 16)
    },
    "q_ann_filtered_graph_topk" -> { (s, d) =>
      // The same filtered search FORCED down the graph path
      // (filter-during-search: navigation unfiltered, ranking
      // filtered, beam widened ~1/selectivity) — the plan that holds
      // when the eligible set is corpus-scaled and the exact scan
      // isn't. Rows-only (iterative graph model); FilteredSearchSpec
      // pins recall@10 vs exact filtered brute force at 1%/10%/50%
      // selectivities and the auto router's path choice.
      // bench-sized config (the q_ann_graph_topk discipline: the
      // layered frontier loop is JOB-count-bound at toy scale — the
      // deep ef/rounds recall pins live in FilteredSearchSpec, where
      // they are measured against exact filtered brute force).
      val e = Tables.embeddings(s, d)
      val idx = graft.operators.GraphAnn.build(e, degree = 8,
        kCells = 8, iters = 1, probes = 2, descentRounds = 0,
        minTopLayer = 128)
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
      val eligible = e.filter(col("label") === 3).select("vec_id")
      graft.operators.GraphAnn.searchFiltered(idx, e, queries, eligible,
        topK = 10, ef = 24, maxRounds = 2)
    },
    "q_edit_distance" -> { (s, d) =>
      // Levenshtein on bounded prefixes — the fuzzy-dedup primitive for
      // short fields (titles/names); O(m·n) per pair so inputs are CAPPED
      // (prefix 24 chars) and the pair space is a bounded candidate set.
      val docs = Tables.documents(s, d)
        .filter(col("doc_id") < 30)
        .select(col("doc_id"), substring(col("text"), 1, 24).as("prefix"))
      val a = docs.select(col("doc_id").as("id_a"), col("prefix").as("pa"))
      val b = docs.select(col("doc_id").as("id_b"), col("prefix").as("pb"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          levenshtein(col("pa"), col("pb")).as("dist"))
        .filter(col("dist") <= 10)
        .orderBy("id_a", "id_b")
    },
    "q_jaccard_pairs" -> { (s, d) =>
      // Token-set Jaccard over a bounded candidate set (doc_id < 40):
      // the exact-verification stage of a near-dup pipeline. At scale the
      // candidate pairs come from LSH buckets (q_minhash_neardup), never
      // from a full cross join.
      val docs = Tables.documents(s, d)
        .filter(col("doc_id") < 40)
        .select(col("doc_id"), array_distinct(toks).as("tset"))
      val a = docs.select(col("doc_id").as("id_a"), col("tset").as("set_a"))
      val b = docs.select(col("doc_id").as("id_b"), col("tset").as("set_b"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          floor(size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
                size(array_union(col("set_a"), col("set_b"))) * 1000000)
            .cast("long").as("jaccard_u"))
        .filter(col("jaccard_u") >= 500000)
        .orderBy("id_a", "id_b")
    },
    // ---- similarity search ------------------------------------------
    "q_ann_cosine_topk" -> { (s, d) =>
      // Brute-force cosine top-10 for 5 query vectors: broadcast the
      // queries, score map-side (double-exact dot — embeddings are
      // unit-norm so dot = cosine), per-query top-k via window.
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
      val scored = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          round(graft.functions.Vectors.dot(col("embedding"), col("qvec")), 6)
            .as("cos"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id").asc)
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 10)
        .select("q_id", "rnk", "vec_id", "cos")
        .orderBy("q_id", "rnk")
    },
    "q_embed_neardup" -> { (s, d) =>
      // Embedding-cosine near-dup pairs (unit-norm ⇒ dot = cosine).
      // Brute all-pairs here; the LSH-bucketed scale path is
      // q_ann_lsh_topk. Filter on the ROUNDED score so both engines cut
      // on the identical value.
      val e = Tables.embeddings(s, d)
      // The corpus parquet is one small split, so without an explicit
      // exchange the nested-loop join streams EVERY pair through a single
      // task — the O(n²/2) scoring loop is CPU-bound and must spread
      // across all cores. Explicit numPartitions: an un-sized
      // repartition's tiny (~600 KB) shuffle would be AQE-coalesced right
      // back to one partition. At 100 TB the scan has natural splits and
      // this exchange is an no-op-sized hash of ids, not embeddings.
      val a = e.repartition(
          e.sparkSession.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      val cos = round(graft.functions.Vectors.dot(col("va"), col("vb")), 6)
      // threshold INSIDE the join condition: the nested-loop join then
      // rejects ~all of the O(n²) pairs before materializing joined rows
      // (the dot is recomputed in the projection only for survivors)
      a.join(broadcast(b), col("id_a") < col("id_b") && cos >= 0.4)
        .select(col("id_a"), col("id_b"), cos.as("cos"))
        .orderBy("id_a", "id_b")
    },
    // ---- Spark-only (no DuckDB oracle; LlmSpec pins semantics) ------
    "q_minhash_neardup" -> { (s, d) =>
      // MinHash(32 perms) + LSH(8 bands × 4 rows): candidate pairs from
      // band-bucket join, verified with exact Jaccard ≥ 0.3.
      //
      // Plan shape matters: repartition() barriers stop CollapseProject
      // from inlining the (expensive) shingle/signature expressions into
      // every downstream band row — each stage is computed exactly once
      // per doc. The band join carries only (band, hash, doc_id); token
      // sets re-join on the (small) deduped candidate pairs, so the wide
      // arrays never shuffle through the bucket join.
      val docs = Tables.documents(s, d)
      // shingles → signature fused in ONE expression (MinHash3GramSignature
      // builds each 3-gram and feeds the mixer in place — no intermediate
      // shingle array, no interpreted HOF lambdas; value-identical to
      // minhashSig(shingles3(text))), and ONE barrier after it: the
      // shuffle carries (doc_id, 32 longs), not the shingle arrays (~3×
      // the document text)
      val sig = docs
        .select(col("doc_id"),
          graft.functions.TextFunctions.minhashSig3(col("text"), 32).as("sig"))
        .repartition(col("doc_id")) // barrier: 32-perm signature once
      val bands = sig.select(col("doc_id"),
          posexplode(expr(
            """transform(sequence(0, 7),
              |  b -> xxhash64(slice(sig, int(b) * 4 + 1, 4)))
              |""".stripMargin)))
        .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
      val candidates = bands.select(col("band"), col("band_hash"),
          col("doc_id").as("id_a"))
        .join(bands.select(col("band"), col("band_hash"),
          col("doc_id").as("id_b")), Seq("band", "band_hash"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates("id_a", "id_b") // before the (costlier) verify
      val tsets = docs.select(col("doc_id"), array_distinct(toks).as("tset"))
      candidates
        .join(tsets.select(col("doc_id").as("id_a"), col("tset").as("set_a")),
          Seq("id_a"))
        .join(tsets.select(col("doc_id").as("id_b"), col("tset").as("set_b")),
          Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          round(size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
                size(array_union(col("set_a"), col("set_b"))), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.3)
        .orderBy("id_a", "id_b")
    },
    "q_dedup_cascade_lsh" -> { (s, d) =>
      lshCascade(Tables.documents(s, d))
    },
    "q_ann_lsh_topk" -> { (s, d) =>
      // Approximate NN via sign-random-hyperplane LSH: 4 tables × 6 bits.
      // Each vector lands in 4 buckets; query↔corpus candidates meet on
      // (table, bucket) — the shuffle carries bucket keys, never the
      // O(n²) pair space. Candidates deduped, scored exactly, top-10.
      val rnd = new scala.util.Random(42)
      val planes: Seq[Seq[Float]] =
        Seq.fill(24)(Seq.fill(64)(rnd.nextGaussian().toFloat))
      val sigBits: Column = array(planes.map(p =>
        when(graft.functions.Vectors.dot(col("embedding"), typedLit(p)) > 0d,
          lit(1)).otherwise(lit(0))): _*)
      val e = Tables.embeddings(s, d)
        .withColumn("sig", sigBits)
        .withColumn("buckets", expr(
          """transform(sequence(0, 3), t ->
            |  aggregate(slice(sig, int(t) * 6 + 1, 6), 0,
            |            (acc, bit) -> acc * 2 + bit))""".stripMargin))
        .select(col("vec_id"), col("embedding"),
          posexplode(col("buckets")).as(Seq("tbl", "bucket")))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qvec"),
                col("tbl"), col("bucket"))
      val cand = e.join(q, Seq("tbl", "bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .select("q_id", "qvec", "vec_id", "embedding")
        .distinct()
      val scored = cand.select(col("q_id"), col("vec_id"),
        round(aggregate(
          zip_with(col("embedding"), col("qvec"),
            (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x), 6).as("cos"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id").asc)
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 10)
        .select("q_id", "rnk", "vec_id", "cos")
        .orderBy("q_id", "rnk")
    },
    "q_semdedup" -> { (s, d) =>
      // SemDeDup: cluster-then-search semantic dedup (operators.SemDedup;
      // k-means via the IVF builder, exact cosine verify inside cells,
      // greedy keep/drop per the paper — no transitive closure, that
      // contract lives in q_dedup_cluster). Probabilistic cluster
      // boundaries ⇒ no DuckDB oracle (rows-only); SemDedupSpec pins
      // precision 1.0 (every drop justified by an exact pair) and
      // measured drop recall. probes=3 measured at ≥0.95 recall vs 0.31
      // single-probe — the multi-probe overlap is what rescues
      // cluster-boundary pairs.
      graft.operators.SemDedup.semDedup(
        Tables.embeddings(s, d), k = 16, iters = 2, tau = 0.4, probes = 3)
    },
    "q_ann_sq_topk" -> { (s, d) =>
      // Scalar-quantization ANN (operators.Sq — FAISS SQ8): per-dim
      // 8-bit uniform grid, 4x compression, near-lossless ranking.
      // Training is one exact min/max aggregation (bit-deterministic
      // under any partitioning — no k-means); search is the decode-free
      // asymmetric-dot shortlist + exact rerank. Quantized shortlist ⇒
      // no DuckDB oracle (rows-only); SqSpec pins the delta/2 error
      // bound and the recall floors.
      val emb = Tables.embeddings(s, d)
      val model = graft.operators.Sq.train(emb)
      val codes = graft.operators.Sq.encode(
        emb.select(col("vec_id"), col("embedding")), model)
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
      graft.operators.Sq.searchRerank(codes, model, emb, queries,
        topK = 10, shortlist = 30)
    },
    "q_ann_bq_topk" -> { (s, d) =>
      // Binary-quantization ANN (operators.Bq — the 32x end of the
      // quantizer family, the "BQ" of modern vector stores): 1 bit per
      // dim at the exact per-dim median (order-free ⇒ bit-deterministic
      // training), XOR+popcount hamming shortlist over dim/8-byte
      // codes, exact rerank. Quantized shortlist ⇒ no DuckDB oracle
      // (rows-only); BqSpec pins kernel ≡ naive reference bit-for-bit,
      // balanced bits, and recall floors in both corpus regimes.
      val emb = Tables.embeddings(s, d)
      val model = graft.operators.Bq.train(emb)
      val codes = graft.operators.Bq.encode(
        emb.select(col("vec_id"), col("embedding")), model)
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
      graft.operators.Bq.searchRerank(codes, model, emb, queries,
        topK = 10, shortlist = 100)
    },
    "q_dbscan" -> { (s, d) =>
      // Density-based clustering (DBSCAN, Ester 1996) via
      // operators.Dbscan: this declared form feeds the labeler from the
      // ALL-PAIRS ε-join — the documented-quadratic ORACLE BASELINE,
      // kept deliberately beside the scale path (the dedup-cascade
      // discipline: q_dedup_cascade anchors q_dedup_cascade_ppjoin the
      // same way). q_dbscan_ivf is the bucketed form that holds at
      // corpus scale; both answer to the SAME recursive-CTE oracle.
      val e = Tables.embeddings(s, d)
      graft.operators.Dbscan.label(e,
        graft.operators.Dbscan.epsPairsExact(e, eps = 0.35), minPts = 4)
    },
    "q_dbscan_ivf" -> { (s, d) =>
      // DBSCAN at scale: the SAME labeling fed by the IVF cell
      // equi-join (operators.Dbscan.epsPairsIvf — KnnJoin's candidate
      // shape: one hash exchange on cell_id, shuffle-hash build, no
      // cartesian anywhere in the plan). probes = kCells scans every
      // cell, so the ε-graph is EXACTLY the all-pairs one and the
      // recursive-CTE oracle stays green (DbscanSpec also pins the
      // pair-set identity directly); at corpus scale probes shrinks and
      // kCells grows with n, making candidate volume ~probes·n·cellSize
      // — linear at fixed probes (ProfileDbscan's 10× sweep).
      val e = Tables.embeddings(s, d)
      graft.operators.Dbscan.label(e,
        graft.operators.Dbscan.epsPairsIvf(e, eps = 0.35, kCells = 16,
          probes = 16), minPts = 4)
    },
    "q_embed_pca" -> { (s, d) =>
      // Distributed PCA (operators.Pca): one fixed-point moment pass →
      // deterministic Jacobi → map-only codegen projection. The only
      // operator in the quantizer/reduce family that cuts DIM itself
      // (PQ/SQ/BQ compress within it). Model training has no SQL
      // analogue ⇒ no DuckDB oracle (rows-only); PcaSpec pins
      // orthonormality, eigen-variance match, planted-direction
      // recovery, kernel ≡ local reference, and repartition
      // bit-identity. Output rounds each component to 4 decimals —
      // driver-hashable scalars, stable to the float dust the rounding
      // absorbs.
      val emb = Tables.embeddings(s, d)
      val model = graft.operators.Pca.train(emb, kOut = 4)
      graft.operators.Pca.project(emb, model)
        .select(col("vec_id"),
          round(col("pc")(0).cast("double"), 4).as("pc1"),
          round(col("pc")(1).cast("double"), 4).as("pc2"),
          round(col("pc")(2).cast("double"), 4).as("pc3"),
          round(col("pc")(3).cast("double"), 4).as("pc4"))
        .orderBy("vec_id")
    },
    "q_ann_ivfsq_topk" -> { (s, d) =>
      // Composed IVF+SQ (FAISS factory "IVF_k,SQ8"): coarse cells for
      // partition-pruned probes, dim-byte SQ codes as the scanned
      // payload, asymmetric-dot shortlist + exact rerank. Rows-only;
      // SqSpec pins full-probe ≡ flat SQ, probed recall, round-trip,
      // and the frozen-model append.
      val emb = Tables.embeddings(s, d)
      val idx = graft.operators.Sq.buildIvfSq(emb, kCells = 16, iters = 2)
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
      graft.operators.Sq.searchIvfSq(idx, queries, emb, topK = 10,
        nprobe = 6, shortlist = 30)
    },
    "q_ann_pq_topk" -> { (s, d) =>
      // Product-quantization ANN (operators.Pq): 16 subspaces × 16
      // codewords — 16× compression, measured 0.84 recall@10 after exact
      // re-rank (m=8/32× measured 0.70; PqSpec) — ADC shortlist over the
      // codes, then exact re-rank of only the shortlisted vectors.
      // Quantized shortlist ⇒ no DuckDB oracle (rows-only); PqSpec pins
      // shortlist and end-to-end recall against the exact cosine top-k.
      val emb = Tables.embeddings(s, d)
      val model = graft.operators.Pq.train(emb, m = 16, k = 16, iters = 2)
      val codes = graft.operators.Pq.encode(
        emb.select(col("vec_id"), col("embedding")), model)
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
      graft.operators.Pq.searchRerank(codes, model, emb, queries,
        topK = 10, shortlist = 50)
    },
    "q_knn_graph" -> { (s, d) =>
      // Distributed kNN-graph (operators.KnnJoin): EVERY vector gets
      // its top-5 neighbors — the corpus×corpus generalization of the
      // broadcast-query ANN searches. Candidates stream through the
      // IVF cell equi-join (a (q,v) pair appears at most once: primary
      // cell data side × multi-probe query side) and per-query top-k
      // runs through the rank window's partial WindowGroupLimit (the
      // boxed typed aggregator OOM'd at 1M query groups — ProfileKnn),
      // so the final shuffle is O(n·k), never the candidate stream.
      // k-means cells ⇒
      // no DuckDB oracle (rows-only); KnnJoinSpec pins full-probe ≡
      // brute-force EXACTLY plus the partial-probe recall floor.
      graft.operators.KnnJoin.knnGraph(Tables.embeddings(s, d),
        topK = 5, kCells = 16, iters = 2, probes = 2)
    },
    "q_knn_graph_full" -> { (s, d) =>
      // The SAME cell-join machinery at probes = kCells: the candidate
      // set covers every pair, so the result is EXACTLY the brute-force
      // kNN graph and DuckDB can adjudicate it row-for-row (the
      // q_dbscan_ivf pattern — declare the exact full-probe form
      // through the scale-path operator so the oracle certifies the
      // bucketing machinery itself, keeping q_knn_graph's partial-probe
      // form as the at-scale config). rankRounded: both engines rank
      // the 6-dp-rounded score with a vec_id tie-break — identical
      // order guaranteed, the q_ann_cosine_topk contract.
      graft.operators.KnnJoin.knnGraph(Tables.embeddings(s, d),
        topK = 5, kCells = 16, iters = 2, probes = 16, rankRounded = true)
    },
    "q_knn_clusters" -> { (s, d) =>
      // Graph-based corpus clustering: threshold the kNN graph, then
      // connected components — two composed operators (KnnJoin +
      // Dedup.connectedComponents). Rows-only; KnnJoinSpec pins exact
      // recovery of planted cluster structure with noise isolation.
      graft.operators.KnnJoin.knnClusters(Tables.embeddings(s, d),
        topK = 5, kCells = 16, tau = 0.2, iters = 2, probes = 2)
    },
    "q_knn_clusters_full" -> { (s, d) =>
      // The SAME composite at probes = kCells + rankRounded: the kNN
      // graph is exactly brute force, the thresholded edges therefore
      // engine-independent, and the min-id connected components answer
      // to a recursive-CTE oracle — the q_dbscan_ivf pattern applied
      // one composite deeper (kNN graph → threshold → CC, all
      // adjudicated row-for-row; q_knn_clusters keeps the partial-probe
      // at-scale config).
      graft.operators.KnnJoin.knnClusters(Tables.embeddings(s, d),
        topK = 5, kCells = 16, tau = 0.2, iters = 2, probes = 16,
        rankRounded = true)
    },
    "q_ann_opq_topk" -> { (s, d) =>
      // Optimized PQ (operators.Opq — Ge 2013's parametric OPQ): a
      // PCA rotation with eigenvalue allocation decorrelates the
      // embedding and balances variance across the m subspaces before
      // quantization. The d×d second moment is one map-only pass with
      // a fixed-point long combine; the eigensolve is driver-local
      // Jacobi on the d×d model state; rotate→encode→ADC are all
      // map-only codegen kernels. Rows-only; OpqSpec pins the
      // orthonormality/dot-preservation contract and the relative
      // error+recall win over plain PQ on a correlated corpus.
      val emb = Tables.embeddings(s, d)
      val model = graft.operators.Opq.train(emb, m = 16, k = 16, iters = 2)
      val codes = graft.operators.Opq.encode(
        emb.select(col("vec_id"), col("embedding")), model)
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
      graft.operators.Opq.searchRerank(codes, model, emb, queries,
        topK = 10, shortlist = 50)
    },
    "q_bpe_merges" -> { (s, d) =>
      // BPE tokenizer TRAINING (operators.Bpe): learn 12 merges over the
      // corpus. One corpus-sized shuffle builds the weighted vocabulary
      // — the sufficient statistic — then the merges are learned from it
      // on the driver (incremental pair-count trainer; the exact batched
      // distributed loop kicks in past 4M distinct words). Iterative
      // model learning ⇒ no DuckDB oracle (rows-only); BpeSpec pins all
      // three training paths bit-for-bit against the classical
      // single-threaded algorithm and its tie/overlap contracts.
      graft.operators.Bpe.train(Tables.documents(s, d), nMerges = 12)
    },
    "q_bpe_encode" -> { (s, d) =>
      // BPE corpus ENCODE — the tokenizer story completed: train the
      // merge table, then apply it to every document through the
      // codegen'd kernel (functions.BpeEncode; model state as a codegen
      // reference object, one kernel call per row, map-only — the
      // corpus-sized hot path never shuffles). Greedy merge apply ⇒ no
      // DuckDB oracle (rows-only); BpeSpec pins the kernel bit-for-bit
      // against the naive in-rank-order reference apply and the id
      // numbering (sorted base chars, then merges by rank). ids_head is
      // concat_ws'd to a string per the repo's driver-hashable rule
      // (array cells crash the harness comparator's row sort).
      val docs = Tables.documents(s, d)
      val merges = graft.operators.Bpe.train(docs, nMerges = 30)
      val model = graft.operators.Bpe.rankModel(merges, docs)
      graft.operators.Bpe.encodeIds(docs, model)
        .select(col("doc_id"), size(col("ids")).as("n_tokens"),
          concat_ws(",", slice(col("ids"), 1, 8)).as("ids_head"))
        .orderBy("doc_id")
    },
    "q_unigram_vocab" -> { (s, d) =>
      // Unigram-LM tokenizer TRAINING (operators.Unigram — the
      // SentencePiece `unigram` model, Kudo 2018): seed substring
      // vocabulary → EM over the segmentation lattice → Viterbi-loss
      // prune, all over the weighted word vocabulary (one corpus-sized
      // shuffle; every later pass is vocab-sized and the E-step crosses
      // rows only as micro-unit longs, so the aggregation is
      // order-free). Iterative model learning ⇒ no DuckDB oracle
      // (rows-only); UnigramSpec pins the distributed trainer
      // bit-for-bit against the single-threaded reference and the
      // Viterbi kernel against exhaustive enumeration.
      graft.operators.Unigram.train(Tables.documents(s, d),
        vocabSize = 200, maxPieceLen = 4, seedSize = 600, emIters = 2)
    },
    "q_unigram_encode" -> { (s, d) =>
      // Unigram corpus ENCODE — Viterbi segmentation through the
      // codegen'd kernel (functions.UnigramEncode): model state as a
      // codegen reference object, integer micro-nat scores (exact tie
      // breaks), one kernel call per row, map-only. Rows-only;
      // UnigramSpec pins the kernel and the decode round-trip.
      val docs = Tables.documents(s, d)
      val table = graft.operators.Unigram.train(docs, vocabSize = 200,
        maxPieceLen = 4, seedSize = 600, emIters = 2)
      val model = graft.operators.Unigram.modelOf(table)
      graft.operators.Unigram.encodeIds(docs, model)
        .select(col("doc_id"), size(col("ids")).as("n_tokens"),
          concat_ws(",", slice(col("ids"), 1, 8)).as("ids_head"))
        .orderBy("doc_id")
    },
    "q_wordpiece_encode" -> { (s, d) =>
      // WordPiece corpus ENCODE (operators.WordPiece — BERT's greedy
      // longest-match-first tokenizer, the third production family
      // beside BPE and unigram): piece inventory from BPE merge
      // training, then one codegen'd kernel call per row
      // (functions.WordPieceEncode), map-only. Greedy munch ⇒ no DuckDB
      // oracle (rows-only); WordPieceSpec pins the kernel bit-for-bit
      // against the naive reference munch and the round-trip. ids_head
      // is concat_ws'd per the driver-hashable rule.
      val docs = Tables.documents(s, d)
      val model = graft.operators.WordPiece.train(docs, nMerges = 30)
      graft.operators.WordPiece.encodeIds(docs, model)
        .select(col("doc_id"), size(col("ids")).as("n_tokens"),
          concat_ws(",", slice(col("ids"), 1, 8)).as("ids_head"))
        .orderBy("doc_id")
    },
    "q_heavy_hitters" -> { (s, d) =>
      // Exact heavy hitters: tokens carrying ≥0.5% of the token stream.
      // Integer-threshold form (c·200 ≥ n) — no float ratio, bit-exact.
      // Two partial-aggregated shuffles (per-token count, 1-row total).
      val tok = Tables.documents(s, d).select(explode(toks).as("token"))
      val tot = tok.agg(count(lit(1)).as("n"))
      tok.groupBy("token").agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(tot))
        .filter(col("c") * 200 >= col("n"))
        .select("token", "c")
        .orderBy("token")
    },
    "q_heavy_hitters_mg" -> { (s, d) =>
      // The same exact heavy hitters through the Misra-Gries TWO-PASS
      // composition (operators.Sketch.exactHeavyHitters): bounded-state
      // MG candidates (k=200 counters/partition, deterministic
      // superset guarantee) -> exact counts of ONLY the candidates.
      // The vocabulary-sized shuffle of the one-pass exact query never
      // happens - the 100 TB shape when the token space is open - yet
      // the output is EXACT, so it certifies against the SAME oracle.
      val tok = Tables.documents(s, d).select(explode(toks).as("token"))
        .filter(col("token") =!= "")
      graft.operators.Sketch.exactHeavyHitters(tok, "token", 1, 200)
        .select("token", "c")
        .orderBy("token")
    },
    "q_heavy_hitters_cms" -> { (s, d) =>
      // Same heavy hitters through a count-min sketch (operators.Sketch):
      // the shuffle carries ≤ d·w counter rows per partition regardless
      // of vocabulary size — the fixed-memory path when the token space
      // is open (n-grams, URLs) and an exact per-token shuffle would
      // detonate. xxhash64 row-hashes ⇒ no DuckDB oracle (rows-only);
      // SketchSpec pins the overestimate guarantee, the ε·N error bound,
      // and shard-mergeability against exact counts.
      val tok = Tables.documents(s, d).select(explode(toks).as("token"))
      val sketch = graft.operators.Sketch.countMin(tok, "token", d = 4,
        w = 1024)
      val tot = tok.agg(count(lit(1)).as("n"))
      graft.operators.Sketch
        .estimate(sketch, tok.distinct(), "token", d = 4, w = 1024)
        .crossJoin(broadcast(tot))
        .filter(col("est") * 200 >= col("n"))
        .select(col("token"), col("est"))
        .orderBy("token")
    },
    "q_ann_ivfpq_topk" -> { (s, d) =>
      // The composed production index (FAISS IVFPQ shape): coarse cells
      // prune the scan to nprobe/k of the corpus, PQ codes keep the
      // scanned bytes at m per vector, exact re-rank on the shortlist
      // only. Rows-only; PqSpec pins full-probe ≡ flat-PQ equivalence
      // and partial-probe recall (measured 0.94 at nprobe 6/16 —
      // ABOVE flat PQ's 0.84: probing filters quantization-error
      // impostors out of the shortlist).
      val emb = Tables.embeddings(s, d)
      val idx = graft.operators.Pq.buildIvfPq(emb, kCells = 16, m = 16,
        k = 16, iters = 2)
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
      graft.operators.Pq.searchIvfPq(idx, queries, emb, topK = 10,
        nprobe = 6, shortlist = 50)
    },
    "q_dedup_incremental" -> { (s, d) =>
      // Cross-RUN incremental dedup — the shape every 100 TB ingestion
      // actually runs: yesterday's corpus is already deduped and its
      // fingerprints live in a registry table; today's batch dedupes
      // against the registry (anti-join) and then within itself (first
      // doc per fingerprint wins). Here the registry is simulated as the
      // even doc_ids, the batch as the odd ones. At scale the registry is
      // a parquet table bucketed by fingerprint, so the anti-join shuffles
      // 16-byte md5s — never document bodies — and the within-batch
      // window runs on the same fingerprint partitioning the anti-join
      // just established (one shuffle serves both).
      val fps = Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("fp"))
      val registry = fps.filter(col("doc_id") % 2 === 0)
        .select(col("fp")).distinct()
      val batch = fps.filter(col("doc_id") % 2 === 1)
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id").asc)
      batch.join(registry.hint("shuffle_hash"), Seq("fp"), "left_anti")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("fp"))
        .orderBy("doc_id")
    },
    "q_bm25_topk" -> { (s, d) =>
      // BM25 top-50 for the fixed 3-term query — scoring core (and its
      // determinism analysis) in bm25Scores above.
      bm25Scores(s, d)
        .orderBy(col("bm25_u").desc, col("doc_id").asc)
        .limit(50)
    },
    "q_hybrid_rrf" -> { (s, d) =>
      // Hybrid retrieval — reciprocal-rank fusion (Cormack 2009) of the
      // lexical BM25 ranking and a dense embedding ranking, the standard
      // two-tower curation/retrieval composition. Lexical arm: the same
      // integer-micro-unit BM25 ranking as q_bm25_topk. Dense arm: the
      // query is vec 7's embedding; scores are INTEGER dot products of
      // per-element floor(1e3·x) quantized vectors — every multiply/add
      // is exact integer arithmetic, so the ranking is bit-identical
      // across engines regardless of summation order (no float-sum
      // determinism caveat at all). Fusion: rrf_u = Σ 1e9 div (60+rank)
      // over the arms that ranked the doc (integer division — exact).
      // Plan shape: both arms are map-side scans (the dense query vector
      // and the BM25 stats row are 1-row broadcasts); each arm's top-50
      // comes from a distributed orderBy+limit (TakeOrderedAndProject —
      // per-partition heap, 50-row merge on the driver side of the
      // exchange), and row_number ranks only the 50 survivors, so no
      // global single-partition window ever sees the corpus. Fusion is a
      // full-outer join of two ≤50-row frames. At 100 TB the lexical arm
      // stays the same shape and the dense arm swaps brute-force scoring
      // for the IVFPQ shortlist (operators.Pq) — the fusion contract is
      // unchanged.
      val lexRanked = bm25Scores(s, d)
        .orderBy(col("bm25_u").desc, col("doc_id").asc).limit(50)
        .withColumn("r_lex", row_number().over(
          // post-limit(50) frame; pmod: non-foldable constant key (a
          // literal would be stripped back to SinglePartition)
          Window.partitionBy(pmod(col("doc_id"), lit(1)))
            .orderBy(col("bm25_u").desc, col("doc_id").asc)).cast("long"))
        .select(col("doc_id"), col("r_lex"))
      val qv = Tables.embeddings(s, d).filter(col("vec_id") === 7)
        .select(col("embedding").as("qvec"))
      val denseRanked = Tables.embeddings(s, d)
        .crossJoin(broadcast(qv))
        .filter(col("vec_id") =!= 7)
        .select(col("vec_id").as("doc_id"), expr(
          """aggregate(
            |  zip_with(embedding, qvec, (a, b) ->
            |    cast(floor(cast(a as double) * 1000) *
            |         floor(cast(b as double) * 1000) as long)),
            |  0L, (acc, x) -> acc + x)""".stripMargin).as("dot_q"))
        .orderBy(col("dot_q").desc, col("doc_id").asc).limit(50)
        .withColumn("r_dense", row_number().over(
          // post-limit(50) frame; pmod: non-foldable constant key (a
          // literal would be stripped back to SinglePartition)
          Window.partitionBy(pmod(col("doc_id"), lit(1)))
            .orderBy(col("dot_q").desc, col("doc_id").asc)).cast("long"))
        .select(col("doc_id"), col("r_dense"))
      lexRanked.join(denseRanked, Seq("doc_id"), "full_outer")
        .withColumn("rrf_u",
          coalesce(expr("1000000000 div (60 + r_lex)"), lit(0L)) +
            coalesce(expr("1000000000 div (60 + r_dense)"), lit(0L)))
        .select(col("doc_id"), col("r_lex"), col("r_dense"), col("rrf_u"))
        .orderBy(col("rrf_u").desc, col("doc_id").asc)
        .limit(20)
    },
    "q_simhash" -> { (s, d) =>
      // 64-bit SimHash from per-token xxhash64 bit votes; near-dup pairs
      // would compare hamming distance ≤ k (LlmSpec).
      Tables.documents(s, d)
        .select(col("doc_id"), toks.as("tokens"))
        .select(col("doc_id"), expr(
          """aggregate(sequence(0, 63), 0L, (acc, bit) ->
            |  acc + if(
            |    aggregate(tokens, 0L,
            |      (votes, t) -> votes +
            |        if((shiftright(xxhash64(t), int(bit)) & 1L) = 1L, 1L, -1L)) > 0L,
            |    shiftleft(1L, int(bit)), 0L))
            |""".stripMargin).as("simhash"))
        .orderBy("doc_id")
    }
  )

    // ONE recursive-CTE oracle serves every exact cascade variant —
  // candidate generation (naive, prefix-filtered, routed) is
  // result-invariant by construction
  private val cascadeOracleSql: String =
    """WITH RECURSIVE docs AS (
        |  SELECT doc_id, CASE WHEN len(toks) < 3 THEN [text]
        |    ELSE list_distinct(list_transform(
        |      generate_series(1, len(toks) - 2),
        |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) END AS sset
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
        |        FROM documents)),
        |sizes AS (SELECT doc_id, len(sset) AS n FROM docs),
        |inv AS (SELECT doc_id, unnest(sset) AS sh FROM docs),
        |shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM shared
        |  JOIN sizes sa ON sa.doc_id = shared.id_a
        |  JOIN sizes sb ON sb.doc_id = shared.id_b
        |  WHERE shared * 3 >= sa.n + sb.n),
        |edges AS (
        |  SELECT id_a, id_b FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT doc_id, doc_id AS r FROM docs
        |  UNION
        |  SELECT e.id_a AS doc_id, reach.r
        |  FROM edges e JOIN reach ON e.id_b = reach.doc_id)
        |SELECT doc_id, min(r) AS cluster
        |FROM reach GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def oracle: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "q_dedup_prefix" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS group_size
        |FROM (SELECT doc_id,
        |        array_to_string(string_split(text, ' ')[1:8], ' ') AS prefix8
        |      FROM documents)
        |GROUP BY prefix8 HAVING count(*) >= 2
        |ORDER BY keep_id""".stripMargin,
    "q_dedup_cluster" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS tset
        |  FROM documents WHERE doc_id < 40),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM docs a JOIN docs b ON a.doc_id < b.doc_id
        |  WHERE CAST(floor(
        |      CAST(len(list_filter(a.tset, t -> list_contains(b.tset, t)))
        |        AS DOUBLE)
        |      / (len(a.tset) + len(b.tset)
        |         - len(list_filter(a.tset, t -> list_contains(b.tset, t))))
        |      * 1000000) AS BIGINT) >= 500000),
        |edges AS (
        |  SELECT id_a, id_b FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT doc_id, doc_id AS r FROM docs
        |  UNION
        |  SELECT e.id_a AS doc_id, reach.r
        |  FROM edges e JOIN reach ON e.id_b = reach.doc_id)
        |SELECT doc_id, min(r) AS cluster
        |FROM reach GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_dedup_cascade" -> cascadeOracleSql,
    "q_dedup_cascade_ppjoin" -> cascadeOracleSql,
    "q_dedup_cascade_auto" -> cascadeOracleSql,
    "q_text_quality" ->
      """SELECT doc_id, lang,
        |  length(text) AS n_chars_actual,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  CAST(floor(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |    / len(string_split(text, ' ')) * 1000000) AS BIGINT) AS avg_tok_len_u,
        |  CAST(floor(CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['a', 'the', 'of', 'dup'], t))) AS DOUBLE)
        |    / len(string_split(text, ' ')) * 1000000) AS BIGINT) AS stopword_ratio_u
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_tokenize_regex" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_re_tokens,
        |  regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')[1] AS first_re_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_token_counts" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token ASC""".stripMargin,
    "q_ngrams" ->
      """SELECT bigram, count(*) AS n FROM (
        |  SELECT unnest(list_transform(
        |    range(1, greatest(len(string_split(text, ' ')), 1)),
        |    i -> string_split(text, ' ')[i] || ' ' ||
        |         string_split(text, ' ')[i + 1])) AS bigram
        |  FROM documents)
        |GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 100""".stripMargin,
    "q_lang_id" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['the', 'a', 'of', 'and'], t))) AS score_en,
        |    len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['le', 'la', 'et', 'de'], t))) AS score_fr,
        |    len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['el', 'los', 'y', 'de'], t))) AS score_es
        |  FROM documents)
        |SELECT doc_id, lang, score_en, score_fr, score_es,
        |  CASE WHEN greatest(score_en, score_fr, score_es) = 0 THEN 'und'
        |       WHEN score_en >= greatest(score_fr, score_es) THEN 'en'
        |       WHEN score_fr >= score_es THEN 'fr'
        |       ELSE 'es' END AS pred_lang
        |FROM scored ORDER BY doc_id""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp_exact,
        |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
        |    AS fp_tokenset,
        |  list_reduce(list_prepend(CAST(7 AS BIGINT),
        |    list_transform(string_split(text, ' '),
        |      t -> CAST(ascii(substring(t, 1, 1)) * 7 + length(t) AS BIGINT))),
        |    (acc, x) -> (acc * 131 + x) % 2147483647) AS fp_rolling
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_edit_distance" ->
      """WITH docs AS (
        |  SELECT doc_id, substring(text, 1, 24) AS prefix
        |  FROM documents WHERE doc_id < 30)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  levenshtein(a.prefix, b.prefix) AS dist
        |FROM docs a JOIN docs b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.prefix, b.prefix) <= 10
        |ORDER BY id_a, id_b""".stripMargin,
    "q_jaccard_pairs" ->
      """WITH docs AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS tset
        |  FROM documents WHERE doc_id < 40),
        |scored AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(floor(CAST(len(list_filter(a.tset, t -> list_contains(b.tset, t)))
        |        AS DOUBLE)
        |      / (len(a.tset) + len(b.tset)
        |         - len(list_filter(a.tset, t -> list_contains(b.tset, t))))
        |      * 1000000) AS BIGINT) AS jaccard_u
        |  FROM docs a JOIN docs b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, jaccard_u FROM scored
        |WHERE jaccard_u >= 500000
        |ORDER BY id_a, id_b""".stripMargin,
    // full-probe cell candidates cover all pairs, so the bucketed form
    // answers to the SAME oracle as the all-pairs baseline
    "q_dbscan_ivf" -> dbscanOracle,
    "q_dbscan" -> dbscanOracle,
    "q_embed_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 6) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,
    "q_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |tot AS (SELECT count(*) AS n FROM tok),
        |cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token)
        |SELECT token, c FROM cnt, tot WHERE c * 200 >= n
        |ORDER BY token""".stripMargin,
    // the MG two-pass composition is exact, so it answers to the SAME
    // heavy-hitter oracle as the one-pass query
    "q_heavy_hitters_mg" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |tot AS (SELECT count(*) AS n FROM tok),
        |cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token)
        |SELECT token, c FROM cnt, tot WHERE c * 200 >= n
        |ORDER BY token""".stripMargin,
    "q_dedup_incremental" ->
      """WITH fps AS (SELECT doc_id, md5(text) AS fp FROM documents),
        |registry AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 2 = 0),
        |batch AS (SELECT doc_id, fp FROM fps WHERE doc_id % 2 = 1),
        |fresh AS (
        |  SELECT doc_id, fp FROM batch b
        |  WHERE NOT EXISTS (SELECT 1 FROM registry r WHERE r.fp = b.fp)),
        |ranked AS (
        |  SELECT doc_id, fp,
        |    row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |  FROM fresh)
        |SELECT doc_id, fp FROM ranked WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    "q_bm25_topk" ->
      // double literals written as 5e-1 etc. so DuckDB types them DOUBLE
      // (a plain 0.5 is DECIMAL there) — the op sequence must be the same
      // correctly-rounded IEEE steps as the Spark side
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |d AS (
        |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
        |    CAST(len(list_filter(tk, x -> x = 'spark')) AS BIGINT) AS tf_spark,
        |    CAST(len(list_filter(tk, x -> x = 'window')) AS BIGINT) AS tf_window,
        |    CAST(len(list_filter(tk, x -> x = 'merge')) AS BIGINT) AS tf_merge
        |  FROM t),
        |stats AS (
        |  SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
        |    sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
        |    sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window,
        |    sum(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS df_merge
        |  FROM d),
        |scored AS (
        |  SELECT doc_id,
        |    CAST(floor((
        |      ((((n_docs - df_spark) + 5e-1) / (df_spark + 5e-1))
        |        * (tf_spark * 22e-1))
        |       / ((tf_spark + 3e-1) + (((9e-1 * dl) * n_docs) / sum_dl))
        |      + ((((n_docs - df_window) + 5e-1) / (df_window + 5e-1))
        |        * (tf_window * 22e-1))
        |       / ((tf_window + 3e-1) + (((9e-1 * dl) * n_docs) / sum_dl))
        |      + ((((n_docs - df_merge) + 5e-1) / (df_merge + 5e-1))
        |        * (tf_merge * 22e-1))
        |       / ((tf_merge + 3e-1) + (((9e-1 * dl) * n_docs) / sum_dl))
        |      ) * 1e6) AS BIGINT) AS bm25_u
        |  FROM d, stats)
        |SELECT doc_id, bm25_u FROM scored WHERE bm25_u > 0
        |ORDER BY bm25_u DESC, doc_id LIMIT 50""".stripMargin,
    "q_hybrid_rrf" ->
      // Same bm25 scored CTE as q_bm25_topk; dense arm is the exact
      // integer-quantized dot (floor(1e3·x) per element — every op exact
      // integer, no float-summation caveat); fusion in integer division.
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |d AS (
        |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
        |    CAST(len(list_filter(tk, x -> x = 'spark')) AS BIGINT) AS tf_spark,
        |    CAST(len(list_filter(tk, x -> x = 'window')) AS BIGINT) AS tf_window,
        |    CAST(len(list_filter(tk, x -> x = 'merge')) AS BIGINT) AS tf_merge
        |  FROM t),
        |stats AS (
        |  SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
        |    sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
        |    sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window,
        |    sum(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS df_merge
        |  FROM d),
        |scored AS (
        |  SELECT doc_id,
        |    CAST(floor((
        |      ((((n_docs - df_spark) + 5e-1) / (df_spark + 5e-1))
        |        * (tf_spark * 22e-1))
        |       / ((tf_spark + 3e-1) + (((9e-1 * dl) * n_docs) / sum_dl))
        |      + ((((n_docs - df_window) + 5e-1) / (df_window + 5e-1))
        |        * (tf_window * 22e-1))
        |       / ((tf_window + 3e-1) + (((9e-1 * dl) * n_docs) / sum_dl))
        |      + ((((n_docs - df_merge) + 5e-1) / (df_merge + 5e-1))
        |        * (tf_merge * 22e-1))
        |       / ((tf_merge + 3e-1) + (((9e-1 * dl) * n_docs) / sum_dl))
        |      ) * 1e6) AS BIGINT) AS bm25_u
        |  FROM d, stats),
        |lexall AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY bm25_u DESC, doc_id) AS r_lex
        |  FROM scored WHERE bm25_u > 0),
        |lex AS (SELECT doc_id, CAST(r_lex AS BIGINT) AS r_lex
        |        FROM lexall WHERE r_lex <= 50),
        |qv AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 7),
        |dots AS (
        |  SELECT e.vec_id AS doc_id,
        |    CAST(list_sum(list_transform(list_zip(e.embedding, q.qvec),
        |      x -> CAST(floor(CAST(x[1] AS DOUBLE) * 1000)
        |             * floor(CAST(x[2] AS DOUBLE) * 1000) AS BIGINT)))
        |      AS BIGINT) AS dot_q
        |  FROM embeddings e CROSS JOIN qv q
        |  WHERE e.vec_id <> 7),
        |denall AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY dot_q DESC, doc_id) AS r_dense
        |  FROM dots),
        |den AS (SELECT doc_id, CAST(r_dense AS BIGINT) AS r_dense
        |        FROM denall WHERE r_dense <= 50),
        |fused AS (
        |  SELECT COALESCE(lex.doc_id, den.doc_id) AS doc_id,
        |    lex.r_lex, den.r_dense,
        |    CAST(COALESCE(1000000000 // (60 + lex.r_lex), 0) +
        |         COALESCE(1000000000 // (60 + den.r_dense), 0) AS BIGINT)
        |      AS rrf_u
        |  FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id)
        |SELECT doc_id, r_lex, r_dense, rrf_u FROM fused
        |ORDER BY rrf_u DESC, doc_id LIMIT 20""".stripMargin,
    // full-probe filtered IVF covers the whole eligible set exactly,
    // so it answers to the SAME oracle as the exact filtered scan
    "q_ann_filtered_ivf_topk" -> filteredOracle,
    "q_ann_filtered_topk" -> filteredOracle,
    // full-probe thresholded kNN graph ≡ brute force, so min-id CC
    // over it answers to a recursive-CTE oracle (reachability in the
    // symmetrized edge set; min reachable id = component min)
    "q_knn_clusters_full" ->
      s"""WITH RECURSIVE $knnBruteCtes,
         |p AS MATERIALIZED (
         |  SELECT q_id AS ia, vec_id AS ib FROM ranked
         |  WHERE rnk <= 5 AND cos >= 0.2),
         |edges AS MATERIALIZED (SELECT ia AS src, ib AS dst FROM p
         |          UNION ALL SELECT ib, ia FROM p),
         |reach AS (
         |  SELECT src AS id, src AS r FROM edges
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         |lab AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
         |SELECT emb.vec_id,
         |       CAST(coalesce(l.cluster, emb.vec_id) AS BIGINT) AS cluster
         |FROM embeddings emb LEFT JOIN lab l ON emb.vec_id = l.id
         |ORDER BY emb.vec_id""".stripMargin,
    // full-probe kNN graph ≡ brute force, so the all-pairs SQL
    // adjudicates the IVF cell-join machinery end to end
    "q_knn_graph_full" ->
      s"""WITH $knnBruteCtes
         |SELECT q_id, rnk, vec_id, cos FROM ranked
         |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "q_ann_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS qvec
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.q_id, e.vec_id,
        |    round(list_sum(list_transform(list_zip(e.embedding, q.qvec),
        |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 6) AS cos
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id <> q.q_id),
        |ranked AS (
        |  SELECT q_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, vec_id ASC) AS rnk
        |  FROM scored)
        |SELECT q_id, rnk, vec_id, cos FROM ranked
        |WHERE rnk <= 10 ORDER BY q_id, rnk""".stripMargin
  )

  /** Shared by q_ann_filtered_topk (exact eligible-subset scan) and
    * q_ann_filtered_ivf_topk (filtered IVF at full probe): both are
    * exactly filtered brute force, so one oracle adjudicates both. */
  private val filteredOracle =
      """WITH q AS (SELECT vec_id AS q_id, embedding AS qvec
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.q_id, e.vec_id,
        |    round(list_sum(list_transform(list_zip(e.embedding, q.qvec),
        |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 6) AS cos
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id <> q.q_id AND e.label = 3),
        |ranked AS (
        |  SELECT q_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, vec_id ASC) AS rnk
        |  FROM scored)
        |SELECT q_id, rnk, vec_id, cos FROM ranked
        |WHERE rnk <= 10 ORDER BY q_id, rnk""".stripMargin

  /** Shared by q_dbscan (all-pairs baseline) and q_dbscan_ivf (cell
    * equi-join at full probe): the candidate sets cover the same pair
    * universe, so one recursive-CTE oracle adjudicates both. */
  /** Brute-force exact kNN CTEs shared by the two full-probe oracles
    * (q_knn_graph_full, q_knn_clusters_full): the q_ann_cosine_topk
    * contract — 6-dp-rounded dot, (cos desc, vec_id asc) rank — in ONE
    * definition, so a precision/tie-break change cannot split them. */
  private val knnBruteCtes =
    """scored AS (
      |  SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
      |    round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 6) AS cos
      |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
      |ranked AS (
      |  SELECT q_id, vec_id, cos,
      |    CAST(row_number() OVER (PARTITION BY q_id
      |      ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rnk
      |  FROM scored)""".stripMargin

  private val dbscanOracle =
      """WITH RECURSIVE p AS (
        |  SELECT a.vec_id AS ia, b.vec_id AS ib
        |  FROM embeddings a JOIN embeddings b
        |    ON a.vec_id < b.vec_id
        |   AND round(list_sum(list_transform(list_zip(a.embedding,
        |         b.embedding),
        |         x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 6)
        |       >= 0.35),
        |edges AS (SELECT ia AS src, ib AS dst FROM p
        |          UNION ALL SELECT ib, ia FROM p),
        |deg AS (SELECT src, count(*) AS c FROM edges GROUP BY 1),
        |cores AS (SELECT src AS node FROM deg WHERE c + 1 >= 4),
        |ce AS (
        |  SELECT e.src, e.dst FROM edges e
        |  JOIN cores c1 ON e.src = c1.node
        |  JOIN cores c2 ON e.dst = c2.node),
        |reach AS (
        |  SELECT node AS id, node AS r FROM cores
        |  UNION
        |  SELECT ce.src AS id, reach.r
        |  FROM ce JOIN reach ON ce.dst = reach.id),
        |lab AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
        |nbr AS (
        |  SELECT e.src AS id, min(l.cluster) AS nc
        |  FROM edges e JOIN lab l ON e.dst = l.id GROUP BY 1)
        |SELECT emb.vec_id,
        |       CAST(coalesce(l.cluster, n.nc, -1) AS BIGINT) AS cluster,
        |       CAST(CASE WHEN l.id IS NOT NULL THEN 1 ELSE 0 END
        |            AS INT) AS is_core
        |FROM embeddings emb
        |LEFT JOIN lab l ON emb.vec_id = l.id
        |LEFT JOIN nbr n ON emb.vec_id = n.id
        |ORDER BY emb.vec_id""".stripMargin
}
