package graft

/** Driver-contract guards: the exact invariants the harness depends on. */
class SparkEntrySpec extends SparkSuite {

  /** Queries intentionally declared WITHOUT a DuckDB oracle (sketches /
    * model state / LSH — each pinned by a dedicated spec instead). */
  private val specPinned = Set(
    "q_agg_approx",      // HLL sketch            → AggsSpec
    "q_minhash_neardup", // LSH                   → LlmSpec
    "q_dedup_cascade_lsh", // LSH cascade (precision/recall vs exact) → LlmSpec
    "q_simhash",         // bag-hash              → LlmSpec
    "q_ann_lsh_topk",    // LSH ANN               → LlmSpec
    "q_ann_ivf_topk",    // k-means model state   → AnnSpec
    "q_semdedup",        // cluster-then-search semantic dedup → SemDedupSpec
    "q_ann_pq_topk",     // product-quantization ANN → PqSpec
    "q_ann_sq_topk",     // scalar-quantization (SQ8) ANN → SqSpec
    "q_ann_bq_topk",     // binary-quantization (1-bit) ANN → BqSpec
    "q_ann_ivfsq_topk",  // composed IVF+SQ index → SqSpec
    "q_ann_ivfpq_topk",  // composed IVF+PQ index → PqSpec
    "q_ann_opq_topk",    // OPQ rotated product quantization → OpqSpec
    "q_ann_graph_topk",  // proximity-graph beam search → GraphAnnSpec
    "q_ann_filtered_graph_topk", // filter-during-search graph path
                         //   → FilteredSearchSpec (the auto-routed
                         //   q_ann_filtered_topk IS oracled)
    "q_embed_pca",       // distributed PCA (moments+Jacobi) → PcaSpec
    "q_knn_graph",       // IVF-join kNN graph (full-probe ≡ exact) → KnnJoinSpec
    "q_knn_clusters",    // thresholded kNN graph + CC clustering → KnnJoinSpec
    "q_heavy_hitters_cms", // count-min sketch    → SketchSpec
    "q_quantile_sketch", // DDSketch quantiles (alpha rel-error) → SketchSpec
    "q_cardinality_hll", // HLL registers (se band + merge) → SketchSpec
    "q_corpus_overlap",  // KMV/theta snapshot set ops → SketchSpec
    // q_sample_weighted left this set in r15: the A-ES key is now
    // micro-nat quantized and md5-derived, so DuckDB adjudicates it
    // (PipelineSpec keeps the local-reference + weight-law pins)
    "q_image_neardup",   // perceptual-hash banded near-dup → PerceptualHashSpec
    "q_audio_neardup",   // acoustic-fingerprint banded near-dup → AudioFingerprintSpec
    "q_video_neardup",   // slot-aligned frame-hash near-dup → VideoFingerprintSpec
    "q_bpe_merges",      // BPE tokenizer training → BpeSpec
    "q_bpe_encode",      // BPE corpus encode (greedy apply) → BpeSpec
    "q_unigram_vocab",   // unigram-LM tokenizer training (EM) → UnigramSpec
    "q_unigram_encode",  // unigram Viterbi corpus encode → UnigramSpec
    "q_wordpiece_encode", // WordPiece greedy-munch corpus encode → WordPieceSpec
    "q_quality_classifier", // learned filter (GD ≡ classical loop,
                         //   held-out accuracy) → QualityClassifierSpec
    "q_contamination_bloom") // Bloom probe (no false negatives,
                         //   dominates exact counts) → BloomSpec

  test("every oracle key is a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("every query is oracled or explicitly spec-pinned") {
    val unchecked =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- specPinned
    assert(unchecked.isEmpty,
      s"declared without oracle or spec pin: $unchecked")
    assert(specPinned.subsetOf(SparkEntry.queries.keySet))
    // a spec-pin is a WEAKER check than an oracle — a query carrying
    // both would let a dropped oracle pass silently
    val both = specPinned.intersect(SparkEntry.oracleSql.keySet)
    assert(both.isEmpty, s"oracled queries still spec-pinned: $both")
  }

  test("entry() answers on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      // q_join_anti/q_join_theta legitimately return 0 at tiny SF — the
      // rest must produce data for the driver's rows-only check
      if (name != "q_join_anti" && name != "q_join_theta")
        assert(fn(spark, "/root/testdata/sf0.001").limit(1).count() == 1,
          s"$name returned no rows")
    }
  }
}
