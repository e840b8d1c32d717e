package graft.queries

import graft.{SparkEntry, SparkSuite}

/** Plan-shape regression guards (PLANS.md): the properties that make
  * these queries scale are asserted, not just documented. */
class PlanSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString()

  test("q_scan_filter pushes the predicate into the parquet scan") {
    val plan = executedPlan("q_scan_filter")
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,10.0)]"),
      s"filter not pushed:\n${plan.take(2000)}")
  }

  test("q1 reads only referenced columns (pruning)") {
    val plan = executedPlan("q1_pricing_summary")
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") &&
      !readSchema.contains("l_partkey") && readSchema.contains("l_quantity"),
      s"column pruning regressed: $readSchema")
  }

  test("q_join_star broadcasts every dimension") {
    val plan = executedPlan("q_join_star")
    assert(plan.split("BroadcastHashJoin").length >= 5, // 4 joins
      "star join stopped broadcasting dims")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q_win_topk_per_group keeps the partial WindowGroupLimit") {
    val plan = executedPlan("q_win_topk_per_group")
    assert(plan.split("WindowGroupLimit").length >= 3, // partial + final
      "rank-limit pushdown (WindowGroupLimit) regressed")
  }

  test("q_dedup_exact shuffles fingerprints with partial aggregation") {
    val plan = executedPlan("q_dedup_exact")
    assert(plan.split("HashAggregate").length >= 3, // partial + final
      "partial aggregation regressed")
  }
  test("q_contamination broadcasts the benchmark n-gram set") {
    val plan = executedPlan("q_contamination")
    assert(plan.contains("BroadcastHashJoin"),
      "contamination check stopped broadcasting the bench set")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q_pack_sequences windows per shard, not a global single partition") {
    val plan = executedPlan("q_pack_sequences")
    // a global-order window would show an Exchange SinglePartition feeding
    // the running sum — the sharded form hash-partitions on the shard key
    val windowIdx = plan.indexOf("RunningWindowFunction") match {
      case -1 => plan.indexOf("Window")
      case i => i
    }
    assert(windowIdx >= 0)
    assert(!plan.contains("Exchange SinglePartition"),
      s"packing window collapsed to one partition:\n${plan.take(2000)}")
  }

  test("bounded global windows carry a constant partition key, never SinglePartition") {
    // the machine-checkable form of the "no single-partition window over
    // corpus-scaled input" invariant: every declared window that ranks a
    // provably bounded frame (|days|, |distinct lengths|, post-limit(50))
    // partitions by a literal, so NO window in these plans feeds from an
    // Exchange SinglePartition (global aggregates may — those reduce
    // bounded partials, not rank rows)
    for (q <- Seq("q_running_distinct", "q_drift_ks", "q_hybrid_rrf",
        "q_vocab_growth")) {
      val lines = executedPlan(q).linesIterator.toVector
      val winIdxs = lines.zipWithIndex
        .filter(_._1.contains("Window")).map(_._2)
      assert(winIdxs.nonEmpty, s"$q lost its window?")
      winIdxs.foreach { i =>
        val below = lines.slice(i + 1, i + 4).mkString("\n")
        assert(!below.contains("Exchange SinglePartition"),
          s"$q window still feeds from SinglePartition:\n$below")
      }
    }
  }

  test("q_ann_filtered_topk pre-filters: predicate pushed, semi join before scoring") {
    val plan = SparkEntry.queries("q_ann_filtered_topk")(spark, sf)
      .queryExecution.executedPlan.toString()
    // the predicate reaches the eligible scan — never post-filtering
    // the scored top-k
    assert(plan.contains("EqualTo(label,3)"),
      s"label predicate not pushed to the parquet scan:\n${plan.take(2000)}")
    // eligibility is a semi join (dim-sized side), not a row filter
    // after scoring
    assert(plan.contains("LeftSemi"),
      "eligible-subset semi join regressed")
  }

  test("q_split_hash is map-only above the scan (no shuffle before sort)") {
    val plan = executedPlan("q_split_hash")
    // exactly one exchange: the final presentation orderBy
    assert(plan.split("Exchange").length <= 3,
      s"split assignment gained a shuffle:\n${plan.take(2000)}")
  }

  test("q_zorder_layout broadcasts the 1-row min/max frame; z-math is codegen'd") {
    val plan = executedPlan("q_zorder_layout")
    // the min/max frame rides a BroadcastNestedLoopJoin against ONE
    // aggregated row — bounded by construction; the corpus side must
    // never be the build side of anything bigger
    assert(plan.contains("BroadcastExchange"),
      s"min/max frame no longer broadcast:\n${plan.take(2000)}")
    // the interleave is a native shift/mask expression chain in a
    // Project (codegen-able), never a UDF / lambda black box
    assert(plan.contains("shiftleft(") && !plan.contains("UDF"),
      "z-value math is no longer a native expression chain")
    // events scan reads only the three referenced columns
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("props") && !readSchema.contains("event_type"),
      s"column pruning regressed: $readSchema")
  }

  test("dedup cascades never broadcast a corpus-scaled side") {
    // the AQE compressed-bytes broadcast promotion detonation (PLANS
    // round 6): every cascade join is hinted, so no broadcast operator
    // may appear. The cascade-level plan is lineage-truncated by
    // connected components' localCheckpoint (only the final cluster
    // join survives in it), so the EDGE pipelines — where the 10.2 GiB
    // build actually happened — are asserted un-truncated.
    import org.apache.spark.sql.functions._
    import graft.operators.{Lsh, SetSimJoin}
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        array_distinct(split(col("text"), " ")).as("sset"))
      .select(col("doc_id"), size(col("sset")).as("n"), col("sset"))
    val plans = Seq(
      "ppjoin edges" ->
        SetSimJoin.edges(docs, 1, 2)
          .queryExecution.executedPlan.toString(),
      "lsh candidates+verify" ->
        SetSimJoin.verify(Lsh.bandCandidates(docs, 8), docs, 1, 2)
          .queryExecution.executedPlan.toString(),
      "cascade final join" -> executedPlan("q_dedup_cascade_ppjoin"))
    for ((n, plan) <- plans) {
      assert(!plan.contains("BroadcastHashJoin") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$n re-grew a broadcast join:\n${plan.take(2000)}")
      assert(plan.contains("ShuffledHashJoin"),
        s"$n lost its shuffle-hash pins")
    }
  }

  test("q_span_dedup finds first occurrences without any join") {
    val plan = executedPlan("q_span_dedup")
    // first-occurrence = whole-partition window min over the span hash:
    // the firsts frame is corpus-sized (hashes mostly unique), so any
    // join against it builds/sorts a corpus-sized side — the window is
    // one spillable shuffle (measured: the old SHUFFLE_HASH build dies
    // at 1M docs on an 8 GB heap)
    assert(plan.contains("Window"), "window-min first occurrence missing")
    assert(!plan.contains("Join"),
      s"first-occurrence join reappeared:\n${plan.take(2000)}")
    assert(plan.split("HashAggregate").length >= 3, // partial + final
      "per-doc aggregation lost its partial phase")
    assert(!plan.contains("Exchange SinglePartition"),
      "window collapsed to one partition")
  }

  test("q_corpus_shuffle windows per shard, never globally") {
    val plan = executedPlan("q_corpus_shuffle")
    assert(plan.contains("Window"))
    assert(!plan.contains("Exchange SinglePartition"),
      s"shuffle rank collapsed to one partition:\n${plan.take(2000)}")
  }

  test("q_curriculum windows per shard; CDF tiers ride a broadcast") {
    val plan = executedPlan("q_curriculum")
    // training-order rank is per shard (the q_corpus_shuffle shape)…
    assert(plan.contains("Window"))
    assertNoSinglePartitionWindow("q_curriculum")
    // …and the tier lookup is the q_quality_normalize broadcast — the
    // corpus is never sorted or joined by value at corpus scale
    assert(plan.contains("BroadcastHashJoin"),
      s"CDF tier join stopped broadcasting:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"), "SMJ crept in")
  }

  test("q_chunk_windows is map-only above the scan") {
    val plan = executedPlan("q_chunk_windows")
    // generate + project only; one exchange for the presentation sort
    assert(plan.contains("Generate"), "chunking lost its posexplode")
    assert(plan.split("Exchange").length <= 3,
      s"chunking gained a shuffle:\n${plan.take(2000)}")
  }

  test("q_tfidf: head broadcast + tail SHJ, n_docs the only nested loop") {
    val plan = executedPlan("q_tfidf")
    // r14: the full-vocab df broadcast became the Zipf head-split —
    // hot head broadcast, cold tail SHUFFLE_HASH, 1-row n_docs on the
    // only nested loop
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("ShuffledHashJoin"),
      s"tfidf head-split lost a half:\n${plan.take(2000)}")
    assert(plan.split("BroadcastNestedLoop").length - 1 <= 1)
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q_token_rarity: head broadcast + tail SHJ") {
    val plan = executedPlan("q_token_rarity")
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("ShuffledHashJoin"),
      s"rarity head-split lost a half:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q_mix_sample filters map-side (no shuffle before sort)") {
    val plan = executedPlan("q_mix_sample")
    assert(plan.split("Exchange").length <= 3,
      s"mix sampling gained a shuffle:\n${plan.take(2000)}")
  }

  test("q_simhash_banded joins on band buckets — no all-pairs in the plan") {
    val plan = executedPlan("q_simhash_banded")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"banded simhash regressed to all-pairs:\n${plan.take(2000)}")
    // and it matches the all-pairs query row-for-row (exactness: hamming
    // <= 3 with 4 bands can't miss — pigeonhole)
    val banded = SparkEntry.queries("q_simhash_banded")(spark, sf).collect()
    val allPairs = SparkEntry.queries("q_simhash_pairs")(spark, sf).collect()
    assert(banded.toSeq == allPairs.toSeq)
  }

  test("q9 scans lineitem once and broadcasts every dimension side " +
      "(derived partsupp included)") {
    val plan = executedPlan("q9_product_profit")
    assert(plan.split("BroadcastHashJoin").length >= 6, // 5 joins
      s"q9 stopped broadcasting dims:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"))
    // the derived partsupp dedups pairs with partial aggregation before
    // its broadcast, never shipping raw lineitem rows to the driver
    assert(plan.split("HashAggregate").length >= 3)
  }

  test("q20 nested IN-subqueries plan as joins, no per-row loops") {
    val plan = executedPlan("q20_promotable_stock")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"q20 fell off the hash-join path:\n${plan.take(1500)}")
  }

  test("ppjoin candidates: no cartesian, df pass partial-aggregates") {
    // the cascade's connected-components checkpoint severs the printed
    // top plan, so pin the candidate stage's plan directly
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        array_distinct(graft.functions.TextFunctions.shingles3(col("text")))
          .as("sset"))
      .select(col("doc_id"), size(col("sset")).as("n"), col("sset"))
    val plan = graft.operators.SetSimJoin.candidatesPrefix(docs, 1, 2)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    // the global df count must split partial/final (map-side combine)
    assert(plan.split("HashAggregate").length >= 3, s"df pass not " +
      s"partial-aggregated:\n${plan.take(1500)}")
  }

  test("q18 IN-subquery plans as a semi join, not a nested loop per row") {
    val plan = executedPlan("q18_large_orders")
    assert(plan.contains("LeftSemi"),
      s"IN-subquery lost its semi-join rewrite:\n${plan.take(2000)}")
  }

  test("q_agg_salted runs the two-phase (key,salt)->key aggregation") {
    val plan = executedPlan("q_agg_salted")
    // partial+final per phase = 4 HashAggregates, and no phase collapses
    // to a single partition
    assert(plan.split("HashAggregate").length >= 5,
      s"salted agg lost a phase:\n${plan.take(2000)}")
    assert(!plan.contains("Exchange SinglePartition"))
  }

  test("q_agg_topk_custom keeps the typed aggregator's partial/merge split") {
    val plan = executedPlan("q_agg_topk_custom")
    // ObjectHashAggregate partial + final: per-partition top-k state
    // merges instead of shuffling each group's full traffic
    assert(plan.split("ObjectHashAggregate").length >= 3,
      s"typed aggregator lost its partial phase:\n${plan.take(2000)}")
  }

  test("q4 EXISTS plans as a semi join with the lateness conjunct") {
    val plan = executedPlan("q4_priority_count")
    assert(plan.contains("LeftSemi"),
      s"EXISTS lost its semi-join rewrite:\n${plan.take(2000)}")
  }

  test("q6 pushes every filter to the scan and never shuffles rows") {
    val plan = executedPlan("q6_forecast_revenue")
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"scan filters not pushed:\n${plan.take(2000)}")
    // single-row combine only: no hash-partitioned exchange
    assert(!plan.contains("Exchange hashpartitioning"),
      s"pure aggregate gained a hash shuffle:\n${plan.take(2000)}")
  }

  test("q19 keeps the equi-key broadcast join under the disjunction") {
    val plan = executedPlan("q19_disjunctive_revenue")
    assert(plan.contains("BroadcastHashJoin"),
      s"disjunctive bands broke the hash join:\n${plan.take(2000)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "join degenerated to a nested loop")
  }

  test("q22 anti join stays an anti join (no per-row subquery)") {
    val plan = executedPlan("q22_dormant_customers")
    assert(plan.contains("LeftAnti"),
      s"NOT EXISTS lost its anti-join rewrite:\n${plan.take(2000)}")
  }

  test("q2 correlated subquery is rewritten to an aggregate join") {
    val plan = executedPlan("q2_min_acctbal")
    // the correlation must decorrelate: an aggregate feeding a join, no
    // per-row subquery execution
    assert(plan.contains("HashAggregate") &&
      (plan.contains("Join") || plan.contains("BroadcastHashJoin")),
      s"correlated subquery not decorrelated:\n${plan.take(2000)}")
  }

  test("q_bm25_topk never explodes the corpus; stats ride a broadcast") {
    val plan = executedPlan("q_bm25_topk")
    // term frequencies come from higher-order filter() — a Generate node
    // would mean the corpus exploded into a token shuffle
    assert(!plan.contains("Generate"),
      s"bm25 tf went through an explode:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastExchange"),
      s"1-row stats frame no longer broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q_dedup_incremental anti-joins without broadcasting the registry") {
    val plan = executedPlan("q_dedup_incremental")
    // the registry is corpus-scaled: the anti join must stay a shuffled
    // hash join (hinted), and the anti-join + first-wins window share
    // the fingerprint partitioning — exactly one hashpartitioning(fp)
    // exchange in the plan
    assert(plan.contains("LeftAnti"), s"anti join lost:\n${plan.take(2000)}")
    assert(!plan.contains("BroadcastHashJoin"),
      s"corpus-scaled registry got broadcast:\n${plan.take(2000)}")
    val fpExchanges = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning(fp"))
      .size
    assert(fpExchanges <= 2, // one per join side; window reuses them
      s"anti-join and window stopped sharing the fp shuffle:\n${plan.take(2000)}")
  }

  test("q_hybrid_rrf ranks distributed top-50s, never a corpus-wide window") {
    val plan = executedPlan("q_hybrid_rrf")
    // each arm's top-50 must come from TakeOrderedAndProject (distributed
    // per-partition heaps), with the single-partition Window running only
    // on the 50 survivors — a Window directly over a corpus scan/exchange
    // would move the whole corpus to one partition
    assert(plan.split("TakeOrderedAndProject").length >= 3, // one per arm
      s"arm top-k stopped using TakeOrderedAndProject:\n${plan.take(2000)}")
    // the dense arm's 1-row query vector rides a broadcast, not a shuffle
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"query-vector broadcast lost:\n${plan.take(2000)}")
  }

  test("q_bigram_logprob pairs tokens in-row and partial-aggregates counts") {
    val plan = executedPlan("q_bigram_logprob")
    // bigram pairing is an in-row transform + ONE Generate (posexplode of
    // the struct list); a self-join or window to pair neighbors would
    // shuffle the corpus before counting
    assert(plan.split("HashAggregate").length >= 3, // partial + final
      s"count passes lost partial aggregation:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"scoring joins fell back to SMJ:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastExchange"), // 1-row vocab-size frame
      s"vocab-size broadcast lost:\n${plan.take(2000)}")
  }

  test("q_contamination_bloom probes map-side: k broadcast joins, no SMJ") {
    val plan = executedPlan("q_contamination_bloom")
    // the k probe joins are broadcasts of the (word_idx, bits) filter
    // with the k-way AND in-row; a SortMergeJoin or a probe-explode
    // aggregation would shuffle corpus grams before the count
    assert(plan.split("BroadcastHashJoin").length >= 5, // k = 4 probes
      s"probe joins stopped broadcasting:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"a probe join fell back to SMJ:\n${plan.take(2000)}")
  }

  test("q_span_excise runs the no-join window shape end to end") {
    val plan = executedPlan("q_span_excise")
    assert(!plan.contains("Join"),
      s"first-occurrence join reappeared:\n${plan.take(2000)}")
    assert(!plan.contains("Exchange SinglePartition"),
      "a window collapsed to one partition")
  }

  test("q_drift_psi broadcasts the 1-row totals and joins nothing else") {
    val plan = executedPlan("q_drift_psi")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"totals broadcast lost:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      s"drift grew a shuffled join:\n${plan.take(2000)}")
    assert(plan.split("HashAggregate").length >= 3, // partial + final counts
      "token counts lost partial aggregation")
  }

  test("q_drift_psi_binned: codegen'd bin sums, bins-sized shuffle only") {
    val plan = executedPlan("q_drift_psi_binned")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"totals broadcast lost:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      s"binned drift grew a shuffled join:\n${plan.take(2000)}")
    assert(plan.split("HashAggregate").length >= 3, // partial + final
      "bin counts lost partial aggregation — the shuffle must carry " +
        "bins-sized partials, never value rows")
  }

  test("q_unigram_encode is map-only through the Viterbi kernel") {
    val plan = executedPlan("q_unigram_encode")
    // one kernel call per row; the merge table is model state inside
    // the expression — no join, no aggregate, only the final sort
    assert(plan.contains("unigram_encode"),
      s"Viterbi kernel missing from plan:\n${plan.take(2000)}")
    assert(!plan.contains("Join"),
      s"encode grew a join:\n${plan.take(2000)}")
    assert(!plan.contains("HashAggregate"),
      s"encode grew an aggregation:\n${plan.take(2000)}")
  }

  test("q_quantile_sketch aggregates partially; joins stay broadcast") {
    val plan = executedPlan("q_quantile_sketch")
    // the bucket counts must combine map-side (the ≤#buckets/partition
    // shuffle IS the operator's scale story), and every join touches
    // only sketch-sized frames — broadcast, never shuffled
    assert(plan.split("HashAggregate").length >= 3, // partial + final
      s"bucket counts lost partial aggregation:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      s"a sketch-sized join shuffled:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastExchange"),
      s"sketch frames no longer broadcast:\n${plan.take(2000)}")
  }

  test("q_ann_opq_topk composes rotate+encode kernels, broadcasts model state") {
    val plan = executedPlan("q_ann_opq_topk")
    // rotation and PQ assignment are both in-plan codegen kernels —
    // falling back to HOF lambdas or a UDF would vanish these names
    assert(plan.contains("rotate_vector"),
      s"rotation kernel missing:\n${plan.take(2000)}")
    assert(plan.contains("pq_codes"),
      s"PQ encode kernel missing:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"a model-state join fell back to SMJ:\n${plan.take(2000)}")
  }

  test("q_knn_graph streams candidates; top-k merges bounded state") {
    val plan = executedPlan("q_knn_graph")
    // the corpus-sized sides meet in the hinted cell equi-join — never a
    // broadcast of a corpus-scaled frame, never a cartesian
    assert(plan.contains("ShuffledHashJoin"),
      s"cell join lost its shuffle-hash pin:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"knn join regressed to all-pairs:\n${plan.take(2000)}")
    // per-query top-k through the rank window's PARTIAL
    // WindowGroupLimit: each map task forwards ≤k sorted rows per
    // query — spillable UnsafeRow machinery, where the typed
    // aggregator's boxed per-group buffers OOM'd at 1M queries
    // (ProfileKnn)
    assert(plan.split("WindowGroupLimit").length >= 3, // partial + final
      s"top-k lost its partial WindowGroupLimit:\n${plan.take(2000)}")
    assert(!plan.contains("ObjectHashAggregate"),
      "the boxed typed aggregator reappeared on the corpus-group path")
  }

  test("q_quality_classifier scoring is map-only (in-row kernel, no joins)") {
    val plan = executedPlan("q_quality_classifier")
    // (this executes the 6 training iterations first — sf0.001 is cheap)
    // scoring collapsed from featurize → broadcast-join → aggregate to
    // ONE expression call per row: the plan must carry the kernel and
    // NOTHING relational besides the final sort
    assert(plan.contains("qc_score_u"),
      s"scoring kernel missing from plan:\n${plan.take(2000)}")
    assert(!plan.contains("Join"), s"scoring grew a join:\n${plan.take(2000)}")
    assert(!plan.contains("HashAggregate"),
      s"scoring grew an aggregation:\n${plan.take(2000)}")
  }

  test("q_assoc_rules: top-100 is TakeOrdered, never a global sort") {
    val plan = executedPlan("q_assoc_rules")
    assert(plan.contains("TakeOrderedAndProject"),
      s"rule ranking regressed to sort+limit:\n${plan.take(2000)}")
    assert(!plan.contains("Cartesian"),
      s"a pair join degenerated:\n${plan.take(2000)}")
  }

  test("q_event_transitions / q_rolling_anomaly: one window pass each") {
    // the three rolling aggregates share a frame (exactly one Window);
    // the transition matrix localCheckpoints the lag-window result, so
    // its declared plan must show NO residual window — two Windows in
    // either plan means the corpus is re-sorted per consumer (the bug
    // this guard caught on the first cut)
    assert(executedPlan("q_rolling_anomaly")
      .split("\\bWindow\\b").length - 1 == 1)
    assert(executedPlan("q_event_transitions")
      .split("\\bWindow\\b").length - 1 == 0)
  }

  test("q_mix_token_budget broadcasts allocations; corpus shuffles once") {
    val plan = executedPlan("q_mix_token_budget")
    // the per-source allocation table is tiny and must ride broadcasts;
    // the corpus itself shuffles only for the per-source window
    assert(plan.split("BroadcastHashJoin").length >= 2,
      s"allocation join stopped broadcasting:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"a corpus-side join degenerated to SMJ:\n${plan.take(3000)}")
  }

  test("q_embed_pca projection is map-only through the codegen kernel") {
    val plan = executedPlan("q_embed_pca")
    assert(plan.contains("pca_project"),
      s"projection kernel missing from plan:\n${plan.take(2000)}")
    assert(!plan.contains("Join"),
      s"projection grew a join:\n${plan.take(2000)}")
    assert(!plan.contains("HashAggregate"),
      s"projection grew an aggregation:\n${plan.take(2000)}")
  }

  test("q_funnel: one event shuffle feeds the whole window cascade") {
    val plan = executedPlan("q_funnel")
    // 4 chained windows over the SAME user_id partitioning + the
    // per-user collapse must share ONE exchange of the events; the only
    // other exchange is the single-row final rollup
    assert(plan.split("\\bWindow\\b").length - 1 >= 4,
      s"funnel window cascade collapsed:\n${plan.take(2000)}")
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2,
      s"funnel re-shuffles the events ($exchanges exchanges):\n${plan.take(3000)}")
    assert(!plan.contains("Expand"),
      "funnel regressed to count-distinct Expand over the event table")
  }

  test("q_attribution: one event shuffle feeds both touch windows") {
    val plan = executedPlan("q_attribution")
    // the two last-ignoreNulls windows share frame, sort and the ONE
    // user_id exchange; the only other exchanges are the |types|-sized
    // rollup and its presentation sort
    assert(plan.split("\\bWindow\\b").length - 1 >= 1,
      s"attribution lost its window:\n${plan.take(2000)}")
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 3,
      s"attribution re-shuffles the events ($exchanges):\n${plan.take(3000)}")
  }

  test("q_collocations / q_dsir_sample: vocab sides pinned, corpus never broadcast") {
    for (q <- Seq("q_collocations", "q_dsir_sample")) {
      val plan = executedPlan(q)
      // the hint-pinned vocabulary joins stay shuffled-hash (AQE's
      // compressed-size broadcast mispromotion is the known hazard);
      // the 1-row totals ride the only nested-loop
      assert(plan.contains("ShuffledHashJoin"),
        s"$q: vocabulary join lost its SHUFFLE_HASH pin:\n${plan.take(2000)}")
      assert(!plan.contains("SortMergeJoin"), s"$q: SMJ crept in")
      assert(plan.split("BroadcastNestedLoop").length - 1 <= 1,
        s"$q: something beyond the 1-row totals nested-loops:\n${plan.take(3000)}")
    }
  }

  test("token scoring joins ride the Zipf head-split (r14)") {
    // dsirScores / unigram / bigram: the vocab head joins map-side via
    // broadcast AND the tail keeps its SHUFFLE_HASH pin — losing either
    // half resurrects the hot-token straggler at 100 TB
    for (q <- Seq("q_dsir_sample", "q_unigram_logprob",
        "q_bigram_logprob", "q_tfidf", "q_token_rarity")) {
      val plan = executedPlan(q)
      assert(plan.contains("BroadcastHashJoin"),
        s"$q: hot-head broadcast lost:\n${plan.take(2000)}")
      assert(plan.contains("ShuffledHashJoin"),
        s"$q: cold-tail SHJ pin lost:\n${plan.take(2000)}")
      assert(!plan.contains("SortMergeJoin"), s"$q: SMJ crept in")
    }
  }

  /** No Window operator in `q`'s executed plan may feed from an
    * Exchange SinglePartition within the next few plan lines — the
    * bounded-global-windows guard's check, shared (global AGGREGATES
    * and the final presentation sort may single-partition; rank
    * windows may not). */
  private def assertNoSinglePartitionWindow(q: String): Unit = {
    val lines = executedPlan(q).linesIterator.toVector
    val winIdxs = lines.zipWithIndex
      .filter(_._1.contains("Window")).map(_._2)
    assert(winIdxs.nonEmpty, s"$q lost its window?")
    winIdxs.foreach { i =>
      val below = lines.slice(i + 1, i + 4).mkString("\n")
      assert(!below.contains("Exchange SinglePartition"),
        s"$q window feeds from SinglePartition:\n$below")
    }
  }

  test("q_quality_normalize: ranks ride a broadcast, never a per-doc sort") {
    val plan = executedPlan("q_quality_normalize")
    // the value-level rank table broadcasts back onto the corpus — the
    // corpus itself is never sorted or ranked per-doc
    assert(plan.contains("BroadcastHashJoin"),
      s"value-level rank join stopped broadcasting:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"), "SMJ crept in")
    assertNoSinglePartitionWindow("q_quality_normalize")
  }

  test("q_stream_topk: rank limit stays partial, window per time-bucket") {
    val plan = executedPlan("q_stream_topk")
    // row_number ≤ 3 per 6-hour window plans the partial+final
    // WindowGroupLimit pair — each map task forwards ≤ 3 rows per window
    assert(plan.split("WindowGroupLimit").length >= 3,
      s"q_stream_topk rank-limit pushdown regressed:\n${plan.take(2000)}")
    assertNoSinglePartitionWindow("q_stream_topk")
  }

  test("q_graph_hops / q_communities_quality: no cartesian, joins pinned") {
    // the iterative frontier/label loops run on localCheckpointed
    // frames, so the EXECUTED plans of the final frames must carry
    // only the intended joins — never a nested loop over the edge list
    val hops = executedPlan("q_graph_hops")
    assert(!hops.contains("Cartesian") &&
      !hops.contains("BroadcastNestedLoop"),
      s"hop frontier join degenerated:\n${hops.take(3000)}")
    val qual = executedPlan("q_communities_quality")
    assert(!qual.contains("Cartesian"),
      s"modularity joins degenerated:\n${qual.take(3000)}")
    // the only nested loop is the deliberate 1-row |E| totals broadcast
    assert(qual.split("BroadcastNestedLoop").length - 1 <= 1,
      s"an equi-join degenerated to a nested loop:\n${qual.take(3000)}")
    // label joins stay SHUFFLE_HASH-pinned (node-sized build sides)
    assert(qual.contains("ShuffledHashJoin"),
      s"modularity label joins lost their SHJ pin:\n${qual.take(3000)}")
    val cost = executedPlan("q_graph_shortest_cost")
    assert(!cost.contains("Cartesian") &&
      !cost.contains("BroadcastNestedLoop"),
      s"min-plus relaxation join degenerated:\n${cost.take(3000)}")
  }

  test("q_triangles: no cartesian anywhere in the three-join chain") {
    val plan = executedPlan("q_triangles")
    assert(!plan.contains("Cartesian"),
      s"triangle joins degenerated:\n${plan.take(3000)}")
    // the single-row triangles×edges rollup is a deliberate 1×1 cross;
    // nothing ELSE may nested-loop
    assert(plan.split("BroadcastNestedLoop").length - 1 <= 1,
      s"an equi-join degenerated to a nested loop:\n${plan.take(3000)}")
    // the edge list is localCheckpointed, so the lineitem scan lives in
    // the checkpoint's OWN plan — assert the basket filter pushes there
    val edgePlan = graft.Tables.lineitem(spark, sf)
      .filter(org.apache.spark.sql.functions.col("l_quantity") > 30.0)
      .queryExecution.executedPlan.toString()
    assert(edgePlan.contains("GreaterThan(l_quantity,30.0)"),
      s"basket filter no longer pushed into the lineitem scan:\n$edgePlan")
  }

  test("q_rfm aggregates the monetary percentile over the clamped column") {
    // the r16 bounded-state fix: exact percentile's value→count buffer
    // must see m_cents div 10000 clamped to [0, 2^20) — never raw
    // m_cents, whose distinct values grow O(customers)
    val plan = executedPlan("q_rfm")
    assert(plan.contains("1048575"),
      s"cdfBin clamp missing from the rfm plan:\n${plan.take(2000)}")
    assert(plan.contains("percentile(m_q") &&
      !plan.contains("percentile(m_cents"),
      "monetary percentile regressed to the unbounded raw column")
  }

}
