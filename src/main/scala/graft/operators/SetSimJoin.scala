package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join (Jaccard ≥ num/den) with ppjoin-style
  * prefix + positional filtering — the exact-preserving fix for the
  * hot-shingle quadratic term in inverted-index candidate generation.
  *
  * The naive inverted index ([[candidatesAll]]) pairs every two docs that
  * share ANY set element, so one boilerplate shingle present in k docs
  * contributes k·(k−1)/2 candidate pairs — the first thing that blows up
  * on templated web text at 100 TB. Prefix filtering
  * ([[candidatesPrefix]]) restores a corpus-volume bound: order elements
  * by ascending global document frequency (rarest first; ties broken by
  * the element value so the order is total and deterministic), and index
  * only each doc's PREFIX — its first n − ⌈t·n⌉ + 1 rarest elements.
  *
  * Completeness (no lost pairs): if J(a,b) ≥ t and the prefixes were
  * disjoint, every common element would come after both prefixes in the
  * global order, so |a∩b| ≤ min(⌈t·|a|⌉, ⌈t·|b|⌉) − 1 < t·max(|a|,|b|)
  * ≤ t·|a∪b| — contradicting J ≥ t. Hot (boilerplate) elements have the
  * HIGHEST df, so they sort last and fall out of every prefix: the
  * quadratic term vanishes without losing recall, unlike LSH banding.
  * (Prefix filtering after Chaudhuri et al.'s SSJoin primitive and
  * Xiao et al.'s ppjoin, including ppjoin's length and positional
  * filters; both papers describe single-node algorithms — here the df
  * ranking is one partial-aggregated pass plus a per-doc in-row sort,
  * and every join is a hash shuffle on (element) or (doc_id).)
  *
  * All arithmetic is integer (thresholds as rationals), matching the
  * cascade's determinism discipline — no floats anywhere.
  *
  * Every join in this operator is hinted, because AQE sizes broadcast
  * candidates from COMPRESSED shuffle bytes — and boilerplate-heavy text
  * compresses 30-50×, so a corpus-scaled array-carrying side slides
  * under a 64 MiB threshold and detonates at broadcast-build time
  * (measured: 10.2 GiB attempted build at 5M boiler docs, PLANS.md
  * round 6). A join hint takes precedence over AQE's promotion, and
  * SHUFFLE_HASH with the hint on the side we WANT built keeps the
  * build per-partition (no driver collect, no 8 GiB cap) at
  * near-broadcast cost: the built sides here are either the
  * candidate-bounded pair set or a skinny vocabulary/index slice —
  * never the full per-doc arrays. The one join whose key IS skewed by
  * construction — [[candidatesAll]]'s inverted-index self-join, where a
  * hot element concentrates its quadratic blowup on one key — stays
  * SHUFFLE_MERGE (spill-safe).
  *
  * Expected input `docs`: (doc_id: long, n: int = |set|, sset: array) with
  * sset deduplicated (array_distinct) — the same shape q_dedup_cascade
  * builds. Reference anchor: composes SURVEY §2.C-10's near-dup contract;
  * the reference engine has no set-similarity operator (sink-only).
  */
object SetSimJoin {

  /** Naive complete candidates: docs sharing ≥1 element. Hot-key
    * quadratic — kept as the comparison baseline for [[candidatesPrefix]]
    * and for corpora known to be boilerplate-free. */
  def candidatesAll(docs: DataFrame): DataFrame = {
    val inv = docs.select(col("doc_id"), explode(col("sset")).as("sh"))
    inv.select(col("sh"), col("doc_id").as("id_a"))
      .join(inv.select(col("sh"), col("doc_id").as("id_b")).hint("merge"),
        Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Each doc's element list sorted by the global ascending-df order
    * (ties by element value — a total, deterministic order). ONE per-doc
    * in-row sort feeds both the prefix index and the suffix-slice verify;
    * the trailing repartition makes this a canonicalized exchange every
    * downstream branch reuses instead of re-running the df join and the
    * collect/sort. The rarest-first ranking is computed by re-collecting
    * each doc's (df, element) pairs and array_sort-ing them in place
    * rather than a row_number window: per-doc shuffle volume is
    * identical, but the sort is a bounded in-row operation instead of a
    * whole-partition window sort. */
  private def rankedDocs(docs: DataFrame): DataFrame = {
    val inv = docs.select(col("doc_id"), col("n"), explode(col("sset")).as("sh"))
    // global document frequency — one partial-aggregated pass over the
    // exploded index (shuffle carries (element, count), not instances)
    val df = inv.groupBy("sh").agg(count(lit(1)).as("df"))
    inv.join(df.hint("shuffle_hash"), Seq("sh"))
      .groupBy(col("doc_id"), col("n"))
      .agg(collect_list(struct(col("df"), col("sh"))).as("elems"))
      .select(col("doc_id"), col("n"),
        transform(array_sort(col("elems")), e => e.getField("sh"))
          .as("sorted"))
  }

  /** Candidate pairs with the per-pair statistics the positional filter
    * and the fused verify need: c = number of prefix-prefix matches,
    * (pa, pb) = positions of the LAST prefix match in each doc's sorted
    * order, (n_a, n_b) = set sizes. Prefix size is n − ⌈t·n⌉ + 1
    * (pure-integer ceil).
    *
    * Two exact-preserving cuts from the ppjoin family run inside the
    * candidate join itself (pure filters — they only drop pairs whose
    * overlap provably cannot reach the threshold):
    *
    * LENGTH filter: J(a,b) ≥ t ⟹ |a∩b| ≥ t·|a∪b| and |a∩b| ≤ min(n_a,n_b)
    * ⟹ min ≥ t·max, i.e. num·greatest(n_a,n_b) ≤ den·least(n_a,n_b) —
    * applied per join row before the pair aggregation.
    *
    * POSITIONAL filter: elements within each doc are sorted by the SAME
    * global (df, element) total order, so a pair's shared elements occur
    * at jointly increasing positions in both docs, and the last prefix
    * match (pa, pb) has both coordinates maximal among matches. Any
    * shared element with a-position ≤ pa must (order coherence) have
    * b-position ≤ pb and is then inside both prefixes — i.e. already one
    * of the c matches. Every OTHER shared element sits strictly after pa
    * in a AND after pb in b, giving |a∩b| ≤ c + min(n_a−pa, n_b−pb).
    * Pairs where even this bound misses the required overlap
    * o_min = num·(n_a+n_b)/(den+num) are dropped. On the sf0.1 documents
    * corpus this cuts candidates 409k → 120k for the same 256 verified
    * edges (measured; verify cost is candidate-bound). */
  private def pairStats(ranked: DataFrame, num: Int, den: Int): DataFrame = {
    // prefix size: n − ⌈num·n/den⌉ + 1, as integers
    val prefixLen = (col("n") + lit(1) -
      floor((col("n") * num + den - 1) / den).cast("int")).cast("int")
    val prefix = ranked
      .select(col("doc_id"), col("n"),
        posexplode(slice(col("sorted"), lit(1), prefixLen)))
      .select(col("col").as("sh"), col("doc_id"), col("n"),
        (col("pos") + 1).as("pos")) // 1-based position in the df order
    prefix.select(col("sh"), col("doc_id").as("id_a"), col("n").as("n_a"),
        col("pos").as("pa"))
      .join(prefix.select(col("sh"), col("doc_id").as("id_b"),
        col("n").as("n_b"), col("pos").as("pb")).hint("shuffle_hash"),
        Seq("sh")) // prefixes exclude hot elements, so this key is not skewed
      .filter(col("id_a") < col("id_b") &&
        greatest(col("n_a"), col("n_b")) * num <=
          least(col("n_a"), col("n_b")) * den)
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("c"), max(col("pa")).as("pa"),
        max(col("pb")).as("pb"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      .filter((col("c") +
        least(col("n_a") - col("pa"), col("n_b") - col("pb"))) *
        (den + num) >= (col("n_a") + col("n_b")) * num)
  }

  /** Prefix-filtered candidates for Jaccard ≥ num/den: complete, and
    * immune to hot elements (they rank last by df and drop out of every
    * prefix). See [[pairStats]] for the filters applied. */
  def candidatesPrefix(docs: DataFrame, num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"threshold $num/$den not in (0,1]")
    pairStats(rankedDocs(docs), num, den).select("id_a", "id_b")
  }

  /** The full prefix-filtered similarity self-join, fused: candidates and
    * verification share one df-sorted per-doc array, and the verify step
    * re-uses the candidate aggregation's (c, pa, pb) instead of
    * recounting from scratch. By the order-coherence argument on
    * [[pairStats]], |a∩b| = c + |a(pa..] ∩ b(pb..]| — only the SUFFIX
    * slices beyond the last prefix match are intersected, in-row, on
    * candidate-bounded volume (the slices ride the two doc_id hash joins;
    * nothing corpus² anywhere, no re-shuffle of the intersect output).
    * Returns (id_a, id_b) with exact Jaccard ≥ num/den:
    * (den+num)·|a∩b| ≥ num·(n_a+n_b), integer-exact. */
  def edges(docs: DataFrame, num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"threshold $num/$den not in (0,1]")
    val ranked = rankedDocs(docs).localCheckpoint()
    pairStats(ranked, num, den).hint("shuffle_hash")
      .join(ranked.select(col("doc_id").as("id_a"), col("sorted").as("sa")),
        Seq("id_a"))
      .hint("shuffle_hash")
      .join(ranked.select(col("doc_id").as("id_b"), col("sorted").as("sb")),
        Seq("id_b"))
      .withColumn("shared", col("c") + size(array_intersect(
        slice(col("sa"), col("pa") + 1, col("n_a") - col("pa")),
        slice(col("sb"), col("pb") + 1, col("n_b") - col("pb")))))
      .filter(col("shared") * (den + num) >= (col("n_a") + col("n_b")) * num)
      .select("id_a", "id_b")
  }

  /** The naive cascade's fused index-join-and-count edges (the
    * q_dedup_cascade inline shape, shared here so the router can pick
    * it): overlap counted BY the inverted-index self-join (merge, not
    * hash — the shingle key is skewed by design and SMJ spills), same
    * integer threshold. Identical output to [[edges]]; cheaper on
    * boilerplate-FREE corpora because it skips the df-ranking pass. */
  def edgesNaive(docs: DataFrame, num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"threshold $num/$den not in (0,1]")
    val inv = docs.select(col("doc_id"), col("n"), explode(col("sset")).as("sh"))
    inv.select(col("sh"), col("doc_id").as("id_a"), col("n").as("n_a"))
      .join(inv.select(col("sh"), col("doc_id").as("id_b"),
        col("n").as("n_b")).hint("merge"), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      .filter(col("shared") * (den + num) >= (col("n_a") + col("n_b")) * num)
      .select("id_a", "id_b")
  }

  /** One-aggregation df profile: corpus element volume V = Σ df and the
    * EXACT naive candidate count C = Σ df·(df−1)/2 (each element with
    * document frequency df contributes every pair of its postings).
    * This is the r6 sweep's crossover statistic, computed instead of
    * guessed — one partial-aggregated shuffle over the exploded
    * element instances, two longs out. */
  final case class DfProfile(volume: Long, naiveCandidates: Long,
      maxDf: Long) {
    /** The measured routing rule: the hot-key quadratic term dominates
      * when naive candidates exceed `hotFactor`× the corpus volume
      * (clean corpora sit at C/V ≈ 0.06, boilerplate at C/V ≈ 10³⁺ —
      * the sweep's cliff is orders of magnitude wide, so any factor in
      * [1, 100] routes identically; 8 centers it). */
    def hot(hotFactor: Long): Boolean =
      naiveCandidates > hotFactor * volume
  }

  def dfProfile(docs: DataFrame): DfProfile = {
    val row = docs.select(explode(col("sset")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .agg(sum(col("df")).as("v"),
        // df·(df−1) is even; shiftright keeps the arithmetic in longs
        // (SQL `/` would widen to double)
        sum(shiftright(col("df") * (col("df") - 1), 1)).as("c"),
        max(col("df")).as("m"))
      .head()
    DfProfile(row.getLong(0), row.getLong(1), row.getLong(2))
  }

  /** AUTO-ROUTED exact edges: the df profile decides naive vs
    * prefix-filtered — no manual variant selection, no semantics
    * change (both paths are exact, so the output is identical either
    * way; only the plan differs). LSH stays an explicit caller choice:
    * its probabilistic recall is a semantics change a router must
    * never make silently. */
  def edgesAuto(docs: DataFrame, num: Int, den: Int,
      hotFactor: Long = 8): DataFrame = {
    val d = docs.localCheckpoint() // profile + chosen path share one scan
    if (dfProfile(d).hot(hotFactor)) edges(d, num, den)
    else edgesNaive(d, num, den)
  }

  /** Exact Jaccard ≥ num/den verification over position-less candidate
    * pairs (e.g. [[candidatesAll]]'s):
    * |a∩b| / (n_a + n_b − |a∩b|) ≥ num/den ⟺
    * (den+num)·|a∩b| ≥ num·(n_a+n_b), integer-exact.
    *
    * Overlap is COUNTED, never intersected: candidates join the exploded
    * inverted index on id_a (skinny (doc_id, n, sh) rows — no array
    * payloads), then the b-side membership check is a hash join on
    * (doc_id, sh); each surviving row IS one shared element, so a
    * partial-aggregated count per pair gives |a∩b|. Shuffle volume is
    * Σ n_a over candidate pairs of 3-column rows plus the index itself.
    * Pairs with zero shared elements vanish in the inner join, which is
    * correct: num > 0 means they could never pass the threshold.
    * ([[edges]] is the cheaper fused path when candidates came from
    * [[pairStats]] and positions are known.) */
  def verify(cands: DataFrame, docs: DataFrame, num: Int, den: Int): DataFrame = {
    val inv = docs.select(col("doc_id"), col("n"), explode(col("sset")).as("sh"))
    cands.hint("shuffle_hash")
      .join(inv.select(col("doc_id").as("id_a"), col("n").as("n_a"),
        col("sh")), Seq("id_a"))
      .hint("shuffle_hash")
      .join(inv.select(col("doc_id").as("id_b"), col("n").as("n_b"),
        col("sh")), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      .filter(col("shared") * (den + num) >= (col("n_a") + col("n_b")) * num)
      .select("id_a", "id_b")
  }
}
