package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join (Jaccard ≥ num/den) with ppjoin-style
  * prefix filtering — the exact-preserving fix for the hot-shingle
  * quadratic term in inverted-index candidate generation.
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
  * Xiao et al.'s ppjoin; both describe single-node algorithms — here the
  * df ranking is one partial-aggregated pass plus a per-doc window, and
  * every join is a hash shuffle on (element) or (doc_id).)
  *
  * All arithmetic is integer (thresholds as rationals), matching the
  * cascade's determinism discipline — no floats anywhere.
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
      .join(inv.select(col("sh"), col("doc_id").as("id_b")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Prefix-filtered candidates for Jaccard ≥ num/den: complete, and
    * immune to hot elements (they rank last by df and drop out of every
    * prefix). Prefix size is n − ⌈t·n⌉ + 1 (pure-integer ceil).
    *
    * The rarest-first ranking is computed by re-collecting each doc's
    * (df, element) pairs and array_sort-ing them in place rather than a
    * row_number window: the per-doc shuffle volume is identical, but the
    * sort is a bounded in-row operation instead of a whole-partition
    * window sort, and the prefix `slice` means only prefix elements are
    * ever exploded back out (the window form materialized every ranked
    * row first). (df, element) ordering is total, so the prefix set —
    * and therefore the candidate set — is deterministic either way. */
  def candidatesPrefix(docs: DataFrame, num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"threshold $num/$den not in (0,1]")
    val inv = docs.select(col("doc_id"), col("n"), explode(col("sset")).as("sh"))
    // global document frequency — one partial-aggregated pass over the
    // exploded index (shuffle carries (element, count), not instances)
    val df = inv.groupBy("sh").agg(count(lit(1)).as("df"))
    // prefix size: n − ⌈num·n/den⌉ + 1, as integers
    val prefixLen = (col("n") + lit(1) -
      floor((col("n") * num + den - 1) / den).cast("int")).cast("int")
    val prefix = inv.join(df, Seq("sh"))
      .groupBy(col("doc_id"), col("n"))
      .agg(collect_list(struct(col("df"), col("sh"))).as("elems"))
      .select(col("doc_id"),
        explode(slice(array_sort(col("elems")), lit(1), prefixLen))
          .as("pref"))
      .select(col("pref.sh").as("sh"), col("doc_id"))
    prefix.select(col("sh"), col("doc_id").as("id_a"))
      .join(prefix.select(col("sh"), col("doc_id").as("id_b")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact Jaccard ≥ num/den verification over candidate pairs:
    * |a∩b| / (n_a + n_b − |a∩b|) ≥ num/den ⟺
    * (den+num)·|a∩b| ≥ num·(n_a+n_b), integer-exact. Two hash joins on
    * doc_id attach the sets; candidate volume, never corpus². */
  def verify(cands: DataFrame, docs: DataFrame, num: Int, den: Int): DataFrame =
    cands
      .join(docs.select(col("doc_id").as("id_a"), col("sset").as("set_a"),
        col("n").as("n_a")), Seq("id_a"))
      .join(docs.select(col("doc_id").as("id_b"), col("sset").as("set_b"),
        col("n").as("n_b")), Seq("id_b"))
      .withColumn("shared", size(array_intersect(col("set_a"), col("set_b"))))
      .filter(col("shared") * (den + num) >= (col("n_a") + col("n_b")) * num)
      .select("id_a", "id_b")
}
