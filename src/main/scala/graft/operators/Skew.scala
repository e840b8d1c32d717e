package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (SURVEY.md §7.2 M6: "salting for skewed
  * user_id"). AQE's skew-join split handles JOIN skew at runtime; these
  * handle AGGREGATION hot keys, where one reducer would otherwise receive
  * a hot key's entire traffic.
  *
  * Two-phase salted aggregation: rows are spread across `saltBuckets`
  * sub-keys, partially aggregated per (key, salt), then merged per key.
  * Both shuffles move pre-aggregated rows — the hot key costs
  * `saltBuckets` rows in the second shuffle instead of its full row count
  * in the first.
  */
object Skew {

  /** Re-aggregable aggregate specs: each knows its partial form and how
    * to merge partials (count merges with SUM, not count). Aggregates
    * that aren't decomposable this way (avg, distinct) are built from
    * these (avg = sum/count) or need sketches — enforced by the type. */
  sealed trait ReAgg { def partial: Column; def merge(partial: Column): Column }
  final case class CountRows() extends ReAgg {
    def partial: Column = count(lit(1))
    def merge(p: Column): Column = sum(p)
  }
  final case class SumOf(c: Column) extends ReAgg {
    def partial: Column = sum(c)
    def merge(p: Column): Column = sum(p)
  }
  final case class MinOf(c: Column) extends ReAgg {
    def partial: Column = min(c)
    def merge(p: Column): Column = min(p)
  }
  final case class MaxOf(c: Column) extends ReAgg {
    def partial: Column = max(c)
    def merge(p: Column): Column = max(p)
  }

  /** Deterministic spread (a random salt would break retry idempotence):
    * hash of the whole row PLUS spark_partition_id() — hot keys are often
    * exact-duplicate rows (identical events/transfers), and a row-content
    * hash alone would send every duplicate to ONE salt bucket, collapsing
    * the mitigation precisely for its target workload. Mixing in the input
    * partition id spreads duplicates across as many buckets as source
    * partitions while staying deterministic for a given scan split. */
  private[graft] def saltOf(df: DataFrame, saltBuckets: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*),
      spark_partition_id()), lit(saltBuckets))

  def saltedAgg(
      df: DataFrame,
      key: Column,
      saltBuckets: Int,
      aggs: Seq[(String, ReAgg)]): DataFrame = {
    require(saltBuckets > 0 && aggs.nonEmpty)
    val salted = df.withColumn("__salt", saltOf(df, saltBuckets))
    val phase1 = salted
      .groupBy(key.as("__key"), col("__salt"))
      .agg(aggs.head._2.partial.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, a) => a.partial.as(s"__p_$n") }: _*)
    phase1
      .groupBy(col("__key"))
      .agg(aggs.head._2.merge(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, a) => a.merge(col(s"__p_$n")).as(n) }: _*)
      .withColumnRenamed("__key", "key")
  }

  /** Zipf-head-hardened scoring join: `big` (a corpus-scaled instance
    * frame) ⋈ `small` (a vocab-sized scoring table) on `keys`, where a
    * handful of head keys own a constant fraction of the corpus — the
    * Zipf shape of token-keyed joins, whose hottest key's partition is
    * ~5% of the corpus at 100 TB (VERDICT r13 #3).
    *
    *  - `hot` (a caller-bounded subset of `small`, e.g. its top-K rows
    *    by frequency) joins map-side via broadcast — head rows never
    *    enter a key-partitioned exchange;
    *  - tail rows shuffle-hash-join the remaining table; the already-
    *    matched head rows ride the SAME exchange under a per-row
    *    (marker, key, `spread`) struct key, so they distribute by
    *    `spread` (e.g. doc_id) and can collide with nothing — the
    *    hottest surviving key's partition share is bounded by the
    *    caller's hot threshold BY CONSTRUCTION.
    *
    * Contract: `hot` ⊆ `small` with identical schema and bounded size;
    * every `big` key appears in `small` (the scoring table derives from
    * big's own corpus — a missing key would surface as a null score
    * where the plain inner join dropped the row, or as a runtime error
    * when `requireMatch` is set: scoring-join callers whose coverage is
    * an invariant should pass requireMatch=true so a contract violation
    * fails loudly instead of propagating null into aggregates); `small`
    * should be checkpointed by the caller (it is read twice: hot
    * anti-filter + cold side). Result ≡ the plain inner equi-join, row
    * for row — HeadSplitJoinSpec pins the equality on a synthetic Zipf
    * corpus, including concatenation-ambiguous composite keys. */
  private[graft] def headSplitJoin(big: DataFrame, small: DataFrame,
      keys: Seq[String], spread: Column, hot: DataFrame,
      requireMatch: Boolean = false): DataFrame = {
    val valCols = small.columns.filterNot(keys.contains).toSeq
    require(valCols.nonEmpty, "small must carry at least one value column")
    val hotT = broadcast(hot.select(
      keys.map(col) ++ valCols.map(c => col(c).as(s"__hot_$c")) :+
        lit(true).as("__hot_m"): _*))
    // exact set difference (not a predicate re-evaluation, so a hot set
    // chosen by top-K-with-ties stays consistent between the two sides)
    val cold = small.join(broadcast(hot.selectExpr(keys: _*)), keys,
      "left_anti")
    // 0x1F unit separator keeps composite keys unambiguous —
    // ("ab","c") must not collide with ("a","bc")
    def keyStr(cols: Seq[Column]) = concat_ws("\u001F", cols: _*)
    val coldT = cold.select(
      struct(lit(false).as("h"), keyStr(keys.map(col)).as("k"),
        lit(0L).as("s")).as("__sk") +:
        (valCols.map(c => col(c).as(s"__cold_$c")) :+
          lit(true).as("__cold_m")): _*)
    val tagged = big.join(hotT, keys, "left")
      .withColumn("__sk", struct(
        coalesce(col("__hot_m"), lit(false)).as("h"),
        keyStr(keys.map(col)).as("k"),
        when(col("__hot_m").isNotNull, spread.cast("long"))
          .otherwise(lit(0L)).as("s")))
    // requireMatch: fail row-side (distributed, no extra pass) when a
    // big key matched neither side — cheaper and louder than letting a
    // null score flow into a downstream sum()
    def valOf(c: String): Column = {
      val base = coalesce(col(s"__hot_$c"), col(s"__cold_$c"))
      if (!requireMatch) base.as(c)
      else when(col("__hot_m").isNull && col("__cold_m").isNull,
        raise_error(concat(lit("headSplitJoin: key ["),
          keyStr(keys.map(col)), lit("] missing from scoring table")))
          .cast(small.schema(c).dataType))
        .otherwise(base).as(c)
    }
    tagged.join(coldT.hint("shuffle_hash"), Seq("__sk"), "left")
      .select(big.columns.map(col).toSeq ++ valCols.map(valOf): _*)
  }

  /** Per-group top-k under skew: partial top-k per (key, salt) bounds the
    * final per-key sort input to saltBuckets·k rows. */
  def saltedTopK(
      df: DataFrame,
      key: Column,
      order: Column,
      k: Int,
      saltBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salted = df.withColumn("__salt", saltOf(df, saltBuckets))
    val w1 = Window.partitionBy(key, col("__salt")).orderBy(order)
    val partial = salted.withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k).drop("__rn", "__salt")
    val w2 = Window.partitionBy(key).orderBy(order)
    partial.withColumn("__rn", row_number().over(w2))
      .filter(col("__rn") <= k).drop("__rn")
  }
}
