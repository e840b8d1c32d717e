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
