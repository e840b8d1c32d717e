package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) tables — the shuffle-free join path for
  * repeated fact⋈fact joins at 100 TB.
  *
  * A shuffle join moves BOTH sides over the network every time the join
  * runs. Bucketing pays that cost once at write time: both tables are
  * hash-partitioned into the same number of buckets on the join key, so
  * every future equi-join (and groupBy on the key) is map-side — the plan
  * shows SortMergeJoin with NO Exchange on either side. For a fact table
  * joined daily against its siblings (orders⋈lineitem-shaped workloads),
  * this converts the dominant per-query cost into a one-time layout cost.
  *
  * Spark-first notes:
  *  - bucketing requires `saveAsTable` (bucket metadata lives in the
  *    catalog, not the parquet footers);
  *  - bucket counts must match (or divide evenly with
  *    `spark.sql.bucketing.coalesceBucketsInJoin.enabled`);
  *  - at 100 TB pick bucket count ≈ total cores × small factor, so one
  *    bucket is one task and no task exceeds executor memory.
  */
object Bucketing {

  /** Write `df` as a catalog table bucketed (and sorted) by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet") // managed: lives under spark.sql.warehouse.dir
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — shuffle-free when
    * bucket layouts line up; use `assertNoExchange` in tests to pin it. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True when the executed plan contains no shuffle exchange — the
    * property bucketing exists to buy. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString().contains("Exchange hashpartitioning")
}
