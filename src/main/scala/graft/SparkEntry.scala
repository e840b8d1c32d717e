package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are grouped in `graft.queries.*` family objects; each family is
  * declared here only once every member hash-matches its DuckDB oracle.
  */
object SparkEntry {

  private def families: Seq[QueryFamily] = Seq(
    q.Scans,
    q.Aggs,
    q.Joins,
    q.Windows,
    q.SetOps,
    q.Scalars,
    q.Streaming,
    q.Behavior,
    q.Llm,
    q.Pipeline,
    q.Graph,
    q.Quality,
    q.Lakehouse
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q.Aggs.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    families.flatMap(_.oracle).toMap
}
