package graft.queries

import graft.{QueryFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan / project / filter family (SURVEY.md §2.C-1) plus the reference's
  * ingest-analog ops restated as batch queries (§2.C-2):
  *  - q_range_partition is the block-range partitioner math of
  *    reference parquet/sinker/partitioner.go:20-32 applied to event_id.
  * Filters and projections here are deliberately plain so Catalyst pushes
  * them into the parquet scan (PushedFilters / ReadSchema).
  */
object Scans extends QueryFamily {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_filter" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    },
    "q_scan_project" -> { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          round(col("o_totalprice").cast("decimal(18,4)") * lit(2), 4)
            .cast("double").as("double_price"))
        .orderBy("o_orderkey")
    },
    "q_scan_topk" -> { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(50)
    },
    "q_range_partition" -> { (s, d) =>
      // floor((x - start)/size) bucket math; clamp semantics tested in
      // PartitionerSpec — here the oracle checks the bucketing itself.
      val start = 0L; val size = 500L
      Tables.events(s, d)
        .select(
          col("event_id"),
          (lit(start) + floor((col("event_id") - start) / size) * size)
            .cast("long").as("range_start"))
        .groupBy("range_start")
        .agg(count(lit(1)).as("n_rows"),
             min("event_id").as("min_id"),
             max("event_id").as("max_id"))
        .orderBy("range_start")
    }
  )

  def oracle: Map[String, String] = Map(
    "q_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_scan_project" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(round(CAST(o_totalprice AS DECIMAL(18,4)) * 2, 4) AS DOUBLE) AS double_price
        |FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_orderkey""".stripMargin,
    "q_scan_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 50""".stripMargin,
    "q_range_partition" ->
      """SELECT 0 + CAST(floor((event_id - 0) / 500) AS BIGINT) * 500 AS range_start,
        |  count(*) AS n_rows, min(event_id) AS min_id, max(event_id) AS max_id
        |FROM events GROUP BY 1 ORDER BY range_start""".stripMargin
  )
}
