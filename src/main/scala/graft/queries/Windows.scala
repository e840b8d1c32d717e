package graft.queries

import graft.{QueryFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function family (SURVEY.md §2.C-5).
  *
  * Scale notes: every window here partitions by a key (customer / user /
  * nation) — one shuffle on the partition key, then a per-partition sort;
  * no global sort, no driver materialization. Per-group top-k via
  * row_number is the 100 TB-safe form of "top 3 per customer" (the naive
  * self-join form is quadratic).
  *
  * Determinism (§7.5): window ORDER BY always carries a unique tie-break
  * column; frame-bounded sums are computed in DECIMAL; rank fractions
  * rounded to 6 digits. `events.ts` is a microsecond timestamp in both
  * engines — it appears here only as an ORDER BY key (identical total
  * order), never in output.
  */
object Windows extends QueryFamily {

  private def dec(c: String) = col(c).cast("decimal(12,4)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_topk_per_group" -> { (s, d) =>
      // top-3 orders per customer by price; row_number not rank so k is exact.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    },
    "q_win_rank" -> { (s, d) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .orderBy("c_nationkey", "rn")
    },
    "q_win_lag_lead" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"))
        .orderBy("event_id")
    },
    "q_win_moving_sum" -> { (s, d) =>
      // 3-row moving sum per user; DECIMAL so frame-accumulation order
      // can't produce FP drift between engines.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(-2, 0)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          sum(dec("value")).over(w).cast("double").as("moving_sum"))
        .orderBy("event_id")
    },
    "q_win_range_between" -> { (s, d) =>
      // RANGE frame over a numeric ordering key: all orders of the same
      // customer whose orderkey is within 5 below the current one.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderkey").asc)
        .rangeBetween(-5, 0)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec("o_totalprice")).over(w).cast("double").as("near_sum"),
          count(lit(1)).over(w).as("near_n"))
        .orderBy("o_orderkey")
    },
    "q_win_ignore_nulls" -> { (s, d) =>
      // lag/last_value over a sparse (nullable) series with IGNORE NULLS —
      // "previous known value" gap filling
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("big_val",
          when(col("value") >= 50, col("value")))
        .select(col("user_id"), col("event_id"),
          lag(col("big_val"), 1, null, ignoreNulls = true).over(w)
            .as("prev_big"),
          last(col("big_val"), ignoreNulls = true).over(w).as("last_big"))
        .orderBy("event_id")
    },
    "q_win_ntile" -> { (s, d) =>
      // GLOBAL ntile through operators.GlobalWindow — range-partitioned
      // parallel numbering + arithmetic tiling, never the
      // Exchange-SinglePartition plan a bare Window.orderBy produces
      // (GlobalWindowSpec pins equivalence to ntile().over; the plan
      // guard pins SinglePartition absent).
      graft.operators.GlobalWindow.ntile(
          Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice")),
          4, Seq(col("o_totalprice").asc, col("o_orderkey").asc),
          out = "quartile")
        .orderBy("o_orderkey")
    },
    "q_win_first_last" -> { (s, d) =>
      val wAll = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(wAll).as("first_order"),
          last(col("o_orderkey")).over(wAll).as("last_order"))
        .orderBy("o_orderkey")
    },
    "q_win_nth" -> { (s, d) =>
      val wAll = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          nth_value(col("o_orderkey"), 2).over(wAll).as("second_best"))
        .orderBy("o_orderkey")
    },
    "q_win_cume" -> { (s, d) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      // floor(x·1e6), not round(x, 6): rank fractions like 333/640 land
      // exactly on a .5 tie at the 6th decimal, and Spark (HALF_UP) and
      // DuckDB disagree on ties; floor of identical IEEE doubles can't.
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_custkey"),
          floor(percent_rank().over(w) * 1000000).cast("long").as("pr_u"),
          floor(cume_dist().over(w) * 1000000).cast("long").as("cd_u"))
        .orderBy("c_nationkey", "c_custkey")
    }
  )

  def oracle: Map[String, String] = Map(
    "q_win_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_win_rank" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  row_number() OVER w AS rn, rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey ASC)
        |ORDER BY c_nationkey, rn""".stripMargin,
    "q_win_lag_lead" ->
      """SELECT user_id, event_id, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY event_id""".stripMargin,
    "q_win_moving_sum" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(12,4))) OVER w AS DOUBLE) AS moving_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_win_range_between" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,4))) OVER w AS DOUBLE) AS near_sum,
        |  count(*) OVER w AS near_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey ASC
        |  RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q_win_ignore_nulls" ->
      """SELECT user_id, event_id,
        |  lag(big_val IGNORE NULLS) OVER w AS prev_big,
        |  last_value(big_val IGNORE NULLS) OVER w AS last_big
        |FROM (SELECT user_id, event_id, ts,
        |        CASE WHEN value >= 50 THEN value END AS big_val
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY event_id""".stripMargin,
    "q_win_ntile" ->
      """SELECT o_orderkey, o_totalprice,
        |  ntile(4) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_win_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey) OVER w AS last_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "q_win_nth" ->
      """SELECT o_custkey, o_orderkey,
        |  nth_value(o_orderkey, 2) OVER w AS second_best
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "q_win_cume" ->
      """SELECT c_nationkey, c_custkey,
        |  CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT) AS pr_u,
        |  CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cd_u
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey
        |  ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_nationkey, c_custkey""".stripMargin
  )
}
