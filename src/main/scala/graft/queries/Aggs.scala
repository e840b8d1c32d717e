package graft.queries

import graft.{QueryFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation family (SURVEY.md §2.C-4): hash aggregation with partial
  * (map-side) + final split — free from Catalyst; grouping sets / rollup /
  * cube; distinct aggregation.
  *
  * Determinism (§7.5): money/quantity summed as DECIMAL(18,4) so the result
  * is independent of partial-aggregation order; averages emitted as
  * round(exact_decimal_sum / count, 6) doubles.
  */
object Aggs extends QueryFamily {

  private def dec(c: String) = col(c).cast("decimal(18,4)")

  /** Flagship: TPC-H Q1 pricing summary shape on lineitem.
    *
    * Decimal discipline: products are kept inside Spark's exact 38-digit
    * range — price as DECIMAL(12,4), the (1±x) factors as DECIMAL(8,4) —
    * so (12,4)×(8,4)×(8,4) → (30,12) with NO precision-loss rounding and
    * the sums match DuckDB bit-for-bit.
    */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame = {
    val price = col("l_extendedprice").cast("decimal(12,4)")
    val discF = (lit(1) - dec("l_discount")).cast("decimal(8,4)")
    val taxF = (lit(1) + dec("l_tax")).cast("decimal(8,4)")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        // round() before fixing the scale: DuckDB's decimal downscale CAST
        // truncates, Spark's rounds — round(x, s) agrees on both engines.
        round(sum(price * discF), 4).cast("double").as("sum_disc_price"),
        round(sum(price * discF * taxF), 4).cast("double").as("sum_charge"),
        // floor(x·1e6) not round(x, 6): decimal_sum/count is a rational
        // whose double can land exactly on a rounding tie, where Spark
        // (HALF_UP) and DuckDB disagree; floor of identical doubles can't
        floor(sum(dec("l_quantity")).cast("double") / count(lit(1)) * 1000000)
          .cast("long").as("avg_qty_u"),
        floor(sum(dec("l_extendedprice")).cast("double") / count(lit(1)) * 1000000)
          .cast("long").as("avg_price_u"),
        floor(sum(dec("l_discount")).cast("double") / count(lit(1)) * 1000000)
          .cast("long").as("avg_disc_u"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q_agg_distinct" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },
    "q_agg_having" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
             sum(dec("o_totalprice")).cast("double").as("total_spent"))
        .filter(col("n_orders") >= 3)
        .orderBy("o_custkey")
    },
    "q_agg_rollup" -> { (s, d) =>
      val n = Tables.nation(s, d).as("n")
      val r = Tables.region(s, d).as("r")
      val c = Tables.customer(s, d).as("c")
      c.join(broadcast(n), col("c.c_nationkey") === col("n.n_nationkey"))
        .join(broadcast(r), col("n.n_regionkey") === col("r.r_regionkey"))
        .select(col("r.r_name").as("r_name"), col("n.n_name").as("n_name"),
                col("c.c_acctbal").as("c_acctbal"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
             sum(dec("c_acctbal")).cast("double").as("sum_bal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },
    "q_agg_cube" -> { (s, d) =>
      val o = Tables.orders(s, d)
      o.cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
             sum(dec("o_totalprice")).cast("double").as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first)
    },
    "q_agg_grouping_sets" -> { (s, d) =>
      // grouping() disambiguates real NULLs from rollup NULLs.
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  grouping(o_orderstatus) AS g_status,
          |  grouping(o_orderpriority) AS g_prio,
          |  count(*) AS n
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY g_status, g_prio,
          |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    },
    "q_agg_approx" -> { (s, d) =>
      // HLL++ approximate distinct (SURVEY.md §2.B aggregations row). No
      // DuckDB oracle — sketch implementations differ across engines —
      // so this is declared rows-only; AggsSpec pins the relative error
      // against exact count_distinct.
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), rsd = 0.01).as("approx_parts"),
             countDistinct(col("l_partkey")).as("exact_parts"))
        .orderBy("l_returnflag")
    },
    "q2_min_acctbal" -> { (s, d) =>
      // TPC-H Q2 shape: correlated scalar-aggregate subquery in WHERE —
      // suppliers carrying their nation's minimum account balance.
      // Catalyst rewrites the correlation into an aggregate + join
      // (RewriteCorrelatedScalarSubquery); no driver-side loop.
      Tables.supplier(s, d).createOrReplaceTempView("supplier_q2")
      s.sql(
        """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
          |FROM supplier_q2 s
          |WHERE s_acctbal = (SELECT min(s2.s_acctbal)
          |                   FROM supplier_q2 s2
          |                   WHERE s2.s_nationkey = s.s_nationkey)
          |ORDER BY s_suppkey""".stripMargin)
    },
    "q18_large_orders" -> { (s, d) =>
      // TPC-H Q18 shape: IN-subquery over a grouped HAVING — orders whose
      // total quantity exceeds a threshold, with customer context.
      // Catalyst plans the IN as a left-semi join against the aggregate.
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q18")
      Tables.orders(s, d).createOrReplaceTempView("orders_q18")
      Tables.customer(s, d).createOrReplaceTempView("customer_q18")
      s.sql(
        """SELECT c_custkey, c_name, o_orderkey,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
          |FROM customer_q18
          |JOIN orders_q18 ON c_custkey = o_custkey
          |JOIN lineitem_q18 ON o_orderkey = l_orderkey
          |WHERE o_orderkey IN (
          |  SELECT l_orderkey FROM lineitem_q18
          |  GROUP BY l_orderkey
          |  HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 120)
          |GROUP BY c_custkey, c_name, o_orderkey
          |ORDER BY total_qty DESC, o_orderkey ASC""".stripMargin)
    },
    "q7_volume_shipping" -> { (s, d) =>
      // TPC-H Q7 shape: supplier-nation ↔ customer-nation trade volume by
      // ship year for a fixed nation pair, either direction. Disjunctive
      // nation filter + 5-way join + (nation, nation, year) aggregation.
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), su("s_nationkey") === n1("s_nk"))
        .join(broadcast(n2), c("c_nationkey") === n2("c_nk"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
                (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(12,4)") *
            (lit(1) - dec("l_discount")).cast("decimal(8,4)")), 4)
          .cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    "q10_returned_items" -> { (s, d) =>
      // TPC-H Q10 shape: revenue lost to returns per customer, top 20 —
      // selective fact filter, 3-way join, aggregate, global top-k.
      val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(12,4)") *
            (lit(1) - dec("l_discount")).cast("decimal(8,4)")), 4)
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },
    "q5_local_supplier" -> { (s, d) =>
      // TPC-H Q5 shape: 6-way join with the local-supplier constraint
      // (customer and supplier in the SAME nation) — the join-order /
      // broadcast stress test.
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey") &&
          su("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(12,4)") *
            (lit(1) - col("l_discount").cast("decimal(12,4)"))
              .cast("decimal(8,4)")), 4)
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    },
    "q_agg_stats" -> { (s, d) =>
      // statistical aggregates; stddev rounded to 2 (Welford merge order
      // differs across engines at ~1e-9 abs), corr to 6 (bounded [-1,1])
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_extendedprice")), 2).as("std_price"),
          round(stddev_pop(col("l_quantity")), 6).as("stdp_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("qty_price_corr"))
        .orderBy("l_returnflag")
    },
    "q_agg_bool" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          bool_and(col("l_quantity") > 0).as("all_positive"),
          bool_or(col("l_discount") > 0.05).as("any_discounted"),
          count_if(col("l_tax") > 0.04).as("n_taxed"))
        .orderBy("l_returnflag")
    },
    "q_agg_percentile" -> { (s, d) =>
      // exact interpolated percentiles (Spark `percentile` ↔ DuckDB
      // quantile_cont); rounded per §7.5
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90_price"),
          round(expr("percentile(l_extendedprice, array(0.25, 0.75))[1]"), 6)
            .as("p75_price"))
        .orderBy("l_returnflag")
    },
    "q_agg_collect" -> { (s, d) =>
      // ordered list / string aggregation (collect_list ↔ DuckDB list();
      // §7.5: never without array_sort)
      Tables.orders(s, d)
        .filter(col("o_custkey") < 30)
        .groupBy("o_custkey")
        .agg(
          // joined to a scalar string: the harness compare can't sort/hash
          // list-typed cells (CORRECTNESS_r01: unhashable ndarray)
          concat_ws(",", array_sort(collect_list(col("o_orderkey"))))
            .as("order_keys"),
          concat_ws(",", array_sort(collect_list(col("o_orderstatus"))))
            .as("statuses"))
        .orderBy("o_custkey")
    },
    "q_unpivot" -> { (s, d) =>
      // wide → long reshape (unpivot/melt ↔ DuckDB UNPIVOT)
      Tables.supplier(s, d)
        .select(col("s_suppkey"),
          col("s_nationkey").cast("double").as("nation"),
          col("s_acctbal").as("acctbal"))
        .unpivot(Array(col("s_suppkey")), Array(col("nation"), col("acctbal")),
          "metric", "value")
        .orderBy("s_suppkey", "metric")
    },
    "q3_shipping_priority" -> { (s, d) =>
      // TPC-H Q3 shape: selective filters on both sides of a 3-way join,
      // revenue aggregation, top-10 — the canonical composite query.
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(12,4)") *
            (lit(1) - dec("l_discount")).cast("decimal(8,4)")), 4)
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    },
    "q4_priority_count" -> { (s, d) =>
      // TPC-H Q4 shape: EXISTS-correlated subquery → left-semi join with
      // an extra non-equi conjunct (late shipment), count per priority.
      // (Fixtures lack l_commitdate; lateness = shipped after order date.)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      val l = Tables.lineitem(s, d)
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },
    "q6_forecast_revenue" -> { (s, d) =>
      // TPC-H Q6 shape: pure filter-aggregate over the fact table — the
      // scan-efficiency query (predicate pushdown + no shuffle at all
      // beyond the final single-row combine).
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice").cast("decimal(12,4)") *
            dec("l_discount").cast("decimal(8,4)")), 4)
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },
    "q12_late_priority" -> { (s, d) =>
      // TPC-H Q12 shape: join + CONDITIONAL aggregation (CASE inside
      // SUM) — priority mix of late shipments per line status.
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") > o("o_orderdate"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy("l_linestatus")
    },
    "q14_promo_revenue" -> { (s, d) =>
      // TPC-H Q14 shape: conditional revenue RATIO (promo share of a
      // month's revenue). Both sums decimal-exact and rounded before the
      // one double division; ratio floor-scaled (§7.5).
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      val p = Tables.part(s, d)
      val rev = col("l_extendedprice").cast("decimal(12,4)") *
        (lit(1) - dec("l_discount")).cast("decimal(8,4)")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg(
          round(sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast("decimal(12,4)"))), 4).as("promo"),
          round(sum(rev), 4).as("total"))
        .select(
          col("promo").cast("double").as("promo_revenue"),
          col("total").cast("double").as("total_revenue"),
          floor(col("promo").cast("double") * 100000000L /
            col("total").cast("double")).cast("long").as("promo_pct_u"))
    },
    "q19_disjunctive_revenue" -> { (s, d) =>
      // TPC-H Q19 shape: OR of brand/size/quantity conjunction bands
      // inside the join — the disjunctive-predicate planning test (each
      // disjunct must still prune; the join stays a broadcast hash join
      // on the equi-key with the disjunction as a post-join filter).
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      val bands =
        (p("p_brand") === "Brand#12" && p("p_size").between(1, 5) &&
          l("l_quantity").between(1, 11)) ||
        (p("p_brand") === "Brand#23" && p("p_size").between(1, 10) &&
          l("l_quantity").between(10, 20)) ||
        (p("p_brand") === "Brand#4" && p("p_size").between(1, 15) &&
          l("l_quantity").between(20, 30))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey") && bands)
        .agg(round(sum(col("l_extendedprice").cast("decimal(12,4)") *
            (lit(1) - dec("l_discount")).cast("decimal(8,4)")), 4)
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },
    "q8_market_share" -> { (s, d) =>
      // TPC-H Q8 shape: one nation's share of regional promo volume per
      // year — 8-way join, conditional decimal sums, one double division
      // per group (floor-scaled). Dims broadcast; lineitem⋈orders is the
      // only fact shuffle.
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q8")
      Tables.orders(s, d).createOrReplaceTempView("orders_q8")
      Tables.customer(s, d).createOrReplaceTempView("customer_q8")
      Tables.supplier(s, d).createOrReplaceTempView("supplier_q8")
      Tables.nation(s, d).createOrReplaceTempView("nation_q8")
      Tables.region(s, d).createOrReplaceTempView("region_q8")
      Tables.part(s, d).createOrReplaceTempView("part_q8")
      s.sql(q8Sql("lineitem_q8", "orders_q8", "customer_q8", "supplier_q8",
        "nation_q8", "region_q8", "part_q8"))
    },
    "q9_product_profit" -> { (s, d) =>
      // TPC-H Q9 shape over the derived partsupp (see partsuppCte): the
      // 6-way join shuffles lineitem once on (partkey, suppkey) for the
      // partsupp probe; part/supplier/nation broadcast.
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q9")
      Tables.orders(s, d).createOrReplaceTempView("orders_q9")
      Tables.part(s, d).createOrReplaceTempView("part_q9")
      Tables.supplier(s, d).createOrReplaceTempView("supplier_q9")
      Tables.nation(s, d).createOrReplaceTempView("nation_q9")
      s.sql(q9Sql("lineitem_q9", "orders_q9", "part_q9", "supplier_q9",
        "nation_q9"))
    },
    "q11_important_stock" -> { (s, d) =>
      // TPC-H Q11 shape: two aggregations over the same derived-dim CTE
      // + an uncorrelated scalar-subquery threshold, exact-integer.
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q11")
      Tables.supplier(s, d).createOrReplaceTempView("supplier_q11")
      Tables.nation(s, d).createOrReplaceTempView("nation_q11")
      s.sql(q11Sql("lineitem_q11", "supplier_q11", "nation_q11"))
    },
    "q16_parts_suppliers" -> { (s, d) =>
      // TPC-H Q16 shape: count(DISTINCT) per profile + NOT IN anti join.
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q16")
      Tables.part(s, d).createOrReplaceTempView("part_q16")
      Tables.supplier(s, d).createOrReplaceTempView("supplier_q16")
      s.sql(q16Sql("lineitem_q16", "part_q16", "supplier_q16"))
    },
    "q20_promotable_stock" -> { (s, d) =>
      // TPC-H Q20 shape: nested IN-subqueries (semi joins) over the
      // derived partsupp and a grouped shipped-quantity subquery.
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q20")
      Tables.part(s, d).createOrReplaceTempView("part_q20")
      Tables.supplier(s, d).createOrReplaceTempView("supplier_q20")
      Tables.nation(s, d).createOrReplaceTempView("nation_q20")
      s.sql(q20Sql("lineitem_q20", "part_q20", "supplier_q20", "nation_q20"))
    },
    "q13_order_distribution" -> { (s, d) =>
      // TPC-H Q13 shape: histogram of per-customer order counts — LEFT
      // join with an extra join-side predicate (so zero-order customers
      // stay), two-level aggregation.
      Tables.customer(s, d).createOrReplaceTempView("customer_q13")
      Tables.orders(s, d).createOrReplaceTempView("orders_q13")
      s.sql(q13Sql("customer_q13", "orders_q13"))
    },
    "q15_top_supplier" -> { (s, d) =>
      // TPC-H Q15 shape: per-supplier quarterly revenue, then the
      // max-revenue supplier(s) via an uncorrelated scalar subquery over
      // the SAME derived table (the view-reuse query).
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q15")
      Tables.supplier(s, d).createOrReplaceTempView("supplier_q15")
      s.sql(q15Sql("lineitem_q15", "supplier_q15"))
    },
    "q17_small_qty_revenue" -> { (s, d) =>
      // TPC-H Q17 shape: brand lines below 20% of their part's average
      // quantity. The correlated avg is restated DIVISION-FREE
      // (qty·5·count < sum) so the comparison is exact-integer in both
      // engines (quantities are integral; no float-average rounding).
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q17")
      Tables.part(s, d).createOrReplaceTempView("part_q17")
      s.sql(q17Sql("lineitem_q17", "part_q17"))
    },
    "q21_waiting_supplier" -> { (s, d) =>
      // TPC-H Q21 shape: the supplier that alone held up a multi-supplier
      // order — per-(order, supplier) lateness rollup, per-order counts,
      // then the unique-late filter. (Fixtures lack l_commitdate /
      // receiptdate; late = shipped after the order date, as in q4/q12.)
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q21")
      Tables.orders(s, d).createOrReplaceTempView("orders_q21")
      Tables.supplier(s, d).createOrReplaceTempView("supplier_q21")
      s.sql(q21Sql("lineitem_q21", "orders_q21", "supplier_q21"))
    },
    "q22_dormant_customers" -> { (s, d) =>
      // TPC-H Q22 shape: scalar-subquery threshold (average positive
      // balance — kept EXACT as decimal-sum/count, one double division)
      // + anti join (high-balance customers with no RECENT orders —
      // dormant accounts), aggregated per nation.
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      val thresh = c.filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(12,2)")).cast("double") /
          count(lit(1))).as("avg_pos"))
      c.crossJoin(broadcast(thresh))
        .filter(col("c_acctbal") > col("avg_pos"))
        .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_custs"),
          round(sum(col("c_acctbal").cast("decimal(12,2)")), 2)
            .cast("double").as("total_bal"))
        .orderBy("c_nationkey")
    },
    "q_agg_minmax" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"),
          min("l_shipdate").as("min_ship"),
          max("l_shipdate").as("max_ship"))
        .orderBy("l_linestatus")
    },
    "q_agg_topk_custom" -> { (s, d) =>
      // Custom typed Aggregator (graft.functions.TopKAggregator) as a
      // declared query: per-group top-3 by price through the
      // bounded-state partial/merge path (each partition keeps only k
      // candidates — the shuffle carries k rows per group per partition,
      // never the group's full traffic). Oracle = the row_number window
      // form, proving the custom aggregate is value-identical.
      import s.implicits._
      val ds = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
          col("l_extendedprice").as("score"))
        .as[(String, Long, Double)]
      ds.groupByKey(_._1)
        .mapValues(t => graft.functions.TopKAggregator.Scored(t._2, t._3))
        .agg(graft.functions.TopKAggregator.topK(3).toColumn.name("top"))
        .flatMap { case (flag, top) => top.zipWithIndex.map {
          case (sc, i) => (flag, i + 1, sc.id, sc.score) } }
        .toDF("flag", "rnk", "id", "score")
        .orderBy("flag", "rnk")
    },
    "q_agg_salted" -> { (s, d) =>
      // Hot-key-safe aggregation via graft.operators.Skew: two-phase
      // salted groupBy — the oracle is the PLAIN group-by, proving the
      // salt/merge decomposition is value-identical. All aggregates are
      // re-aggregable and integer/extremum-valued (a salted double sum
      // would be aggregation-order-dependent); value cents via floor.
      val ev = Tables.events(s, d)
        .select(col("user_id"),
          col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"))
      graft.operators.Skew.saltedAgg(ev, col("user_id"), saltBuckets = 16,
          Seq("n_events" -> graft.operators.Skew.CountRows(),
            "sum_cents" -> graft.operators.Skew.SumOf(col("cents")),
            "min_event" -> graft.operators.Skew.MinOf(col("event_id")),
            "max_event" -> graft.operators.Skew.MaxOf(col("event_id"))))
        .withColumnRenamed("key", "user_id")
        .orderBy("user_id")
    }
  )

  /** The fixtures ship no partsupp table, so the four TPC-H composites
    * that need one (Q9/Q11/Q16/Q20) DERIVE it — identically in both
    * engines, inside the shared SQL text: ps keys are the distinct
    * (l_partkey, l_suppkey) pairs actually traded (so the double-key
    * joins carry real traffic, as dbgen guarantees), and availqty/
    * supplycost are modular functions of the keys — pure integer
    * arithmetic, bit-equal across engines. At scale the derivation is
    * one partial-aggregated DISTINCT over 16-byte key pairs. */
  private def partsuppCte(l: String): String =
    s"""partsupp AS (
       |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
       |    CAST((l_partkey * 7 + l_suppkey * 11) % 9999 + 1 AS BIGINT)
       |      AS ps_availqty,
       |    CAST((l_partkey * 31 + l_suppkey * 17) % 900 + 100 AS BIGINT)
       |      AS ps_supplycost
       |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM $l))""".stripMargin

  private def q9Sql(l: String, o: String, p: String, su: String,
      n: String): String =
    // TPC-H Q9 shape: profit = revenue − supply cost per nation × year.
    // Revenue decimals follow the q1/q8 discipline; the cost term is
    // integer supplycost × integral quantity — double-exact, fixed to
    // DECIMAL(18,4) before entering the sum.
    s"""WITH ${partsuppCte(l)}
       |SELECT nation, o_year, CAST(round(profit, 4) AS DOUBLE) AS sum_profit
       |FROM (
       |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
       |    sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
       |        CAST(1 - CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(8,4))
       |      - CAST(ps_supplycost * l_quantity AS DECIMAL(18,4))) AS profit
       |  FROM $l
       |  JOIN $o ON o_orderkey = l_orderkey
       |  JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
       |  JOIN $p ON p_partkey = l_partkey AND p_name LIKE '%widget%'
       |  JOIN $su ON s_suppkey = l_suppkey
       |  JOIN $n ON s_nationkey = n_nationkey
       |  GROUP BY n_name, year(o_orderdate))
       |ORDER BY nation, o_year DESC""".stripMargin

  private def q11Sql(l: String, su: String, n: String): String =
    // TPC-H Q11 shape: per-part stock value in a nation group, kept when
    // above 0.1% of the total (the value × 1000 > total form keeps the
    // comparison in exact integers on both engines).
    s"""WITH ${partsuppCte(l)},
       |val AS (
       |  SELECT ps_partkey, sum(ps_supplycost * ps_availqty) AS v
       |  FROM partsupp
       |  JOIN $su ON ps_suppkey = s_suppkey
       |  JOIN $n ON s_nationkey = n_nationkey
       |  WHERE n_name IN ('NATION_3', 'NATION_7')
       |  GROUP BY ps_partkey)
       |SELECT ps_partkey, CAST(v AS BIGINT) AS stock_value
       |FROM val
       |WHERE v * 1000 > (SELECT sum(v) FROM val)
       |ORDER BY stock_value DESC, ps_partkey""".stripMargin

  private def q16Sql(l: String, p: String, su: String): String =
    // TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    // profile, excluding one brand/type band and "complaint" suppliers
    // (fixtures lack s_comment; negative account balance stands in).
    s"""WITH ${partsuppCte(l)}
       |SELECT p_brand, p_type, p_size,
       |  count(DISTINCT ps_suppkey) AS supplier_cnt
       |FROM partsupp
       |JOIN $p ON p_partkey = ps_partkey
       |WHERE p_brand <> 'Brand#3' AND p_type <> 'SMALL'
       |  AND p_size IN (1, 6, 11, 16, 21)
       |  AND ps_suppkey NOT IN (
       |    SELECT s_suppkey FROM $su WHERE s_acctbal < 0)
       |GROUP BY p_brand, p_type, p_size
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  private def q20Sql(l: String, p: String, su: String, n: String): String =
    // TPC-H Q20 shape: suppliers in a nation group holding overstock
    // (availqty above what they shipped of promotable parts in 1996) —
    // nested IN-subqueries decorrelate to semi joins; the quantity
    // comparison is exact-integer (quantities are integral).
    s"""WITH ${partsuppCte(l)}
       |SELECT s_suppkey, s_name
       |FROM $su JOIN $n ON s_nationkey = n_nationkey
       |WHERE n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3',
       |                 'NATION_4') AND s_suppkey IN (
       |  SELECT ps_suppkey FROM partsupp
       |  JOIN (SELECT l_partkey, l_suppkey,
       |          CAST(sum(l_quantity) AS BIGINT) AS qty
       |        FROM $l
       |        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |          AND l_shipdate < TIMESTAMP '1997-01-01'
       |        GROUP BY l_partkey, l_suppkey) sold
       |    ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
       |  WHERE ps_partkey IN (
       |      SELECT p_partkey FROM $p WHERE p_name LIKE '%bolt%')
       |    AND ps_availqty > qty)
       |ORDER BY s_suppkey""".stripMargin

  /** Q8/Q9/Q11/Q13/Q15/Q16/Q17/Q20/Q21 run the SAME SQL text on both
    * engines (table names parameterized: temp views on Spark, parquet
    * files in DuckDB) — textual parity removes a whole class of
    * translation drift. */
  private def q8Sql(l: String, o: String, c: String, su: String,
      n: String, r: String, p: String): String =
    s"""SELECT o_year,
       |  CAST(round(sum_target, 4) AS DOUBLE) AS target_vol,
       |  CAST(round(sum_all, 4) AS DOUBLE) AS total_vol,
       |  CAST(floor(CAST(round(sum_target, 4) AS DOUBLE) * 1000000
       |    / CAST(round(sum_all, 4) AS DOUBLE)) AS BIGINT) AS share_u
       |FROM (
       |  SELECT year(o_orderdate) AS o_year,
       |    sum(CASE WHEN n2.n_name = 'NATION_5' THEN
       |      CAST(l_extendedprice AS DECIMAL(12,4)) *
       |        CAST(1 - CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(8,4))
       |      ELSE CAST(0 AS DECIMAL(12,4)) END) AS sum_target,
       |    sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
       |      CAST(1 - CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(8,4)))
       |      AS sum_all
       |  FROM $l
       |  JOIN $o ON l_orderkey = o_orderkey
       |  JOIN $c ON o_custkey = c_custkey
       |  JOIN $n n1 ON c_nationkey = n1.n_nationkey
       |  JOIN $r ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
       |  JOIN $p ON l_partkey = p_partkey AND p_type = 'PROMO'
       |  JOIN $su ON l_suppkey = s_suppkey
       |  JOIN $n n2 ON s_nationkey = n2.n_nationkey
       |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
       |    AND o_orderdate < TIMESTAMP '1998-01-01'
       |  GROUP BY year(o_orderdate))
       |ORDER BY o_year""".stripMargin

  private def q13Sql(c: String, o: String): String =
    s"""SELECT n_orders, count(*) AS n_custs FROM (
       |  SELECT c_custkey, count(o_orderkey) AS n_orders
       |  FROM $c LEFT JOIN $o ON c_custkey = o_custkey
       |    AND o_orderpriority <> '1-URGENT'
       |  GROUP BY c_custkey)
       |GROUP BY n_orders ORDER BY n_orders""".stripMargin

  private def q15Sql(l: String, su: String): String =
    s"""WITH rev AS (
       |  SELECT l_suppkey AS supplier_no,
       |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
       |      CAST(1 - CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(8,4))),
       |      4) AS DOUBLE) AS total_rev
       |  FROM $l
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate < TIMESTAMP '1996-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_rev
       |FROM $su JOIN rev ON s_suppkey = supplier_no
       |WHERE total_rev = (SELECT max(total_rev) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  private def q17Sql(l: String, p: String): String =
    // The two correlated scalar subqueries of the textbook Q17 decorrelate
    // into TWO separate aggregate+join passes over lineitem; one grouped
    // subquery computing (count, sum) per partkey halves the lineitem work
    // — a single partial-aggregated rollup, joined once.
    s"""SELECT
       |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))), 4)
       |    AS DOUBLE) AS total_price,
       |  count(*) AS n_items
       |FROM $l
       |JOIN $p ON p_partkey = l_partkey
       |JOIN (SELECT l_partkey AS agg_pk, count(*) AS part_cnt,
       |        sum(l_quantity) AS part_qty
       |      FROM $l GROUP BY l_partkey) part_stats
       |  ON agg_pk = l_partkey
       |WHERE p_brand = 'Brand#12'
       |  AND l_quantity * 5 * part_cnt < part_qty""".stripMargin

  private def q21Sql(l: String, o: String, su: String): String =
    s"""WITH ol AS (
       |  SELECT l_orderkey, l_suppkey,
       |    max(CASE WHEN l_shipdate > o_orderdate THEN 1 ELSE 0 END)
       |      AS late
       |  FROM $l JOIN $o ON l_orderkey = o_orderkey
       |  WHERE o_orderstatus = 'F'
       |  GROUP BY l_orderkey, l_suppkey),
       |agg AS (
       |  SELECT l_orderkey, count(*) AS n_supp,
       |    CAST(sum(late) AS BIGINT) AS n_late
       |  FROM ol GROUP BY l_orderkey)
       |SELECT s_name, count(*) AS numwait
       |FROM ol
       |JOIN agg ON ol.l_orderkey = agg.l_orderkey
       |JOIN $su ON s_suppkey = ol.l_suppkey
       |WHERE agg.n_supp >= 2 AND agg.n_late = 1 AND ol.late = 1
       |GROUP BY s_name
       |ORDER BY numwait DESC, s_name""".stripMargin

  def oracle: Map[String, String] = Map(
    "q8_market_share" -> q8Sql("lineitem", "orders", "customer", "supplier",
      "nation", "region", "part"),
    "q9_product_profit" -> q9Sql("lineitem", "orders", "part", "supplier",
      "nation"),
    "q11_important_stock" -> q11Sql("lineitem", "supplier", "nation"),
    "q16_parts_suppliers" -> q16Sql("lineitem", "part", "supplier"),
    "q20_promotable_stock" -> q20Sql("lineitem", "part", "supplier",
      "nation"),
    "q13_order_distribution" -> q13Sql("customer", "orders"),
    "q15_top_supplier" -> q15Sql("lineitem", "supplier"),
    "q17_small_qty_revenue" -> q17Sql("lineitem", "part"),
    "q21_waiting_supplier" -> q21Sql("lineitem", "orders", "supplier"),
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - CAST(l_discount AS DOUBLE) AS DECIMAL(8,4))), 4) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - CAST(l_discount AS DOUBLE) AS DECIMAL(8,4)) * CAST(1 + CAST(l_tax AS DOUBLE) AS DECIMAL(8,4))), 4) AS DOUBLE) AS sum_charge,
        |  CAST(floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) * 1000000) AS BIGINT) AS avg_qty_u,
        |  CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) * 1000000) AS BIGINT) AS avg_price_u,
        |  CAST(floor(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) * 1000000) AS BIGINT) AS avg_disc_u,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spent
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 3
        |ORDER BY o_custkey""".stripMargin,
    "q_agg_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  grouping(o_orderstatus) AS g_status,
        |  grouping(o_orderpriority) AS g_prio,
        |  count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio,
        |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q2_min_acctbal" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier s
        |WHERE s_acctbal = (SELECT min(s2.s_acctbal)
        |                   FROM supplier s2
        |                   WHERE s2.s_nationkey = s.s_nationkey)
        |ORDER BY s_suppkey""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 120)
        |GROUP BY c_custkey, c_name, o_orderkey
        |ORDER BY total_qty DESC, o_orderkey ASC""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
        |    CAST(1 - CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(8,4))), 4)
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
        |    CAST(1 - CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(8,4))), 4)
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
        |    CAST(1 - CAST(l_discount AS DECIMAL(12,4)) AS DECIMAL(8,4))), 4)
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_extendedprice), 2) AS std_price,
        |  round(stddev_pop(l_quantity), 6) AS stdp_qty,
        |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_bool" ->
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 0) AS all_positive,
        |  bool_or(l_discount > 0.05) AS any_discounted,
        |  count(*) FILTER (l_tax > 0.04) AS n_taxed
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
        |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
        |  round(quantile_cont(l_extendedprice, 0.75), 6) AS p75_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_collect" ->
      """SELECT o_custkey,
        |  array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS order_keys,
        |  array_to_string(list(o_orderstatus ORDER BY o_orderstatus), ',')
        |    AS statuses
        |FROM orders WHERE o_custkey < 30
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_unpivot" ->
      """SELECT s_suppkey, metric, value FROM (
        |  UNPIVOT (SELECT s_suppkey,
        |             CAST(s_nationkey AS DOUBLE) AS nation,
        |             s_acctbal AS acctbal
        |           FROM supplier)
        |  ON nation, acctbal INTO NAME metric VALUE value)
        |ORDER BY s_suppkey, metric""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
        |    CAST(1 - CAST(l_discount AS DOUBLE) AS DECIMAL(8,4))), 4)
        |    AS DOUBLE) AS revenue,
        |  o_orderdate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q_agg_minmax" ->
      """SELECT l_linestatus,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q4_priority_count" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
        |    CAST(CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(8,4))), 4)
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.02 AND l_discount <= 0.06
        |  AND l_quantity < 24""".stripMargin,
    "q12_late_priority" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT CAST(promo AS DOUBLE) AS promo_revenue,
        |  CAST(total AS DOUBLE) AS total_revenue,
        |  CAST(floor(CAST(promo AS DOUBLE) * 100000000 /
        |    CAST(total AS DOUBLE)) AS BIGINT) AS promo_pct_u
        |FROM (
        |  SELECT
        |    round(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(12,4)) *
        |        CAST(1 - CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(8,4))
        |      ELSE CAST(0 AS DECIMAL(12,4)) END), 4) AS promo,
        |    round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
        |      CAST(1 - CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(8,4))),
        |      4) AS total
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01')""".stripMargin,
    "q19_disjunctive_revenue" ->
      """SELECT
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
        |    CAST(1 - CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(8,4))), 4)
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |        AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |        AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q22_dormant_customers" ->
      """SELECT c_nationkey, count(*) AS n_custs,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
        |    AS total_bal
        |FROM customer
        |WHERE c_acctbal > (
        |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
        |      / count(*)
        |    FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    // window-form oracle: the custom aggregate must be value-identical
    "q_agg_topk_custom" ->
      """SELECT l_returnflag AS flag, rnk, id, score FROM (
        |  SELECT l_returnflag,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC,
        |               l_orderkey * 10 + l_linenumber ASC) AS rnk,
        |    l_orderkey * 10 + l_linenumber AS id,
        |    l_extendedprice AS score
        |  FROM lineitem)
        |WHERE rnk <= 3 ORDER BY flag, rnk""".stripMargin,
    // plain group-by oracle: salting must be value-invisible
    "q_agg_salted" ->
      """SELECT user_id,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  min(event_id) AS min_event, max(event_id) AS max_event
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
