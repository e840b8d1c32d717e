package graft.queries

import graft.{QueryFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join family (SURVEY.md §2.C-3): every join shape the engine supports.
  *
  * Scale notes (100 TB design):
  *  - dimension tables (region/nation/customer/supplier/part) are
  *    broadcast — no shuffle of the fact side;
  *  - fact⋈fact equi joins shuffle on the join key and AQE handles skew;
  *  - the as-of join is expressed as equi-join + window (dense ranks per
  *    key) rather than a sort-merge over the full cross product.
  */
object Joins extends QueryFamily {

  private def dec(c: String) = col(c).cast("decimal(12,4)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_inner" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")
    },
    "q_join_star" -> { (s, d) =>
      // 5-way star: lineitem ⋈ orders (shuffle) ⋈ broadcast dims.
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          round(sum(dec("l_extendedprice") *
            (lit(1) - dec("l_discount")).cast("decimal(8,4)")), 4)
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name")
    },
    "q_join_left" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    },
    "q_join_right" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .select(col("c_custkey"), col("o_orderkey"))
        .orderBy(col("c_custkey").asc,
                 col("o_orderkey").asc_nulls_first)
    },
    "q_join_full" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      su.join(c, su("s_suppkey") === c("c_custkey"), "full")
        .select(col("s_suppkey"), col("c_custkey"), col("s_name"), col("c_name"))
        .orderBy(col("s_suppkey").asc_nulls_first,
                 col("c_custkey").asc_nulls_first)
    },
    "q_join_semi" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    "q_join_anti" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    "q_join_cross" -> { (s, d) =>
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      r.crossJoin(broadcast(n))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    },
    "q_join_theta" -> { (s, d) =>
      // Inequality (band) join: same nation, supplier balance above the
      // customer's by at most 100. Broadcast NLJ — the small side is tiny.
      val su = Tables.supplier(s, d)
      val c = Tables.customer(s, d)
      c.join(broadcast(su),
          c("c_nationkey") === su("s_nationkey") &&
          su("s_acctbal") > c("c_acctbal") &&
          su("s_acctbal") <= c("c_acctbal") + 100)
        .select("s_suppkey", "c_custkey")
        .orderBy("s_suppkey", "c_custkey")
    },
    "q_join_range" -> { (s, d) =>
      // Range join: events.value into static [lo, hi) buckets.
      val e = Tables.events(s, d)
      val buckets = s.range(0, 10).select(
        (col("id") * 10).cast("double").as("lo"),
        ((col("id") + 1) * 10).cast("double").as("hi"))
      e.join(broadcast(buckets), e("value") >= col("lo") && e("value") < col("hi"))
        .groupBy(col("lo"))
        .agg(count(lit(1)).as("n_events"),
             round(sum(dec("value")), 4).cast("double").as("sum_value"))
        .orderBy("lo")
    },
    "q_join_merge" -> { (s, d) =>
      // sort-merge path, explicitly hinted: the physical join a fact⋈fact
      // falls back to at scale when neither side broadcasts
      val l = Tables.lineitem(s, d).hint("merge")
      val o = Tables.orders(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(dec("l_quantity")).cast("double").as("sum_qty"))
        .orderBy("o_orderstatus")
    },
    "q_join_nullsafe" -> { (s, d) =>
      // null-safe equality (<=> ↔ IS NOT DISTINCT FROM) over a derived
      // nullable key: status P mapped to NULL on both sides
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "P", lit(null))
            .otherwise(col("o_orderstatus")).as("k"))
      val dim = s.createDataFrame(Seq(
          (Option("F"), "finished"), (Option("O"), "open"),
          (Option.empty[String], "pending"))).toDF("k", "label")
      o.join(dim, o("k") <=> dim("k"))
        .select(col("o_orderkey"), col("label"))
        .orderBy("o_orderkey")
    },
    "q_scalar_subquery" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_sq")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM orders_sq
          |WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders_sq)
          |ORDER BY o_orderkey""".stripMargin)
    },
    "q_pivot" -> { (s, d) =>
      // pivot with a FIXED value list (dynamic pivot can't hash-compare);
      // oracle = conditional aggregation with the same column names
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("o_orderpriority")
    },
    "q_join_lateral" -> { (s, d) =>
      // correlated LATERAL subquery: each nation's two richest customers
      Tables.nation(s, d).createOrReplaceTempView("nation_lat")
      Tables.customer(s, d).createOrReplaceTempView("customer_lat")
      s.sql(
        """SELECT n.n_name, t.c_custkey, t.c_acctbal
          |FROM nation_lat n,
          |LATERAL (
          |  SELECT c_custkey, c_acctbal FROM customer_lat
          |  WHERE c_nationkey = n.n_nationkey
          |  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) t
          |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin)
    },
    "q_join_asof" -> { (s, d) =>
      // As-of join: each purchase matched to the latest signup of the same
      // user at or before it. Spark-first shape: union-free equi join on
      // user + window max over qualifying signup times.
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_event"),
                col("ts").as("p_ts"))
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      // Join on native timestamps; emit epoch micros on both sides
      // (NTZ → cast in the UTC-pinned session ≡ DuckDB epoch_us).
      purchases.join(signups,
          col("p_user") === col("s_user") && col("s_ts") <= col("p_ts"), "left")
        .groupBy(col("p_user"), col("p_event"), col("p_ts"))
        .agg(max(col("s_ts")).as("asof_ts"))
        .select(col("p_user"), col("p_event"),
                unix_micros(col("p_ts").cast("timestamp")).as("p_ts_us"),
                unix_micros(col("asof_ts").cast("timestamp"))
                  .as("asof_signup_us"))
        .orderBy(col("p_event").asc)
    }
  )

  def oracle: Map[String, String] = Map(
    "q_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_star" ->
      """SELECT r_name,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - CAST(l_discount AS DECIMAL(12,4)) AS DECIMAL(8,4))), 4) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_join_right" ->
      """SELECT c_custkey, o_orderkey
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_join_full" ->
      """SELECT s_suppkey, c_custkey, s_name, c_name
        |FROM supplier FULL JOIN customer ON s_suppkey = c_custkey
        |ORDER BY s_suppkey ASC NULLS FIRST, c_custkey ASC NULLS FIRST""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q_join_theta" ->
      """SELECT s_suppkey, c_custkey
        |FROM customer JOIN supplier
        |  ON c_nationkey = s_nationkey
        | AND s_acctbal > c_acctbal AND s_acctbal <= c_acctbal + 100
        |ORDER BY s_suppkey, c_custkey""".stripMargin,
    "q_join_range" ->
      """SELECT CAST(b.id * 10 AS DOUBLE) AS lo, count(*) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_value
        |FROM events e JOIN (SELECT range AS id FROM range(0, 10)) b
        |  ON e.value >= b.id * 10 AND e.value < (b.id + 1) * 10
        |GROUP BY 1 ORDER BY lo""".stripMargin,
    "q_join_merge" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_join_nullsafe" ->
      """SELECT o_orderkey, label FROM
        |  (SELECT o_orderkey,
        |     CASE WHEN o_orderstatus = 'P' THEN NULL
        |          ELSE o_orderstatus END AS k
        |   FROM orders) o
        |JOIN (VALUES ('F', 'finished'), ('O', 'open'), (NULL, 'pending'))
        |  AS dim(k, label)
        |  ON o.k IS NOT DISTINCT FROM dim.k
        |ORDER BY o_orderkey""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (o_orderstatus = 'F') AS "F",
        |  count(*) FILTER (o_orderstatus = 'O') AS "O",
        |  count(*) FILTER (o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_join_lateral" ->
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n,
        |LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) t
        |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin,
    "q_join_asof" ->
      """SELECT p.user_id AS p_user, p.event_id AS p_event,
        |  epoch_us(p.ts) AS p_ts_us, max(epoch_us(s.ts)) AS asof_signup_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND s.ts <= p.ts
        |GROUP BY 1, 2, 3
        |ORDER BY p_event ASC""".stripMargin
  )
}
