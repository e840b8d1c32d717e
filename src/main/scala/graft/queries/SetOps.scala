package graft.queries

import graft.{QueryFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set-operation family (SURVEY.md §2.C-7) over compatible projections of
  * customer / supplier nation keys.
  *
  * Scale notes: UNION ALL is a zero-shuffle concatenation of scans;
  * the distinct variants (UNION / INTERSECT / EXCEPT and their ALL forms)
  * each cost one hash shuffle on the full projection — Catalyst plans them
  * as (partial) hash aggregates, not sorts.
  */
object SetOps extends QueryFamily {

  private def custKeys(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
  private def suppKeys(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_set_union_all" -> { (s, d) =>
      custKeys(s, d).union(suppKeys(s, d))
        .groupBy("nationkey").agg(count(lit(1)).as("n"))
        .orderBy("nationkey")
    },
    "q_set_union" -> { (s, d) =>
      custKeys(s, d).union(suppKeys(s, d)).distinct()
        .orderBy("nationkey")
    },
    "q_set_intersect" -> { (s, d) =>
      custKeys(s, d).intersect(suppKeys(s, d))
        .orderBy("nationkey")
    },
    "q_set_intersect_all" -> { (s, d) =>
      custKeys(s, d).intersectAll(suppKeys(s, d))
        .orderBy("nationkey")
    },
    "q_set_except" -> { (s, d) =>
      custKeys(s, d).except(suppKeys(s, d))
        .orderBy("nationkey")
    },
    "q_set_except_all" -> { (s, d) =>
      custKeys(s, d).exceptAll(suppKeys(s, d))
        .groupBy("nationkey").agg(count(lit(1)).as("n"))
        .orderBy("nationkey")
    }
  )

  private val cust = "SELECT c_nationkey AS nationkey FROM customer"
  private val supp = "SELECT s_nationkey AS nationkey FROM supplier"

  def oracle: Map[String, String] = Map(
    "q_set_union_all" ->
      s"""SELECT nationkey, count(*) AS n FROM ($cust UNION ALL $supp)
         |GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "q_set_union" ->
      s"SELECT nationkey FROM ($cust UNION $supp) ORDER BY nationkey",
    "q_set_intersect" ->
      s"$cust INTERSECT $supp ORDER BY nationkey",
    "q_set_intersect_all" ->
      s"$cust INTERSECT ALL $supp ORDER BY nationkey",
    "q_set_except" ->
      s"$cust EXCEPT $supp ORDER BY nationkey",
    "q_set_except_all" ->
      s"""SELECT nationkey, count(*) AS n FROM ($cust EXCEPT ALL $supp)
         |GROUP BY nationkey ORDER BY nationkey""".stripMargin
  )
}
