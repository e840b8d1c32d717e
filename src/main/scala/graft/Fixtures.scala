package graft

import org.apache.spark.sql.SparkSession

/** Testdata schema-drift gate.
  *
  * Round 8 lost a day-slice when the driver regenerated `events.ts` as a
  * different parquet timestamp width and 147 queries failed one by one
  * with opaque value mismatches. This preflight reads every table's
  * schema (footer metadata only — no data scan) and fails ONCE, with a
  * named per-column diff against the FIXTURES.md contract, before any
  * query runs. [[Verify]] calls it first; FixturesSpec pins it in the
  * test suite.
  */
object Fixtures {

  /** Expected Spark-side schema per table, as `name:simpleString` —
    * parquet timestamp[us] with no UTC flag reads as timestamp_ntz
    * (session TZ pinned UTC, SURVEY §7.5). */
  val expected: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey:int", "r_name:string"),
    "nation" -> Seq("n_nationkey:int", "n_name:string", "n_regionkey:int"),
    "customer" -> Seq("c_custkey:bigint", "c_name:string",
      "c_nationkey:int", "c_acctbal:double", "c_mktsegment:string"),
    "supplier" -> Seq("s_suppkey:bigint", "s_name:string",
      "s_nationkey:int", "s_acctbal:double"),
    "part" -> Seq("p_partkey:bigint", "p_name:string", "p_brand:string",
      "p_type:string", "p_size:int", "p_retailprice:double"),
    "orders" -> Seq("o_orderkey:bigint", "o_custkey:bigint",
      "o_orderstatus:string", "o_totalprice:double",
      "o_orderdate:timestamp_ntz", "o_orderpriority:string"),
    "lineitem" -> Seq("l_orderkey:bigint", "l_partkey:bigint",
      "l_suppkey:bigint", "l_linenumber:int", "l_quantity:double",
      "l_extendedprice:double", "l_discount:double", "l_tax:double",
      "l_returnflag:string", "l_linestatus:string",
      "l_shipdate:timestamp_ntz"),
    "events" -> Seq("event_id:bigint", "ts:timestamp_ntz",
      "user_id:bigint", "event_type:string", "value:double",
      "props:string"),
    "documents" -> Seq("doc_id:bigint", "text:string", "lang:string",
      "source:string", "n_chars:bigint"),
    "embeddings" -> Seq("vec_id:bigint", "embedding:array<float>",
      "label:int"))

  /** Per-table named diffs; empty when the testdata matches the
    * contract. A missing table reports as one diff, not an exception. */
  def diffs(spark: SparkSession, sfDir: String): Seq[String] =
    expected.toSeq.sortBy(_._1).flatMap { case (name, want) =>
      try {
        val got = Tables.table(spark, sfDir, name).schema
          .map(f => s"${f.name}:${f.dataType.simpleString}")
        if (got == want) Nil
        else Seq(s"$name: expected [${want.mkString(", ")}] " +
          s"but read [${got.mkString(", ")}]")
      } catch {
        case e: Throwable => Seq(s"$name: unreadable (${e.getMessage})")
      }
    }

  /** Fail-fast preflight: one clear error naming every drifted column,
    * instead of 147 downstream value mismatches. */
  def check(spark: SparkSession, sfDir: String): Unit = {
    val ds = diffs(spark, sfDir)
    if (ds.nonEmpty)
      throw new IllegalStateException(
        s"testdata schema drift in $sfDir —\n  ${ds.mkString("\n  ")}\n" +
          "(update graft.Fixtures + FIXTURES.md if the new schema is " +
          "intentional)")
  }
}
