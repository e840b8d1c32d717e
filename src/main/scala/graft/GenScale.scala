package graft

import org.apache.spark.sql.functions._

/** Measurement helper (optimization r19, VERDICT r18 item 3): generate
  * a LARGER deterministic dataset with the driver testdata's schema and
  * uniform-key shape, so the iterative movers' wall-clock separates
  * from the per-job scheduler floor that dominates sf0.1 (the r18
  * scaling block measured 8 cores ≥ 32 cores there — wall time at that
  * SF cannot resolve loop-shape wins). BUILDER-SIDE ONLY: the driver's
  * own bench keeps reading `$SPARK_GRAFT_SF_DIR`; nothing here touches
  * the bench contract or the committed testdata.
  *
  * Shape matched to /root/testdata/sf0.1 (measured): lineitem
  * l_orderkey drawn uniformly over orders (ndv 98.2% ≈ 1 − e⁻⁴ — the
  * Poisson(4) lines-per-order signature), l_partkey/l_suppkey/o_custkey
  * uniform over their key spaces, l_quantity uniform 1..50.
  * `embeddings` uses [[ProfileGraphAnn.clustered]] (hierarchically
  * clustered unit vectors — the regime the ANN operators are built
  * for) plus the label column. All columns xxhash-derived: no RNG, so
  * re-generation is bit-identical.
  *
  * Usage: runMain graft.GenScale <outDir> <sf> [tables...]
  *   (default tables: lineitem orders embeddings; sf=1.0 →
  *    6M lineitem / 1.5M orders / 200k embeddings)
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val sf = args(1).toDouble
    val tables =
      if (args.length > 2) args.drop(2).toSet
      else Set("lineitem", "orders", "embeddings")
    val spark = Sessions.get("graft-genscale")
    spark.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    val nOrders = (1500000L * sf).toLong
    val nCust = math.max(1L, (150000L * sf).toLong)
    val nSupp = math.max(1L, (10000L * sf).toLong)
    val nPart = math.max(1L, (200000L * sf).toLong)
    val nLi = nOrders * 4
    val nEmb = math.max(1000L, (200000L * sf).toLong)

    if (tables("orders")) {
      spark.range(0L, nOrders)
        .select(col("id").as("o_orderkey"),
          pmod(xxhash64(col("id"), lit(1)), lit(nCust)).as("o_custkey"),
          element_at(array(lit("F"), lit("O"), lit("P")),
            (pmod(xxhash64(col("id"), lit(2)), lit(3)) + 1).cast("int"))
            .as("o_orderstatus"),
          (pmod(xxhash64(col("id"), lit(3)), lit(400000)) / lit(100.0) +
            1000.0).as("o_totalprice"),
          timestamp_seconds(lit(694224000L) +
            pmod(xxhash64(col("id"), lit(4)), lit(220752000L)))
            .as("o_orderdate"),
          concat(lit(""),
            (pmod(xxhash64(col("id"), lit(5)), lit(5)) + 1).cast("int"),
            lit("-PRIORITY")).as("o_orderpriority"))
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
      println(s"GENSCALE orders $nOrders")
    }
    if (tables("lineitem")) {
      spark.range(0L, nLi)
        .select(
          pmod(xxhash64(col("id"), lit(10)), lit(nOrders))
            .as("l_orderkey"),
          pmod(xxhash64(col("id"), lit(11)), lit(nPart)).as("l_partkey"),
          pmod(xxhash64(col("id"), lit(12)), lit(nSupp)).as("l_suppkey"),
          (pmod(xxhash64(col("id"), lit(13)), lit(7)) + 1).cast("int")
            .as("l_linenumber"),
          (pmod(xxhash64(col("id"), lit(14)), lit(50)) + 1)
            .cast("double").as("l_quantity"),
          (pmod(xxhash64(col("id"), lit(15)), lit(9000000)) / lit(100.0)
            + 1000.0).as("l_extendedprice"),
          (pmod(xxhash64(col("id"), lit(16)), lit(11)) / lit(100.0))
            .as("l_discount"),
          (pmod(xxhash64(col("id"), lit(17)), lit(9)) / lit(100.0))
            .as("l_tax"),
          element_at(array(lit("A"), lit("N"), lit("R")),
            (pmod(xxhash64(col("id"), lit(18)), lit(3)) + 1).cast("int"))
            .as("l_returnflag"),
          element_at(array(lit("F"), lit("O")),
            (pmod(xxhash64(col("id"), lit(19)), lit(2)) + 1).cast("int"))
            .as("l_linestatus"),
          timestamp_seconds(lit(694224000L) +
            pmod(xxhash64(col("id"), lit(20)), lit(220752000L)))
            .as("l_shipdate"))
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      println(s"GENSCALE lineitem $nLi")
    }
    if (tables("embeddings")) {
      ProfileGraphAnn.clustered(spark, nEmb, dim = 64)
        .withColumn("label",
          pmod(xxhash64(col("vec_id"), lit(30)), lit(10)).cast("int"))
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      println(s"GENSCALE embeddings $nEmb")
    }
    spark.stop()
  }
}
