package graft.plans

import java.nio.file.Files

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Partition pruning — the property that makes a 100 TB date-partitioned
  * lake queryable: a predicate on the partition column must prune at
  * PLANNING time (PartitionFilters on the scan), so a one-year query
  * reads one year's files, not the whole table. */
class PartitionPruningSpec extends SparkSuite {

  test("year-partitioned layout prunes to the queried year's files only") {
    val dir = Files.createTempDirectory("pruned").toString + "/orders"
    Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("o_year") === 1997)
      .groupBy("o_orderstatus").count()
    val plan = q.queryExecution.executedPlan.toString()
    // pruned at planning: the partition predicate sits in
    // PartitionFilters, NOT as a post-scan Filter over all files
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"),
      s"partition filter not applied:\n${plan.take(2000)}")
    // and the scan's selected partitions really exclude other years:
    // rewriting the same query over the full read must agree
    val expect = Tables.orders(spark, "/root/testdata/sf0.001")
      .filter(year(col("o_orderdate")) === 1997)
      .groupBy("o_orderstatus").count()
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      expect.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    // and no residual data filter remains: the predicate was consumed
    // entirely by partition selection (file listing), nothing row-level
    assert(!plan.contains("PushedFilters: [IsNotNull(o_year)"),
      s"partition predicate leaked into the data scan:\n${plan.take(2000)}")
  }
}
