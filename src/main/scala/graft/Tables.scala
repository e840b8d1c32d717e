package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query takes `(SparkSession, sfDir)` and loads through here so the
  * scan is always a plain parquet relation Catalyst can push filters and
  * column pruning into. At cluster scale the same loaders would point at the
  * partitioned table roots produced by [[graft.ingest.RangeSink]].
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** One object per query family implements this; SparkEntry merges them. */
trait QueryFamily {
  /** name -> (spark, sfDir) => result. Declared only once oracle-matched. */
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** name -> DuckDB SQL equivalent over the same parquet tables.
    * Keys absent here get a weaker rows-only check from the driver. */
  def oracle: Map[String, String]
}
