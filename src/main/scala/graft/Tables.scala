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
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    // fail fast on the known schema-drift axis: if the driver ever
    // regenerates events with timestamp[ns] again, the nanosAsLong
    // fallback loads ts as LONG and cast(ts as timestamp) silently
    // reinterprets epoch-NANOS as epoch-SECONDS — garbage values whose
    // only backstop would be a DuckDB hash mismatch 147 queries later
    val tsType = df.schema("ts").dataType
    require(tsType == org.apache.spark.sql.types.TimestampNTZType,
      s"events.ts must be TIMESTAMP_NTZ (parquet timestamp[us]); read " +
        s"${tsType.simpleString} — ns-era testdata? See graft.Fixtures.")
    df
  }
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
