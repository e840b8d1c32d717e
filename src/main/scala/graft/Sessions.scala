package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession construction so Verify / Bench / tests share the
  * exact configuration the engine is designed for.
  *
  * Notes:
  *  - `nanosAsLong`: vestigial-safe — earlier driver testdata carried
  *    timestamp[ns] (rejected by Spark's reader without this conf); the
  *    current generation writes timestamp[us], which both engines read
  *    natively as a microsecond timestamp, so the conf no-ops. Kept so a
  *    ns-era parquet still loads instead of crashing the whole session.
  *  - AQE on: runtime coalescing + skew-join handling is part of the
  *    100 TB design (SURVEY.md §7.2 M6).
  *  - shuffle.partitions defaults to the core count for local runs; on a
  *    real cluster this is set to ~2-3× total cores (AQE coalesces down).
  */
object Sessions {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      // AQE sizes broadcast candidates from COMPRESSED shuffle bytes; a
      // side that estimates under the 64 MiB threshold can decompress
      // past the 1g default result-size cap during the driver collect
      // (observed: vocabulary-df join at 5M docs). Cap at half the
      // actual driver heap so a mis-promoted broadcast still fails with
      // a clean result-size error rather than a driver OOM; overridable
      // for profiling runs.
      .config("spark.driver.maxResultSize",
        sys.env.getOrElse("SPARK_GRAFT_MAX_RESULT",
          s"${Runtime.getRuntime.maxMemory / (2L * 1024 * 1024)}m"))
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.parquet.compression.codec", "zstd")

  def get(appName: String): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
