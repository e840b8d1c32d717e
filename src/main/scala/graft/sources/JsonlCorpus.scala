package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSONL corpus reader — the interchange format LLM training data
  * actually arrives in (one JSON document per line, frequently with a
  * tail of truncated/malformed lines from interrupted uploads).
  *
  * Spark-first: `spark.read.schema(...).json` IS the distributed JSONL
  * reader — splittable (uncompressed/bzip2), schema-enforced, codegen'd
  * parse. What this wrapper adds is the QUARANTINE CONTRACT:
  * PERMISSIVE mode + an explicit corrupt-record column, so malformed
  * lines become rows in a dead-letter frame instead of either killing
  * the job (FAILFAST) or silently disappearing (DROPMALFORMED) — the
  * same lenient-vs-strict split as the proto decoder
  * (graft.ingest.Decode) and the image codec (graft.multimodal).
  *
  * At 100 TB: JSONL parses once on ingest, lands as parquet
  * (documents-table schema), and every downstream pass reads columnar —
  * re-parsing JSON per query would make every scan CPU-bound.
  */
object JsonlCorpus {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("_corrupt", StringType)))

  /** Read a JSONL corpus; rows with unparseable lines carry the raw line
    * in `_corrupt` and null data fields. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** The clean/dead-letter split every ingest job wants. */
  def split(raw: DataFrame): (DataFrame, DataFrame) = {
    // Spark requires caching before filtering on the corrupt column
    // (the parser prunes it otherwise, SPARK-21610)
    val cached = raw.cache()
    val clean = cached.filter(col("_corrupt").isNull).drop("_corrupt")
    val dead = cached.filter(col("_corrupt").isNotNull).select("_corrupt")
    (clean, dead)
  }
}
