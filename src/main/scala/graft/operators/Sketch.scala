package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary: the count-min sketch and its applications", J.
  * Algorithms 55(1)) over a token stream — the fixed-memory path for
  * frequency stats at corpus scale.
  *
  * Exact token counts at 100 TB shuffle the whole vocabulary (fine for
  * bounded vocab, detonates on open token spaces — URLs, n-grams,
  * user ids). The sketch is d hash rows × w buckets of counters:
  * per-partition partial aggregation combines map-side, the shuffle
  * carries AT MOST d·w rows per partition regardless of corpus size,
  * and sketches of corpus shards MERGE by bucketwise addition — the
  * associative shape Spark's partial/final aggregation already is.
  * Estimates are overestimates (never under), off by at most ε·N with
  * ε = e/w at probability 1−(1/e)^d per query — the classic trade.
  *
  * Everything is built-ins: xxhash64(seed-column, token) for the d
  * row-hashes, one groupBy for the sketch, one broadcast join for
  * point estimates.
  */
object Sketch {

  /** Build the sketch: (r, bucket, c) rows, at most d·w of them.
    * `tokens` is any single-column frame of string tokens. */
  def countMin(tokens: DataFrame, tokenCol: String, d: Int, w: Int)
      : DataFrame =
    tokens
      .select(col(tokenCol).as("token"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .groupBy(col("r"), pmod(xxhash64(col("r"), col("token")), lit(w))
        .as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Point estimates for candidate tokens: est(t) = min over the d rows
    * of the t-bucket counter. The sketch side is d·w rows — model-state
    * sized — and broadcast; the candidate side never shuffles. The join
    * is LEFT with a 0 fallback: a candidate whose bucket has no sketch
    * row has a zero counter there, and dropping that row (inner join)
    * would take the min over a SUBSET of the d counters — inflating the
    * estimate of an absent token to whatever collides in its other
    * rows, or losing the token from the output entirely. */
  def estimate(sketch: DataFrame, candidates: DataFrame, tokenCol: String,
      d: Int, w: Int): DataFrame = {
    val cand = candidates
      .select(col(tokenCol).as("token"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("bucket", pmod(xxhash64(col("r"), col("token")), lit(w)))
    cand.join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
