package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.BqExpressions

/** Binary quantization (1-bit per dimension) — the 32× end of the
  * quantizer family (PQ 16×, SQ8 4×), the shape modern vector stores
  * ship as "BQ": bit d = x[d] > median[d], distance = XOR+popcount
  * hamming over ⌈dim/8⌉-byte codes, then exact rerank of a shortlist.
  * One bit per dimension is exactly the axis-aligned special case of
  * sign-hyperplane hashing, but used as a SCAN payload (every code
  * scored, cheapest possible distance) rather than [[Lsh]]'s bucketed
  * candidate generation — the two compose rather than compete.
  *
  * Training is ONE exact aggregation: the per-dimension MEDIAN
  * (Spark's sort-based exact `percentile`, order-free ⇒ the model is
  * bit-deterministic under any partitioning, the [[Sq.train]]
  * discipline). The median centers each bit — maximum-entropy codes —
  * where a mean threshold lets a skewed dimension waste its bit.
  *
  * At 100 TB: the codes table is dim/8 bytes per vector (64-dim: 8
  * bytes — the corpus fits where one float32 dimension used to), the
  * scan is map-only with per-partition TopK pruning
  * (TakeOrdered-style via the row_number window), and only the
  * shortlist's float vectors are ever fetched for rerank. */
object Bq {

  final case class BqModel(thresholds: Array[Double]) {
    def dim: Int = thresholds.length
  }

  /** One exact aggregation: per-dimension median over the corpus. */
  def train(embeddings: DataFrame): BqModel = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val rows = embeddings
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("pos").agg(expr("percentile(x, 0.5)").as("med"))
      .orderBy("pos").select("med").as[Double].collect()
    BqModel(rows)
  }

  /** (vec_id, code BINARY) — map-only, one kernel call per row. */
  def encode(embeddings: DataFrame, model: BqModel): DataFrame =
    embeddings.select(col("vec_id"),
      BqExpressions.encode(col("embedding"), model.thresholds).as("code"))

  /** Shortlist by symmetric hamming: queries are encoded through the
    * same thresholds and broadcast WITH their codes precomputed (one
    * encode per query, not per scored pair). Ties (hamming is coarse —
    * ≤ dim+1 distinct values) break by vec_id for determinism. */
  def search(codes: DataFrame, model: BqModel, queries: DataFrame,
      topK: Int): DataFrame = {
    val q = queries.select(col("q_id"),
      BqExpressions.encode(col("qvec"), model.thresholds).as("qcode"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("hamming").asc, col("vec_id").asc)
    codes.join(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("hamming",
        BqExpressions.hamming(col("code"), col("qcode")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("hamming"))
      .orderBy("q_id", "rnk")
  }

  /** Production shape: hamming shortlist → exact rerank of only the
    * shortlisted embeddings ([[Pq.rerank]]'s contract). Size the
    * shortlist to cover the hamming tie-set: 1-bit codes resolve which
    * neighborhood, not the ranking inside it (BqSpec pins this). */
  def searchRerank(codes: DataFrame, model: BqModel, corpus: DataFrame,
      queries: DataFrame, topK: Int, shortlist: Int): DataFrame =
    Pq.rerank(search(codes, model, queries, shortlist)
      .select(col("q_id"), col("vec_id")), corpus, queries, topK)

  def writeBq(model: BqModel, codes: DataFrame, dir: String): Unit = {
    codes.write.mode("overwrite").parquet(s"$dir/codes")
    val spark = codes.sparkSession
    import spark.implicits._
    model.thresholds.zipWithIndex.map { case (t, d) => (d, t) }
      .toSeq.toDF("pos", "thr")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/bq_thresholds")
  }

  def loadBq(spark: org.apache.spark.sql.SparkSession, dir: String)
      : (BqModel, DataFrame) = {
    import spark.implicits._
    val thr = spark.read.parquet(s"$dir/bq_thresholds")
      .orderBy("pos").select("thr").as[Double].collect()
    (BqModel(thr), spark.read.parquet(s"$dir/codes"))
  }
}
