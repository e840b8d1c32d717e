package graft

import org.apache.spark.sql.functions._

/** Scale sweep for the corpus-statistics additions (collocations,
  * vocabulary growth, DSIR selection, quality normalization):
  * synthetic document corpora at 50k and 500k docs (10× and 100× the
  * sf0.1 fixture), hash-derived tokens with zero RNG — the evidence
  * that the one-corpus-shuffle + vocab-sized-downstream shapes scale
  * near-linearly in the document count.
  *
  * Usage: runMain graft.ProfileText [nDocs ...]   (default 50000 500000)
  */
object ProfileText {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-text")
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(50000L, 500000L)
    sizes.foreach { n =>
      val dir = java.nio.file.Files.createTempDirectory(s"text$n").toString
      // ~100 tokens/doc over a 5000-token vocabulary with a ZIPF-ish
      // head (token id = ⌊V·u³⌋ for hash-uniform u — ~6% of mass on
      // token 0, a long tail): real corpora are skewed, and the skew is
      // load-bearing for the sweep's meaning — a UNIFORM vocabulary
      // makes bigram TYPES grow linearly with the corpus (25M distinct
      // groups at 500k docs, measured 24× cost at 10× data: measuring
      // the fixture's type explosion, not the engine), which no
      // Zipfian corpus does. 3-gram types still grow through the last
      // decile (a real Heaps curve) and head bigrams clear the PMI
      // support filter.
      def u(j: org.apache.spark.sql.Column) =
        pmod(xxhash64(col("id"), j), lit(1000000L))
      val text = array_join(transform(sequence(lit(0), lit(99)),
        j => concat(lit("w"),
          ((u(j) * u(j) * u(j)) / lit(200000000000000L)).cast("long"))),
        " ")
      spark.range(n)
        .select(col("id").as("doc_id"), text.as("text"),
          lit("en").as("lang"),
          concat(lit("src"), pmod(col("id"), lit(20))).as("source"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      def time(fam: QueryFamily, q: String): Double = {
        val t0 = System.nanoTime()
        fam.queries(q)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val coll = time(queries.Pipeline, "q_collocations")
      val vocab = time(queries.Pipeline, "q_vocab_growth")
      val dsir = time(queries.Pipeline, "q_dsir_sample")
      val qn = time(queries.Quality, "q_quality_normalize")
      println(f"TEXT n=$n collocations=$coll%.2fs vocab_growth=$vocab%.2fs " +
        f"dsir=$dsir%.2fs quality_normalize=$qn%.2fs " +
        f"(${n / coll / 1000}%.1fk docs/s collocations)")
    }
    spark.stop()
  }
}
