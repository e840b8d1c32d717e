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
    // --hot: Zipf head ONE DECADE hotter (token 0 ~39% of all
    // instances instead of ~6%) — the r14 stress mode for the
    // head-split scoring joins; also reports the max single-key mass
    // fraction surviving on the cold exchange (the bound the split
    // exists for) next to the pre-split fraction.
    val hotMode = args.contains("--hot")
    val rest = args.filterNot(_ == "--hot")
    val sizes =
      if (rest.nonEmpty) rest.toSeq.map(_.toLong)
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
      val text = if (hotMode)
        // id = ⌊V·u⁹⌋ — head token ≈ 5000^(-1/9) ≈ 39% of mass
        array_join(transform(sequence(lit(0), lit(99)),
          j => concat(lit("w"),
            floor(pow(u(j).cast("double") / lit(1e6), 9.0) * lit(5000.0))
              .cast("long"))), " ")
      else array_join(transform(sequence(lit(0), lit(99)),
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
      val tag = if (hotMode) "TEXT_HOT" else "TEXT"
      println(f"$tag n=$n collocations=$coll%.2fs vocab_growth=$vocab%.2fs " +
        f"dsir=$dsir%.2fs quality_normalize=$qn%.2fs " +
        f"(${n / coll / 1000}%.1fk docs/s collocations)")
      if (hotMode) {
        // the skew evidence: largest single-token mass fraction BEFORE
        // the head split vs the largest fraction SURVIVING on the cold
        // exchange (head = top-4096, the query kernels' constant)
        val ug = time(queries.Pipeline, "q_unigram_logprob")
        val bg = time(queries.Pipeline, "q_bigram_logprob")
        val tf = spark.read.parquet(s"$dir/documents.parquet")
          .select(explode(expr(
            "filter(split(text, ' '), t -> t <> '')")).as("token"))
          .groupBy("token").count()
          .localCheckpoint()
        val total = tf.agg(sum("count")).head.getLong(0)
        val preMax = tf.agg(max("count")).head.getLong(0)
        val coldMax = tf.orderBy(col("count").desc, col("token"))
          .offset(4096).agg(max("count")).head.get(0) match {
            case null => 0L
            case v: Long => v
          }
        println(f"TEXT_HOT n=$n unigram=$ug%.2fs bigram=$bg%.2fs " +
          f"pre_split_max_key_frac=${preMax.toDouble / total}%.4f " +
          f"cold_max_key_frac=${coldMax.toDouble / total}%.6f")
      }
    }
    spark.stop()
  }
}
