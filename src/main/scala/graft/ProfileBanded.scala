package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for the banded-SimHash query's stage costs (round-7
  * drift investigation). Times each sub-plan of q_simhash_banded32 at
  * the given SF in one JVM: fingerprint pass, banding explode, raw band
  * join, verify+distinct, and the full query. Not part of the library
  * surface; kept for reproducibility of the PLANS.md analysis. */
object ProfileBanded {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.get("graft-profile-banded")
    def t(label: String)(f: => Long): Unit = {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        (System.nanoTime() - t0) / 1e9 -> n
      }.sortBy(_._1).headOption.foreach { case (sec, n) =>
        println(f"PROFILE $label%-28s ${sec}%6.3f s  rows=$n")
      }
    }
    val docs = Tables.documents(spark, d)
    // warm
    SparkEntry.queries("q_simhash_banded32")(spark, d).count()

    val toksCol = split(col("text"), " ")
    val h = conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long")
    val votes = (0 until 32).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1)) === 1, 1)
        .otherwise(-1)).as(s"v$b"))
    val fp = (0 until 32).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    def sh = docs.select(col("doc_id"), explode(toksCol).as("token"))
      .withColumn("h", h).groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), fp.as("simhash32"))

    t("tokenize+explode")(docs.select(explode(toksCol).as("token")).count())
    t("fingerprint agg")(sh.count())
    val shC = sh.localCheckpoint()
    def bands = shC.select(col("doc_id"), col("simhash32"),
        posexplode(expr(
          "transform(sequence(0, 3), b -> shiftright(simhash32, int(b) * 8) & 255)")))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_bits"))
    t("banding explode")(bands.count())
    def joined = bands.select(col("band"), col("band_bits"),
        col("doc_id").as("id_a"), col("simhash32").as("sh_a"))
      .join(bands.select(col("band"), col("band_bits"),
        col("doc_id").as("id_b"), col("simhash32").as("sh_b")),
        Seq("band", "band_bits"))
      .filter(col("id_a") < col("id_b"))
    t("band join raw")(joined.count())
    t("join+verify")(joined
      .select(col("id_a"), col("id_b"),
        expr("bit_count(sh_a ^ sh_b)").as("hamming"))
      .filter(col("hamming") <= 3).count())
    t("join+verify+distinct")(joined
      .select(col("id_a"), col("id_b"),
        expr("bit_count(sh_a ^ sh_b)").as("hamming"))
      .filter(col("hamming") <= 3).distinct().count())
    t("full query")(
      SparkEntry.queries("q_simhash_banded32")(spark, d).count())
    spark.stop()
  }
}
