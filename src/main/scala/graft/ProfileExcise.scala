package graft

import org.apache.spark.sql.functions._

import graft.queries.Pipeline

/** Developer tool: span-excision throughput at scale — q_span_excise's
  * shape (rolling span hashes → firsts join → gaps-and-islands window)
  * against a corpus with PLANTED boilerplate, so the expected region
  * inventory is exact. `args`: [nDocs] [runs].
  *
  * Every 10th doc carries a fixed 30-token boilerplate (distinct
  * bp0..bp29 vocabulary) spliced at position 40: each carrier except
  * the global first occurrence must yield exactly ONE 30-token maximal
  * region (spans crossing the splice boundary mix in random context
  * and stay unique). The sweep checks that inventory while timing.
  */
object ProfileExcise {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-excise")
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val parts = math.max(32, (nDocs / 8000L).toInt)
    // span hashes are ~100 per doc and mostly unique, so the firsts
    // groupBy + SHUFFLE_HASH join build ~nSpans/shufflePartitions
    // entries per task — at 1M docs the 32-partition local default puts
    // 3M-entry builds on all 32 threads at once and grinds the 8 GB
    // heap. Scale shuffle partitions with the corpus (the real-cluster
    // sizing rule this host's fixed default papers over).
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)

    val boiler = (0 until 30).map(i => s"bp$i").mkString(" ")
    val docs = ProfileBpe.docs(spark, nDocs, parts)
      .withColumn("text",
        when(col("doc_id") % 10 === 0,
          concat_ws(" ",
            concat_ws(" ", slice(split(col("text"), " "), 1, 40)),
            lit(boiler),
            concat_ws(" ", slice(split(col("text"), " "), 41, 60))))
          .otherwise(col("text")))
      .persist()
    val n = docs.count()
    println(s"[profile-excise] docs=$n carriers=${n / 10}")

    (1 to runs).foreach { r =>
      val t0 = System.nanoTime()
      val agg = Pipeline.spanExcise(docs)
        .agg(count(lit(1)).as("regions"), sum("n_tokens").as("tokens"),
          min("n_tokens").as("minT"), max("n_tokens").as("maxT"))
        .collect().head
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile-excise] run$r: ${agg.getLong(0)} regions " +
        f"(min=${agg.getLong(2)} max=${agg.getLong(3)} tokens, " +
        f"sum=${agg.getLong(1)}) in $dt%.1fs (${n / dt}%.0f docs/s)")
    }
    docs.unpersist()
    spark.stop()
  }
}
