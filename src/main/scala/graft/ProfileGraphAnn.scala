package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphAnn

/** Scale sweep for the hierarchical graph ANN — the claim under test is
  * the one that justifies the shape: the exact-dot SEARCH BUDGET stays
  * roughly flat as the corpus grows (navigation cost ~ log n · degree),
  * while any probe/shortlist scheme's budget grows with the corpus
  * fraction scanned. Reuses [[ProfileAnn.vectors]] (deterministic
  * 64-dim unit vectors, ~2% planted near-dups).
  *
  * Per size: build the hierarchy, search a fixed 100-query set with the
  * audited searchCounted (dots/query), and score recall@10 against a
  * driver brute-force over the corpus (100 × n × 64 muls — fine to 1M).
  *
  * Usage: runMain graft.ProfileGraphAnn [n ...] (default 100000 1000000)
  */
object ProfileGraphAnn {

  /** Hierarchically clustered corpus (the production-like regime —
    * real embedding spaces have neighborhood structure): n/1000
    * subclusters of ~1000 under 10 superclusters; true neighbors are
    * noise-level structure inside a subcluster. Column math only. */
  def clustered(spark: org.apache.spark.sql.SparkSession,
      n: Long, dim: Int = 32): org.apache.spark.sql.DataFrame = {
    val nSub = math.max(2L, n / 1000L)
    spark.range(0L, n)
      .withColumn("sub", col("id") % nSub)
      .withColumn("sup", col("sub") % 10)
      .withColumn("raw", expr(
        s"""transform(sequence(0, ${dim - 1}), j ->
           |  if(j = sup, 8.0d, 0.0d) +
           |  cast(xxhash64(sub, j) as double) / 1.8446744073709552e19 +
           |  cast(xxhash64(id, j) as double) / 9.223372036854776e20)
           |""".stripMargin))
      .withColumn("nrm", expr(
        "sqrt(aggregate(raw, cast(0.0 as double), (a, e) -> a + e * e))"))
      .select(col("id").as("vec_id"),
        expr("transform(raw, x -> cast(x / nrm as float))").as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-graphann")
    import spark.implicits._
    val kind = args.headOption.getOrElse("clustered")
    val sizes = if (args.length > 1) args.drop(1).toSeq.map(_.toLong)
      else Seq(100000L, 1000000L)
    sizes.foreach { n =>
      val emb = (kind match {
        case "iso" => ProfileAnn.vectors(spark, n)
        case _ => clustered(spark, n)
      }).localCheckpoint()
      // cell size ~250: the ProfileKnn-measured sweet spot (cell 1000
      // quadrupled the graph pass's candidate volume at 1M)
      val kCells = math.max(16, (n / 250).toInt)
      val t0 = System.nanoTime()
      val idx = GraphAnn.build(emb, degree = 10, kCells = kCells,
        iters = 2, probes = 2, descentRounds = 1)
      idx.layers.foreach(_.count()) // checkpointed at build; count is cheap
      val buildSec = (System.nanoTime() - t0) / 1e9
      val layerSizes = idx.layers.map(_.select("src").distinct().count())

      val queries = emb.filter(col("vec_id") % (n / 100) === 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
        .localCheckpoint()
      val nQ = queries.count()
      val t1 = System.nanoTime()
      val (res, dots) = GraphAnn.searchCounted(idx, emb, queries,
        topK = 10, ef = 32, maxRounds = 10)
      val got = res.select("q_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val searchSec = (System.nanoTime() - t1) / 1e9

      // driver brute force for the query set only
      val qVecs = queries.as[(Long, Array[Float])].collect()
      val corpus = emb.select("vec_id", "embedding")
        .as[(Long, Array[Float])].collect()
      val recall = qVecs.map { case (qid, qv) =>
        val top = corpus.iterator.filter(_._1 != qid).map { case (vid, v) =>
          var s = 0.0
          var i = 0
          while (i < v.length) { s += qv(i).toDouble * v(i); i += 1 }
          (vid, s)
        }.toArray.sortWith { case ((i1, s1), (i2, s2)) =>
          if (s1 != s2) s1 > s2 else i1 < i2
        }.take(10).map(_._1).toSet
        (got.getOrElse(qid, Set.empty) & top).size / 10.0
      }.sum / qVecs.length

      println(f"""{"graphann":{"kind":"$kind%s","n":$n%d,"layers":${layerSizes.size}%d,""" +
        f""""layer_nodes":[${layerSizes.mkString(",")}],""" +
        f""""build_sec":$buildSec%.1f,"queries":$nQ%d,""" +
        f""""search_sec":$searchSec%.1f,""" +
        f""""dots_per_query":${dots / math.max(1, nQ)}%d,""" +
        f""""recall_at_10":$recall%.3f}}""")
    }
    spark.stop()
  }
}
