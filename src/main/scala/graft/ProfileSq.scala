package graft

import org.apache.spark.sql.functions._

import graft.operators.Sq

/** Scale sweep for SQ8: train/encode throughput and rerank recall on
  * [[ProfileAnn.vectors]] — the evidence the 4×-compression path holds
  * corpus-scale (train is one aggregation; encode and the asymmetric
  * dot are map-only kernels, so both should track scan speed).
  *
  * Usage: runMain graft.ProfileSq [n ...] (default 200000 1000000)
  */
object ProfileSq {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-sq")
    import spark.implicits._
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(200000L, 1000000L)
    sizes.foreach { n =>
      val emb = ProfileAnn.vectors(spark, n).localCheckpoint()
      val t0 = System.nanoTime()
      val model = Sq.train(emb)
      val trainSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val codes = Sq.encode(emb, model).localCheckpoint()
      codes.count()
      val encodeSec = (System.nanoTime() - t1) / 1e9

      val queries = emb.filter(col("vec_id") % (n / 100) === 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
        .localCheckpoint()
      val nQ = queries.count()
      val t2 = System.nanoTime()
      val got = Sq.searchRerank(codes, model, emb, queries,
          topK = 10, shortlist = 30)
        .select("q_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val searchSec = (System.nanoTime() - t2) / 1e9

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

      println(f"""{"sq":{"n":$n%d,"train_sec":$trainSec%.1f,""" +
        f""""encode_sec":$encodeSec%.1f,""" +
        f""""encode_vec_per_sec":${(n / encodeSec).toLong}%d,""" +
        f""""queries":$nQ%d,"search_sec":$searchSec%.1f,""" +
        f""""recall_at_10":$recall%.3f}}""")
    }
    spark.stop()
  }
}
