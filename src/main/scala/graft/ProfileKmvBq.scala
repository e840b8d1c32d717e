package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bq, Sketch}

/** Scale sweeps for the two round-11 bounded-state additions:
  *
  *  - KMV: distinct-estimate accuracy + runtime at corpus-scale row
  *    counts (the shuffle is ≤ k rows per partition however many rows
  *    feed it — the sweep shows runtime tracking the SCAN, not the
  *    distinct count), plus the snapshot-intersection estimate.
  *  - BQ: train (exact median) / encode / search throughput at 1M
  *    vectors on [[ProfileAnn.vectors]].
  *
  * Usage: runMain graft.ProfileKmvBq [kmvRows bqVecs]
  * (default 10000000 1000000)
  */
object ProfileKmvBq {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("profile-kmvbq")
    import spark.implicits._
    val kmvRows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val bqVecs = args.drop(1).headOption.map(_.toLong).getOrElse(1000000L)

    // --- KMV: 10M rows, 1M distincts, two overlapping "snapshots"
    val k = 1024
    val distincts = kmvRows / 10
    val rows = spark.range(kmvRows)
      .select(concat(lit("t"), pmod(col("id"), lit(distincts))).as("t"),
        col("id"))
    val t0 = System.nanoTime()
    val sk = Sketch.kmv(rows, "t", k)
    val est = Sketch.kmvEstimate(sk, k)
    val kmvSec = (System.nanoTime() - t0) / 1e9
    // snapshots: [0, 0.6) and [0.4, 1.0) of the distinct space — true
    // overlap 0.2/0.8 of the union
    val a = rows.filter(pmod(col("id"), lit(distincts)) < distincts * 6 / 10)
    val b = rows.filter(pmod(col("id"), lit(distincts)) >= distincts * 4 / 10)
    val t1 = System.nanoTime()
    val ka = Sketch.kmv(a, "t", k)
    val kb = Sketch.kmv(b, "t", k)
    val inter = Sketch.kmvIntersectEstimate(ka, kb, k)
    val setSec = (System.nanoTime() - t1) / 1e9
    val trueInter = distincts * 2 / 10
    println(f"""{"kmv":{"rows":$kmvRows%d,"distincts":$distincts%d,""" +
      f""""k":$k%d,"est":${est.toLong}%d,""" +
      f""""err_pct":${math.abs(est - distincts) / distincts * 100}%.2f,""" +
      f""""sketch_sec":$kmvSec%.1f,"intersect_est":${inter.toLong}%d,""" +
      f""""intersect_true":$trueInter%d,""" +
      f""""intersect_err_pct":${math.abs(inter - trueInter) / trueInter * 100}%.2f,""" +
      f""""setops_sec":$setSec%.1f}}""")

    // --- BQ: 1M 64-dim vectors
    val emb = ProfileAnn.vectors(spark, bqVecs).localCheckpoint()
    val t2 = System.nanoTime()
    val model = Bq.train(emb)
    val trainSec = (System.nanoTime() - t2) / 1e9
    val t3 = System.nanoTime()
    val codes = Bq.encode(emb, model).localCheckpoint()
    codes.count()
    val encodeSec = (System.nanoTime() - t3) / 1e9
    val queries = emb.filter(col("vec_id") % (bqVecs / 100) === 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
      .localCheckpoint()
    val nQ = queries.count()
    val t4 = System.nanoTime()
    val got = Bq.searchRerank(codes, model, emb, queries,
        topK = 10, shortlist = 100)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val searchSec = (System.nanoTime() - t4) / 1e9
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
    println(f"""{"bq":{"n":$bqVecs%d,"train_sec":$trainSec%.1f,""" +
      f""""encode_sec":$encodeSec%.1f,""" +
      f""""encode_vec_per_sec":${(bqVecs / encodeSec).toLong}%d,""" +
      f""""queries":$nQ%d,"search_sec":$searchSec%.1f,""" +
      f""""recall_rerank100":$recall%.3f}}""")
    spark.stop()
  }
}
