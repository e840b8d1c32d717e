package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.functions.MinHashSignature.splitmix64
import graft.operators.GraphAnn

/** Streaming graph-index maintenance: a micro-batch of new vectors is
  * HNSW-inserted into the materialized index and landed as a corpus
  * epoch; appended vectors must be findable from existing queries, and
  * an epoch REPLAY (duplicate edge append) must not change any search
  * result — the at-least-once edges are semantically idempotent
  * because search dedups adjacency. */
class GraphAnnStreamSpec extends SparkSuite {

  import spark.implicits._

  private def planted(n: Int, dim: Int = 16, nClusters: Int = 5) = {
    val rows = (0 until n).map { i =>
      val c = i % nClusters
      val raw = Array.tabulate(dim) { d =>
        (if (d == c) 8.0 else 0.0) +
          (splitmix64(i.toLong * dim + d) % 1000) / 1000.0
      }
      val norm = math.sqrt(raw.map(x => x * x).sum)
      (i.toLong, raw.map(x => (x / norm).toFloat).toSeq)
    }
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
  }

  test("streamed vectors are inserted, landed as an epoch, and findable; " +
      "replayed edges change nothing") {
    val all = planted(250).localCheckpoint()
    val initial = all.filter(col("vec_id") % 7 =!= 1).localCheckpoint()
    val newV = all.filter(col("vec_id") % 7 === 1).localCheckpoint()
    val root = Files.createTempDirectory("gstream").toString
    val indexDir = s"$root/index"
    val corpusDir = s"$root/corpus"
    initial.write.parquet(s"$corpusDir/epoch=0")
    GraphAnn.write(GraphAnn.build(initial, degree = 6, kCells = 5,
      iters = 2, probes = 2, descentRounds = 1), indexDir)

    val in = MemoryStream[(Long, Seq[Float])](spark)
    in.addData(newV.as[(Long, Seq[Float])].collect().toSeq: _*)
    val q = CorpusPipeline.startGraphAppend(
      in.toDF().toDF("vec_id", "embedding")
        .select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding")),
      indexDir, corpusDir, s"$root/ckpt", degree = 6,
      trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)

    // corpus grew by exactly the batch, in its own epoch partition
    val corpus = spark.read.parquet(corpusDir)
    assert(corpus.count() == all.count())
    assert(corpus.filter(col("epoch") > 0).count() == newV.count())

    // appended vectors are findable from existing queries
    val idx = GraphAnn.load(spark, indexDir)
    val queries = all.filter(col("vec_id") < 10 && col("vec_id") % 7 =!= 1)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val emb = corpus.select(col("vec_id"), col("embedding"))
    val first = GraphAnn.search(idx, emb, queries, topK = 5, ef = 16)
      .collect().toSeq
    val newIds = newV.select("vec_id").as[Long].collect().toSet
    val surfaced = first.map(_.getLong(2)).toSet & newIds
    assert(surfaced.nonEmpty,
      "no streamed vector surfaced — the insert did not take")

    // epoch replay: appending the SAME batch again duplicates edge
    // rows, but search results must be bit-identical
    GraphAnn.append(spark, indexDir, newV, initial, degree = 6)
    val replayed = GraphAnn.search(GraphAnn.load(spark, indexDir), emb,
      queries, topK = 5, ef = 16).collect().toSeq
    assert(replayed == first, "replayed epoch changed search results")
  }
}
