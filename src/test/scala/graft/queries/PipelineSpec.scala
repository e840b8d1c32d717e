package graft.queries

import graft.SparkSuite

/** Invariants for the training-data pipeline family (oracle hash-match is
  * the primary gate; these pin semantic properties the hash can't). */
class PipelineSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("split_hash: deterministic, exhaustive, and roughly proportional") {
    import spark.implicits._
    val a = Pipeline.queries("q_split_hash")(spark, sf)
      .as[(Long, Long, String)].collect().toSeq
    val b = Pipeline.queries("q_split_hash")(spark, sf)
      .as[(Long, Long, String)].collect().toSeq
    assert(a == b) // content-hash split: identical across runs
    val bySplit = a.groupBy(_._3).view.mapValues(_.size).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    val n = a.size.toDouble
    assert(bySplit("train") / n > 0.8) // 90% nominal
    assert(bySplit.values.sum == a.size) // every doc assigned exactly once
  }

  test("pack_sequences: pack ids are monotone and windows respect capacity") {
    import spark.implicits._
    val rows = Pipeline.queries("q_pack_sequences")(spark, sf)
      .as[(Long, Long, Int, Long, Long)].collect().toSeq
    rows.groupBy(_._2).foreach { case (_, shard) =>
      val ordered = shard.sortBy(_._1)
      // cumulative totals strictly increase; pack ids never decrease
      assert(ordered.zip(ordered.tail).forall { case (x, y) =>
        x._4 <= y._4 && x._5 <= y._5 })
      // a pack's PRECEDING total stays under its window's upper bound
      ordered.foreach { case (_, _, nTok, cum, pack) =>
        assert((cum - nTok) / 2048 == pack)
      }
    }
  }

  test("contamination: only corpus docs reported, all with real overlap") {
    import spark.implicits._
    val rows = Pipeline.queries("q_contamination")(spark, sf)
      .as[(Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.forall(_._1 >= 20)) // benchmark docs never self-report
    assert(rows.forall(_._2 > 0))
  }

  test("pii_scrub: redaction counts match what the scrub removed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pii").toString
    Seq((1L, "mail me at bob@example.com or call 5551234"),
        (2L, "no pii here"), (3L, "ids 123456 and 98765"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q_pii_scrub")(spark, dir)
      .as[(Long, Int, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(1L) == ((1, 1))) // one email, one long number
    assert(rows(2L) == ((0, 0)))
    assert(rows(3L) == ((0, 2)))
  }
}
