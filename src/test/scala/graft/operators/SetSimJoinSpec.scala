package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** ppjoin-style prefix filtering: exactness (same verified edges as the
  * complete inverted index — on a brute-force oracle too), and the point
  * of it — candidate-pair volume collapsing on a boilerplate-heavy
  * corpus where every doc shares hot shingles. */
class SetSimJoinSpec extends SparkSuite {
  import spark.implicits._

  /** Planted corpus: all docs share a boilerplate block (hot shingles,
    * df = nDocs) + a unique tail; each doc in the first half has a true
    * near-dup partner (one tail token changed) in the second half. */
  private def planted(nDocs: Int): DataFrame = {
    val half = nDocs / 2
    val boiler = (1 to 12).map(i => s"boiler$i").mkString(" ")
    def uniq(i: Int) = (1 to 20).map(j => s"u${i}_$j").mkString(" ")
    val texts = (0 until half).map(i => (i.toLong, s"$boiler ${uniq(i)}")) ++
      (0 until half).map { i =>
        val t = s"$boiler ${uniq(i)}".split(" "); t(20) = "CHANGED"
        ((i + half).toLong, t.mkString(" "))
      }
    texts.toDF("doc_id", "text")
      .select(col("doc_id"), array_distinct(
        graft.functions.TextFunctions.shingles3(col("text"))).as("sset"))
      .select(col("doc_id"), size(col("sset")).as("n"), col("sset"))
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("prefix candidates are a subset of the complete inverted index") {
    val docs = planted(40).localCheckpoint()
    val all = pairSet(SetSimJoin.candidatesAll(docs))
    val pre = pairSet(SetSimJoin.candidatesPrefix(docs, 1, 2))
    assert(pre.subsetOf(all))
    assert(pre.size < all.size, "hot shingles must fall out of prefixes")
  }

  test("completeness: every J>=t pair survives prefix filtering (brute oracle)") {
    val docs = planted(40).localCheckpoint()
    // brute-force qualifying pairs straight from the set definition
    val sets = docs.select(col("doc_id"), col("sset"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      if inter * 3 >= sets(a).size + sets(b).size // J >= 1/2, integer-exact
    } yield (a, b)).toSet
    assert(want.nonEmpty, "fixture must contain true near-dups")
    val pre = pairSet(SetSimJoin.candidatesPrefix(docs, 1, 2))
    assert(want.subsetOf(pre), s"lost pairs: ${want -- pre}")
    // and verification recovers exactly the qualifying pairs
    assert(pairSet(SetSimJoin.verify(
      SetSimJoin.candidatesPrefix(docs, 1, 2), docs, 1, 2)) == want)
  }

  test("verified edges identical through both candidate paths") {
    val docs = planted(60).localCheckpoint()
    val viaAll = pairSet(SetSimJoin.verify(
      SetSimJoin.candidatesAll(docs), docs, 1, 2))
    val viaPre = pairSet(SetSimJoin.verify(
      SetSimJoin.candidatesPrefix(docs, 1, 2), docs, 1, 2))
    assert(viaAll == viaPre && viaAll.nonEmpty)
  }

  test("boilerplate corpus: candidate volume drops >=10x under prefix filtering") {
    val docs = planted(200).localCheckpoint()
    val nAll = SetSimJoin.candidatesAll(docs).count()   // ~ C(200,2): hot keys
    val nPre = SetSimJoin.candidatesPrefix(docs, 1, 2).count()
    assert(nAll >= 10 * nPre,
      s"expected >=10x reduction, got all=$nAll prefix=$nPre")
  }

  test("threshold is a rational: stricter thresholds shrink candidates") {
    val docs = planted(40).localCheckpoint()
    val loose = SetSimJoin.candidatesPrefix(docs, 1, 2).count()  // J >= 0.5
    val tight = SetSimJoin.candidatesPrefix(docs, 3, 4).count()  // J >= 0.75
    assert(tight <= loose)
    // verification at J >= 0.75 still finds the planted one-token edits
    // (a mid-tail edit leaves J ≈ 27/33 ≈ 0.82)
    assert(SetSimJoin.verify(
      SetSimJoin.candidatesPrefix(docs, 3, 4), docs, 3, 4).count() > 0)
  }
}
