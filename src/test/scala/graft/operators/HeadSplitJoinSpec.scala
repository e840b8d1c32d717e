package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Skew.headSplitJoin: the Zipf-head-hardened scoring join must equal
  * the plain inner equi-join row-for-row, while routing head keys
  * through a broadcast and spreading their rows through the cold
  * exchange under per-row keys (the r14 hardening of dsirScores /
  * q_unigram_logprob / q_bigram_logprob). */
class HeadSplitJoinSpec extends SparkSuite {

  import spark.implicits._

  // synthetic Zipf instance frame: token t0 owns ~50% of instances,
  // t1 ~25%, … — the hot-head shape; ~40 distinct tokens over 20k rows
  private def zipf(n: Int) = spark.range(n.toLong)
    .select(col("id").as("doc_id"),
      concat(lit("t"), floor(log(2.0,
        pmod(xxhash64(col("id")), lit(1 << 16)) + 1)).cast("long"))
        .as("token"))

  test("head-split ≡ plain join; single key, value preserved") {
    val big = zipf(20000).localCheckpoint()
    val small = big.groupBy("token").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val hot = small.orderBy(col("tf").desc, col("token")).limit(3)
    val got = Skew.headSplitJoin(big, small, Seq("token"),
        col("doc_id"), hot)
      .select("doc_id", "token", "tf")
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    val want = big.join(small, Seq("token"))
      .select("doc_id", "token", "tf")
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.length == want.length && got.sameElements(want))
  }

  test("head-split ≡ plain join; composite key") {
    val big = zipf(20000)
      .select(col("doc_id"), col("token").as("prev"),
        concat(lit("c"), pmod(col("doc_id"), lit(7))).as("cur"))
      .localCheckpoint()
    val small = big.groupBy("prev", "cur").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val hot = small.orderBy(col("c").desc, col("prev"), col("cur"))
      .limit(5)
    val got = Skew.headSplitJoin(big, small, Seq("prev", "cur"),
        col("doc_id"), hot)
      .select("doc_id", "prev", "cur", "c")
      .as[(Long, String, String, Long)].collect()
      .sortBy(r => (r._1, r._2, r._3))
    val want = big.join(small, Seq("prev", "cur"))
      .select("doc_id", "prev", "cur", "c")
      .as[(Long, String, String, Long)].collect()
      .sortBy(r => (r._1, r._2, r._3))
    assert(got.length == want.length && got.sameElements(want))
  }

  test("composite keys with colliding concatenations stay distinct") {
    // ("the","rapist") and ("th","erapist") concatenate identically —
    // without the 0x1F unit separator both cold bigrams would land on
    // one __sk key and each big row would match BOTH cold rows
    val big = Seq(
      (1L, "the", "rapist"), (2L, "th", "erapist"),
      (3L, "the", "rapist"), (4L, "a", "bc"), (5L, "ab", "c"),
      (6L, "hot", "key"), (7L, "hot", "key"))
      .toDF("doc_id", "prev", "cur").localCheckpoint()
    val small = big.groupBy("prev", "cur").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // force every ambiguous pair onto the COLD path: the hot set is the
    // one unambiguous key, so collisions must be resolved by __sk alone
    val hot = small.filter(col("prev") === "hot")
    val got = Skew.headSplitJoin(big, small, Seq("prev", "cur"),
        col("doc_id"), hot)
      .select("doc_id", "prev", "cur", "c")
      .as[(Long, String, String, Long)].collect()
      .sortBy(r => (r._1, r._2, r._3))
    val want = big.join(small, Seq("prev", "cur"))
      .select("doc_id", "prev", "cur", "c")
      .as[(Long, String, String, Long)].collect()
      .sortBy(r => (r._1, r._2, r._3))
    assert(got.length == want.length, // a collision would DUPLICATE rows
      s"row count drifted: got ${got.length}, want ${want.length}")
    assert(got.sameElements(want))
    // and the counts themselves disambiguate: ("the","rapist") seen 2×
    val byKey = got.map(r => ((r._2, r._3), r._4)).toMap
    assert(byKey(("the", "rapist")) == 2L && byKey(("th", "erapist")) == 1L)
  }

  test("property: random collision-prone corpora ≡ plain join (seeded)") {
    // seeded-RNG property (the PartitionerSpec discipline — no
    // scalatest↔scalacheck bridge offline): composite keys drawn from
    // {a, aa, ab, b, ba, bb} maximize concatenation ambiguity
    // ((a,ab)=(aa,b), (a,ba)=(ab,a), …); random hot-set size sweeps
    // the broadcast/cold split point through every regime
    val rnd = new scala.util.Random(42)
    val alpha = Vector("a", "aa", "ab", "b", "ba", "bb")
    (1 to 4).foreach { trial =>
      val n = 300 + rnd.nextInt(700)
      val big = (0 until n).map { i =>
        (i.toLong, alpha(rnd.nextInt(alpha.size)),
          alpha(rnd.nextInt(alpha.size)))
      }.toDF("doc_id", "prev", "cur").localCheckpoint()
      val small = big.groupBy("prev", "cur").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val hotK = rnd.nextInt(10) // 0 = pure cold … 9 ≈ full broadcast
      val hot = small.orderBy(col("c").desc, col("prev"), col("cur"))
        .limit(hotK)
      val got = Skew.headSplitJoin(big, small, Seq("prev", "cur"),
          col("doc_id"), hot)
        .select("doc_id", "prev", "cur", "c")
        .as[(Long, String, String, Long)].collect()
        .sortBy(r => (r._1, r._2, r._3))
      val want = big.join(small, Seq("prev", "cur"))
        .select("doc_id", "prev", "cur", "c")
        .as[(Long, String, String, Long)].collect()
        .sortBy(r => (r._1, r._2, r._3))
      assert(got.length == want.length && got.sameElements(want),
        s"trial $trial (n=$n hotK=$hotK) diverged: " +
          s"${got.length} vs ${want.length} rows")
    }
  }

  test("requireMatch: missing key fails loudly instead of nulling") {
    val big = Seq((1L, "a"), (2L, "b"), (3L, "zzz"))
      .toDF("doc_id", "token").localCheckpoint()
    val small = Seq(("a", 10L), ("b", 20L)).toDF("token", "tf")
      .localCheckpoint()
    val hot = small.orderBy(col("tf").desc).limit(1)
    val ex = intercept[Exception] {
      Skew.headSplitJoin(big, small, Seq("token"), col("doc_id"), hot,
        requireMatch = true).collect()
    }
    assert(ex.getMessage.contains("missing from scoring table") ||
      Option(ex.getCause).exists(
        _.getMessage.contains("missing from scoring table")),
      s"wrong failure: ${ex.getMessage}")
    // and a fully-covered corpus passes untouched under the guard
    val ok = Skew.headSplitJoin(big.filter(col("token") =!= "zzz"),
        small, Seq("token"), col("doc_id"), hot, requireMatch = true)
      .select("doc_id", "tf").as[(Long, Long)].collect().toMap
    assert(ok == Map(1L -> 10L, 2L -> 20L))
  }

  test("plan: head rides a broadcast, tail a shuffled hash join") {
    val big = zipf(5000).localCheckpoint()
    val small = big.groupBy("token").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val hot = small.orderBy(col("tf").desc, col("token")).limit(3)
    val df = Skew.headSplitJoin(big, small, Seq("token"),
      col("doc_id"), hot)
    df.count()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"hot head stopped broadcasting:\n${plan.take(2000)}")
    assert(plan.contains("ShuffledHashJoin"),
      s"cold tail lost its SHJ pin:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"), "SMJ crept in")
  }

  test("degenerate hot sets: empty, full, and single-key corpora") {
    import org.apache.spark.sql.functions.{col, count, lit}
    def check(big: org.apache.spark.sql.DataFrame,
        hotK: Int): Unit = {
      val small = big.groupBy("token").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val hot = small.orderBy(col("tf").desc, col("token")).limit(hotK)
      val got = Skew.headSplitJoin(big, small, Seq("token"),
          col("doc_id"), hot)
        .select("doc_id", "token", "tf")
        .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
      val want = big.join(small, Seq("token"))
        .select("doc_id", "token", "tf")
        .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
      assert(got.length == want.length && got.sameElements(want),
        s"hotK=$hotK diverged")
    }
    val z = zipf(3000).localCheckpoint()
    check(z, 0)      // empty head: pure cold path
    check(z, 100000) // full head: pure broadcast path, empty cold build
    // a corpus that is ONE key entirely — the maximal-skew extreme
    val one = spark.range(2000)
      .select(col("id").as("doc_id"),
        org.apache.spark.sql.functions.lit("only").as("token"))
      .localCheckpoint()
    check(one, 1)
    check(one, 0)
  }

  test("contract edge: a big key absent from small surfaces as null") {
    import org.apache.spark.sql.functions.{col, count, lit}
    // documented divergence from the plain INNER join (which drops the
    // row): the scoring table is supposed to derive from big's own
    // corpus, so absence is a caller bug — it must surface as a null
    // score, not a silently shrunk result
    val big = Seq((1L, "a"), (2L, "b"), (3L, "zzz"))
      .toDF("doc_id", "token").localCheckpoint()
    val small = Seq(("a", 10L), ("b", 20L)).toDF("token", "tf")
      .localCheckpoint()
    val hot = small.orderBy(col("tf").desc).limit(1)
    val got = Skew.headSplitJoin(big, small, Seq("token"),
        col("doc_id"), hot)
      .select("doc_id", "tf").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(10L), 2L -> Some(20L), 3L -> None))
    assert(small.agg(count(lit(1))).as[Long].head() == 2L)
  }

  test("hot rows spread: no surviving key carries the head's mass") {
    // the invariant the split exists for — group the cold exchange's
    // join key: every head instance carries a per-doc key, so the
    // largest single-key group is the hottest TAIL key, not the head
    val big = zipf(20000).localCheckpoint()
    val small = big.groupBy("token").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val hot = small.orderBy(col("tf").desc, col("token")).limit(3)
    val hotSet = hot.select("token").as[String].collect().toSet
    val tagged = Skew.headSplitJoin(big, small, Seq("token"),
      col("doc_id"), hot)
    // reconstruct the shuffle key the cold join used: hot rows → per-doc
    val keyMass = tagged
      .select(when(col("token").isin(hotSet.toSeq: _*),
        concat(lit("spread:"), col("doc_id"))).otherwise(col("token"))
        .as("k"))
      .groupBy("k").count().agg(max("count")).as[Long].head()
    val headMass = big.filter(col("token").isin(hotSet.toSeq: _*)).count()
    assert(keyMass < headMass / 10,
      s"hot keys still concentrate: max single-key mass $keyMass vs " +
        s"head mass $headMass")
  }
}
