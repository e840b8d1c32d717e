package graft.queries

import graft.SparkSuite

/** Invariants for the training-data pipeline family (oracle hash-match is
  * the primary gate; these pin semantic properties the hash can't). */
class PipelineSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"


  test("span_excise reconstructs planted maximal repeated regions exactly") {
    import spark.implicits._
    // doc 1: 40 unique tokens; doc 2 embeds doc 1's tokens 5..24 (a
    // 20-token run) at positions 10..29; doc 3 all-unique; doc 4 repeats
    // its own first 8 tokens at position 12 (within-doc repeat)
    val a = (0 until 40).map(i => s"a$i")
    val doc2 = (0 until 10).map(i => s"x$i") ++ a.slice(5, 25) ++
      (0 until 10).map(i => s"y$i")
    val doc4 = (0 until 8).map(i => s"b$i") ++ (0 until 4).map(i => s"c$i") ++
      (0 until 8).map(i => s"b$i")
    val docs = Seq(
      (1L, a.mkString(" ")),
      (2L, doc2.mkString(" ")),
      (3L, (0 until 30).map(i => s"z$i").mkString(" ")),
      (4L, doc4.mkString(" "))).toDF("doc_id", "text")
    val out = Pipeline.spanExcise(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((2L, 10L, 29L, 20L), (4L, 12L, 19L, 8L)), out)
  }

  test("sample_weighted: equals the local A-ES reference; weight laws hold") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // distributed sample == the same key math computed locally
    val got = graft.SparkEntry.queries("q_sample_weighted")(spark, sf)
      .select("doc_id").as[Long].collect().toSeq
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("double").as("w"))
      .as[(Long, Double)].collect()
    // local md5-52-bit hash, no Spark: the reference must derive u
    // independently of the engine under test
    def h52(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(13), 16)
    }
    val keys = docs.map { case (id, w) =>
      val uu = (h52(id) + 1).toDouble * 2.220446049250313e-16
      (id, math.floor((1e6 * -math.log(uu)) / w).toLong)
    }
    val want = keys.sortBy { case (id, k) => (k, id) }.take(200)
      .map(_._1).sorted.toSeq
    assert(got == want, "distributed sample diverged from local A-ES")
    // determinism across runs
    val again = graft.SparkEntry.queries("q_sample_weighted")(spark, sf)
      .select("doc_id").as[Long].collect().toSeq
    assert(again == got)
    // weight laws on a planted frame: near-zero weight never sampled,
    // dominant weight always sampled (same key math, same hash)
    val planted = (0L until 100L).map(i =>
      (i, if (i == 7L) 1e9 else if (i == 13L) 1e-12 else 1.0))
    val pk = planted.map { case (id, w) =>
      val uu = (h52(id) + 1).toDouble * 2.220446049250313e-16
      (id, (1e6 * -math.log(uu)) / w)
    }.sortBy { case (id, k) => (k, id) }.take(10).map(_._1)
    assert(pk.contains(7L), "dominant weight missed the sample")
    assert(!pk.contains(13L), "near-zero weight entered the sample")
  }

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

  test("chunk_windows: full coverage, 64-token cap, stride-48 starts") {
    import spark.implicits._
    val rows = Pipeline.queries("q_chunk_windows")(spark, sf)
      .as[(Long, Long, Int, String)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 <= 64))
    val nTokens = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id", "size(split(text, ' ')) AS n")
      .as[(Long, Int)].collect().toMap
    rows.groupBy(_._1).foreach { case (doc, cs) =>
      val byId = cs.sortBy(_._2)
      assert(byId.map(_._2) == (1L to cs.size))
      // chunk i covers tokens (i-1)*48+1 .. min((i-1)*48+64, n): sizes
      // follow exactly (stride < window means the last TWO can be partial)
      byId.foreach { case (_, cid, sz, _) =>
        assert(sz == math.min(64, nTokens(doc) - (cid.toInt - 1) * 48))
      }
    }
    // tiny docs chunk without crashing: 1 token -> exactly one chunk
    val dir = java.nio.file.Files.createTempDirectory("chunks").toString
    Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val tiny = Pipeline.queries("q_chunk_windows")(spark, dir)
      .as[(Long, Long, Int, String)].collect().toSeq
    assert(tiny.map(t => (t._1, t._2, t._3)).toSet ==
      Set((1L, 1L, 1), (2L, 1L, 1)))
  }

  test("mix_sample: src0 keeps everything, rates fall with the threshold") {
    import spark.implicits._
    val kept = Pipeline.queries("q_mix_sample")(spark, sf)
      .as[(Long, String, Long)].collect().toSeq
    val bySrc = kept.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc("src0") == 25)          // weight 1.0: every doc kept
    assert(bySrc.getOrElse("src1", 0) < 25)
    // deterministic: second run identical
    val again = Pipeline.queries("q_mix_sample")(spark, sf)
      .as[(Long, String, Long)].collect().toSeq
    assert(kept.sortBy(_._1) == again.sortBy(_._1))
  }

  test("tfidf: 3 ranked terms per doc, present in the doc") {
    import spark.implicits._
    val rows = Pipeline.queries("q_tfidf")(spark, sf)
      .as[(Long, Int, String, Long)].collect().toSeq
    rows.groupBy(_._1).foreach { case (_, terms) =>
      assert(terms.map(_._2).sorted == (1 to terms.size) && terms.size <= 3)
    }
    val texts = graft.Tables.documents(spark, sf)
      .as[(Long, String, String, String, Long)].collect()
      .map(r => r._1 -> r._2.split(" ").toSet).toMap
    assert(rows.forall(r => texts(r._1).contains(r._3)))
  }

  test("source_cap: at most 15 docs per source, lowest ids win") {
    import spark.implicits._
    val rows = Pipeline.queries("q_source_cap")(spark, sf)
      .as[(Long, String, Int)].collect().toSeq
    val bySrc = rows.groupBy(_._2)
    assert(bySrc.values.forall(_.size <= 15))
    val all = graft.Tables.documents(spark, sf)
      .select("doc_id", "source")
      .as[(Long, String)].collect().toSeq.groupBy(_._2)
    bySrc.foreach { case (src, keptRows) =>
      val expect = all(src).map(_._1).sorted.take(15).toSet
      assert(keptRows.map(_._1).toSet == expect)
    }
  }

  test("token_rarity: scores bounded by the rarest/commonest token") {
    import spark.implicits._
    val rows = Pipeline.queries("q_token_rarity")(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.size == 500)
    // avg frequency ratio is a probability: (0, 1] scaled by 1e6
    assert(rows.forall(r => r._3 > 0 && r._3 <= 1000000))
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

  test("token budget mix: greedy maximal prefix per source, never over") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = Pipeline.queries("q_mix_token_budget")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // recompute the fill locally from the raw table: docs in
    // (n_chars desc, doc_id) order, take while cumulative ≤ alloc
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok"))
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(r => (-r._2, r._3)).map(_._4).toSeq).toMap
    got.foreach { case (src, (alloc, nDocs, used)) =>
      val ordered = docs(src)
      val prefix = ordered.take(nDocs.toInt)
      assert(prefix.sum == used, s"$src: used $used != ${prefix.sum}")
      assert(used <= alloc, s"$src: spent past the allocation")
      // maximality: the next doc in order would cross the budget
      if (nDocs.toInt < ordered.size)
        assert(used + ordered(nDocs.toInt) > alloc,
          s"$src: under-filled — next doc still fits")
    }
    // every source with a positive allocation is represented
    assert(got.nonEmpty && got.values.forall(_._2 >= 1))
  }

  test("curriculum: tiers ascend within shards, quartile-balanced, complete") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Pipeline.queries("q_curriculum")(spark, sf)
      .as[(Long, Long, Long, Int)].collect().toSeq
    val nDocs = graft.Tables.documents(spark, sf).count()
    // complete and exhaustive: every doc exactly once
    assert(rows.length == nDocs && rows.map(_._1).distinct.length == nDocs)
    rows.groupBy(_._3).foreach { case (shard, g) =>
      val ordered = g.sortBy(_._4)
      // positions are 1..|shard| dense
      assert(ordered.map(_._4) == (1 to g.size), s"shard $shard holes")
      // the curriculum law: tier never decreases along training order
      val tiers = ordered.map(_._2)
      assert(tiers == tiers.sorted, s"shard $shard not easy→hard")
    }
    // calibrated quartiles: each tier holds ~25% globally (value ties
    // can skew small sources, so a loose band)
    val byTier = rows.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byTier.keySet.subsetOf(Set(0L, 1L, 2L, 3L)))
    byTier.values.foreach(n =>
      assert(n > nDocs / 10 && n < nDocs / 2, byTier.toString))
  }

  test("collocations: PMI sign and support laws, local recount agrees") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = Pipeline.queries("q_collocations")(spark, sf)
      .as[(String, String, Long, Long)].collect()
    assert(got.length > 0 && got.length <= 100)
    // support filter and rank order hold
    assert(got.forall(_._3 >= 5), "support filter broke")
    assert(got.map(_._4).toSeq == got.map(_._4).sortBy(-_).toSeq)
    // local recount: every reported pair's count and PMI match a
    // single-threaded pass over the corpus
    val toks = graft.Tables.documents(spark, sf)
      .select(col("text")).as[String].collect()
      .map(_.split(" ").filter(_.nonEmpty))
    val bigs = toks.filter(_.length >= 2)
      .flatMap(ts => ts.dropRight(1).zip(ts.drop(1)))
    val cb = bigs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cx = bigs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cy = bigs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = bigs.length.toDouble
    got.foreach { case (p, c, cxy, pmiU) =>
      assert(cb((p, c)) == cxy, s"count of ($p,$c)")
      val want = math.floor(1000000 *
        math.log(cxy.toDouble * n / (cx(p).toDouble * cy(c).toDouble))).toLong
      assert(pmiU == want, s"pmi of ($p,$c): $pmiU vs $want")
    }
  }

  test("vocab growth: cumulatives consistent, types sum to the corpus") {
    import spark.implicits._
    val rows = Pipeline.queries("q_vocab_growth")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == (0L to 9L), "all ten deciles present")
    // cumulatives are exact running sums of the per-decile columns
    assert(rows.map(_._2).scanLeft(0L)(_ + _).tail == rows.map(_._3))
    assert(rows.map(_._4).scanLeft(0L)(_ + _).tail == rows.map(_._5))
    // total new types = corpus-wide distinct 3-gram count; instances
    // sum to total shingles
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
      .select(col("text")).as[String].collect()
      .map(_.split(" ").filter(_.nonEmpty))
    val grams = docs.filter(_.length >= 3)
      .flatMap(_.sliding(3).map(_.mkString(" ")))
    assert(rows.last._5 == grams.distinct.length.toLong)
    assert(rows.last._3 == grams.length.toLong)
    // a growth curve on real data: later deciles add FEWER new types
    // than the first (Heaps-law shape, not a degenerate flat corpus)
    assert(rows.head._4 > rows.last._4)
  }

  test("dsir: target-domain docs outrank; score equals the local LR sum") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = Pipeline.queries("q_dsir_sample")(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.length == 50)
    assert(got.map(_._3) == got.map(_._3).sortBy(-_), "rank order")
    // local reference: same add-1-smoothed unigram LR in the same
    // operand order
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    val all = docs.flatMap(d => d._3.split(" ").filter(_.nonEmpty))
    val tgt = docs.filter(d => d._2 == "src0" || d._2 == "src1")
      .flatMap(d => d._3.split(" ").filter(_.nonEmpty))
    val ca = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ct = tgt.groupBy(identity).view.mapValues(_.length.toLong).toMap
      .withDefaultValue(0L)
    val (tA, tT, v) = (all.length.toDouble, tgt.length.toDouble,
      ca.size.toDouble)
    val lrU = ca.map { case (t, c) =>
      t -> math.floor(1000000 * math.log(
        ((ct(t).toDouble + 1) * (tA + v)) /
          ((c.toDouble + 1) * (tT + v)))).toLong
    }
    val scores = docs.map { d =>
      val ts = d._3.split(" ").filter(_.nonEmpty)
      (d._1, ts.length.toLong, ts.map(lrU).sum)
    }
    val want = scores.sortBy(s => (-s._3, s._1)).take(50).toSeq
    assert(got == want, "distributed DSIR diverged from local reference")
  }
}
