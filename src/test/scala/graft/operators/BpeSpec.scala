package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** All three BPE training paths (naive local reference, incremental
  * local, batched distributed) must be bit-identical, and the encode
  * kernel must reproduce training's segmentation exactly (naive
  * in-rank-order apply). */
class BpeSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def corpusWords(): Map[String, Long] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .as[(String, Long)].collect().toMap
  }

  test("train (local fast path) equals the single-threaded reference") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val trained = Bpe.train(docs, nMerges = 12)
      .as[(Int, String, String, Long)].collect().toSeq
    val reference = Bpe.trainLocal(corpusWords(), nMerges = 12)
    assert(trained == reference)
    assert(trained.size == 12)
    assert(trained.map(_._1) == (1 to 12))
  }

  test("incremental local trainer matches the naive reference at depth") {
    // 200 merges exercises count-delta bookkeeping, index staleness,
    // and queue reordering far past where the first divergence would hide
    val words = corpusWords()
    assert(Bpe.trainLocalFast(words, 200) == Bpe.trainLocal(words, 200))
  }

  test("batched distributed trainer matches the reference bit-for-bit") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val distributed = Bpe.trainDistributed(docs, nMerges = 24)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(distributed == Bpe.trainLocal(corpusWords(), nMerges = 24))
  }

  test("handcrafted corpus: winner rule and overlap semantics") {
    import spark.implicits._
    // "aaab" x3, "ab" x2: pairs (a,a)=6, (a,b)=5 → first merge (a,a);
    // left-to-right apply on "aaab" gives [aa, a, b], NOT [a, aa, b]
    val docs = Seq("aaab aaab aaab ab ab").toDF("text")
    val merges = Bpe.train(docs, nMerges = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges.head == ((1, "a", "a", 6L)))
    // after merge 1: "aaab" → [aa, a, b] (pairs (aa,a)=3, (a,b)=5 w/ ab)
    assert(merges(1) == ((2, "a", "b", 5L)))
    // the distributed path agrees on the same handcrafted corpus
    val dist = Bpe.trainDistributed(docs, nMerges = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(dist == merges)
  }

  test("batch selection: ties and shared symbols stop the prefix") {
    // a FULLY disjoint, exhausted pair space admits everything — no
    // conflicting pair exists, so merges cannot create new pairs and
    // even head ties commute (the proof in selectBatch's scaladoc)
    val tied = Seq(("a", "b", 10L), ("c", "d", 10L), ("e", "f", 3L))
    assert(Bpe.selectBatch(tied, remaining = 8,
      symbols = Set("a", "b", "c", "d", "e", "f"),
      exhausted = true) == tied)
    // but a tie WITH an excluded (conflicting) pair must shrink to the
    // always-exact single merge: the created pairs could tie-and-win
    val tiedConflict = Seq(("a", "b", 10L), ("c", "d", 10L),
      ("e", "b", 10L))
    assert(Bpe.selectBatch(tiedConflict, remaining = 8,
      symbols = Set("a", "b", "c", "d", "e"),
      exhausted = true) == tiedConflict.take(1))
    // disjoint strictly-descending prefix admits; shared symbol stops it
    val ok = Seq(("a", "b", 10L), ("c", "d", 8L), ("a", "d", 6L),
      ("e", "f", 5L))
    assert(Bpe.selectBatch(ok, remaining = 8,
      symbols = Set("a", "b", "c", "d", "e", "f"),
      exhausted = true) == ok.take(2))
    // concatenation colliding with a live symbol stops the prefix
    val collide = Seq(("a", "b", 10L), ("c", "d", 8L))
    assert(Bpe.selectBatch(collide, remaining = 8,
      symbols = Set("a", "b", "c", "d", "cd"),
      exhausted = true) == collide.take(1))
  }

  test("training is deterministic across runs") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = Bpe.train(docs, 8).as[(Int, String, String, Long)].collect().toSeq
    val b = Bpe.train(docs, 8).as[(Int, String, String, Long)].collect().toSeq
    assert(a == b)
  }

  test("encode kernel equals the naive in-rank-order apply, bit-for-bit") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = Bpe.train(docs, nMerges = 30)
    val model = Bpe.rankModel(merges, docs)
    val ms = merges.orderBy("rank").select("left", "right")
      .as[(String, String)].collect().toSeq
    val kernel = Bpe.encodeTokens(docs, model)
      .as[(Long, Seq[String])].collect().toMap
    val texts = docs.select("doc_id", "text")
      .as[(Long, String)].collect()
    texts.foreach { case (id, text) =>
      val ref = text.split(" ").filter(_.nonEmpty)
        .flatMap(w => Bpe.encodeWordLocal(w, ms)).toSeq
      assert(kernel(id) == ref, s"doc $id tokens diverge")
    }
  }

  test("token ids: bijective over the corpus, concat round-trips text") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = Bpe.train(docs, nMerges = 30)
    val model = Bpe.rankModel(merges, docs)
    // no OOV when the model's charset comes from the same corpus
    val ids = Bpe.encodeIds(docs, model).as[(Long, Seq[Int])].collect()
    assert(ids.forall(_._2.forall(i => i >= 0 && i < model.vocabSize)))
    // ids and tokens are the same segmentation: token count matches
    val toks = Bpe.encodeTokens(docs, model)
      .as[(Long, Seq[String])].collect().toMap
    assert(ids.forall { case (id, v) => v.size == toks(id).size })
    // tokens re-concatenate to the original words
    val texts = docs.select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    toks.foreach { case (id, ts) =>
      assert(ts.mkString == texts(id).split(" ").filter(_.nonEmpty).mkString)
    }
  }

  test("decode inverts encode: per-word exact, per-doc space-stripped") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = Bpe.train(docs, nMerges = 30)
    val model = Bpe.rankModel(merges, docs)
    // whole-document round-trip: ids carry no word boundaries, so the
    // decoded text is the original minus spaces (kernel path, codegen'd)
    val decoded = Bpe.decodeIds(Bpe.encodeIds(docs, model), model)
      .as[(Long, String)].collect().toMap
    val texts = docs.select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    texts.foreach { case (id, t) =>
      assert(decoded(id) == t.split(" ").filter(_.nonEmpty).mkString,
        s"doc $id decode(encode) != space-stripped text")
    }
    // per-WORD round-trip is exact (one word = one ids row)
    val words = texts.values.flatMap(_.split(" ")).filter(_.nonEmpty)
      .toSeq.distinct.take(200).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }
    val wordsDf = words.toDF("doc_id", "text")
    val wordDecoded = Bpe.decodeIds(Bpe.encodeIds(wordsDf, model), model)
      .as[(Long, String)].collect().toMap
    words.foreach { case (i, w) =>
      assert(wordDecoded(i) == w, s"word '$w' does not round-trip")
    }
    // OOV ids decode to the replacement character, not garbage
    val oov = Seq((0L, Seq(-1, 0))).toDF("doc_id", "ids")
    val out = Bpe.decodeIds(oov, model).as[(Long, String)].collect().head._2
    assert(out.startsWith("�"))
  }
}
