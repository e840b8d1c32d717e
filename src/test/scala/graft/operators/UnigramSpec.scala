package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite
import graft.functions.{BpeRanks, UnigramModel}

/** Unigram-LM tokenizer contract: the distributed trainer must equal
  * the single-threaded reference bit-for-bit (the fixed-point E-step
  * makes the aggregation order-free), the Viterbi kernel must find the
  * true max-score segmentation (pinned against exhaustive enumeration
  * on short words), and encode/decode must round-trip. */
class UnigramSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def corpusWords(): Map[String, Long] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .as[(String, Long)].collect().toMap
  }

  private def tableOf(m: UnigramModel): Seq[(Int, String, Long)] =
    m.pieces.indices.map(i => (i, m.pieces(i), m.logpMicro(i)))

  test("distributed training equals the single-threaded reference") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dist = Unigram.train(docs, vocabSize = 160, maxPieceLen = 4,
      seedSize = 400, emIters = 2)
      .as[(Int, String, Long)].collect().toSeq
    val local = Unigram.trainLocal(corpusWords(), vocabSize = 160,
      maxPieceLen = 4, seedSize = 400, emIters = 2)
    assert(dist == tableOf(local))
    assert(dist.size <= 400)
    // every single code point of the corpus survives pruning (atoms)
    val atoms = corpusWords().keys
      .flatMap(w => BpeRanks.codePoints(w)).toSet
    val pieces = dist.map(_._2).toSet
    assert(atoms.subsetOf(pieces))
  }

  test("Viterbi kernel equals exhaustive enumeration on short words") {
    // planted vocabulary with distinct logps → unique optima, so the
    // independent enumeration pins the DP exactly
    // ASCII pieces: UTF-8 byte order == natural string order
    val pieces = Array("a", "ab", "b", "ba", "bab", "c").sorted
    val logp = Array(-1000000L, -1500000L, -1200000L, -2100000L,
      -1700000L, -3000000L)
    val m = new UnigramModel(pieces, logp)
    def enumBest(w: String): Long = {
      val cps = BpeRanks.codePoints(w)
      def go(i: Int): Long =
        if (i == cps.length) 0L
        else (i + 1 to cps.length).map { j =>
          val s = cps.slice(i, j).mkString
          val id = m.idOf(s)
          val lp =
            if (id >= 0) m.logpMicro(id)
            else if (j - i == 1) UnigramModel.OovPenaltyMicro
            else Long.MinValue / 4
          val rest = go(j)
          if (lp < Long.MinValue / 8 || rest < Long.MinValue / 8)
            Long.MinValue / 4
          else lp + rest
        }.max
      go(0)
    }
    def kernelScore(w: String): Long =
      m.viterbiWord(w).map { id =>
        if (id >= 0) m.logpMicro(id) else UnigramModel.OovPenaltyMicro
      }.sum
    for (w <- Seq("abab", "babab", "aabb", "cab", "abcba", "bbbb",
        "ababab", "x", "axb"))
      assert(kernelScore(w) == enumBest(w), s"word $w")
  }

  test("single-path word pins the E-step expected count exactly") {
    // vocabulary {a}: the word "a" has exactly one segmentation, so
    // the expected count of piece a is exactly 1.0 → 1e6 micro-units
    val m = new UnigramModel(Array("a"), Array(-500000L))
    val arr = m.expectedCounts(UTF8String.fromString("a"))
    assert(arr.numElements() == 1)
    val row = arr.getStruct(0, 2)
    assert(row.getInt(0) == 0 && row.getLong(1) == 1000000L)
  }

  test("planted morphemes are learned as pieces and shrink the encoding") {
    import spark.implicits._
    // a corpus whose words are concatenations of 3 morphemes: the
    // trained vocabulary must contain them, and encoding must use
    // far fewer tokens than characters
    val morphs = Seq("ing", "pre", "fix")
    val words = for (a <- morphs; b <- morphs) yield a + b
    val text = (words ++ words ++ morphs).mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val table = Unigram.train(docs, vocabSize = 12, maxPieceLen = 3,
      seedSize = 40, emIters = 2)
    val model = Unigram.modelOf(table)
    assert(morphs.forall(m => model.idOf(m) >= 0),
      s"pieces: ${model.pieces.mkString(",")}")
    val nTok = Unigram.encodeIds(docs, model)
      .select(sum(size(col("ids")))).collect()(0).getLong(0)
    val nChars = text.replace(" ", "").length.toLong * 2
    assert(nTok * 2 <= nChars, s"$nTok tokens vs $nChars chars")
  }

  test("encode/decode round-trips the space-stripped text; OOV is U+FFFD") {
    import spark.implicits._
    val docs = Seq((1L, "ingpre fixing prefix")).toDF("doc_id", "text")
    val model = Unigram.modelOf(Unigram.train(docs, vocabSize = 20,
      maxPieceLen = 3, seedSize = 30))
    val enc = Unigram.encodeIds(docs, model)
    val dec = Unigram.decodeIds(enc, model)
      .select("text").collect()(0).getString(0)
    assert(dec == "ingprefixingprefix")
    // unseen char at encode time → -1 sentinel → U+FFFD at decode
    val oov = Seq((2L, "inqing")).toDF("doc_id", "text")
    val ids = Unigram.encodeIds(oov, model)
      .select("ids").collect()(0).getSeq[Int](0)
    assert(ids.contains(-1))
    val decOov = Unigram.decodeIds(Unigram.encodeIds(oov, model), model)
      .select("text").collect()(0).getString(0)
    assert(decOov.contains('�') && decOov.startsWith("in"))
  }

  test("model persistence round-trips bit-for-bit") {
    import spark.implicits._
    val docs = Seq((1L, "abc abd abe")).toDF("doc_id", "text")
    val model = Unigram.modelOf(Unigram.train(docs, vocabSize = 16,
      maxPieceLen = 3, seedSize = 24))
    val dir = java.nio.file.Files
      .createTempDirectory("unigram-model").toString
    Unigram.writeModel(model, spark, dir)
    val back = Unigram.loadModel(spark, dir)
    assert(back.pieces.toSeq == model.pieces.toSeq)
    assert(back.logpMicro.toSeq == model.logpMicro.toSeq)
  }
}
