package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.WordPieceVocab

/** WordPiece: the codegen kernel must equal the naive reference munch
  * bit-for-bit, obey BERT's whole-word-[UNK] and max-chars contracts,
  * and round-trip decode for UNK-free text. */
class WordPieceSpec extends SparkSuite {

  import spark.implicits._

  private def vocabOf(pieces: String*): WordPieceVocab =
    new WordPieceVocab(pieces.toArray.sortWith(Bpe.utf8Less))

  test("greedy longest-match-first with continuation ids") {
    val v = vocabOf("un", "aff", "able", "a", "b", "l", "e", "f", "n", "u")
    // "unaffable" → un ##aff ##able (the BERT paper's worked example
    // shape): maximal munch takes the longest piece at every step
    val ids = v.encodeWord("unaffable")
    val pieceOf = (id: Int) =>
      if (id <= v.pieces.length) (v.pieces(id - 1), true)
      else (v.pieces(id - v.pieces.length - 1), false)
    assert(ids.map(pieceOf).toSeq ==
      Seq(("un", true), ("aff", false), ("able", false)))
  }

  test("kernel equals the naive reference munch on a fuzzed corpus") {
    val rnd = new scala.util.Random(421)
    val alphabet = "abcde"
    val pieces = (1 to 40).map { _ =>
      val len = 1 + rnd.nextInt(4)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.distinct ++ alphabet.take(3).map(_.toString) // some singles missing
    val v = new WordPieceVocab(pieces.distinct.toArray.sortWith(Bpe.utf8Less))
    (1 to 500).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(12)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(v.encodeWord(w).toSeq == WordPiece.encodeWordLocal(w, v),
        s"word $w")
    }
  }

  test("whole word becomes [UNK] when any position fails") {
    val v = vocabOf("ab", "a", "b")
    // "abz": 'z' unreachable → the ENTIRE word is one [UNK], not ab+UNK
    assert(v.encodeWord("abz").toSeq == Seq(v.unkId))
    assert(WordPiece.encodeWordLocal("abz", v) == Seq(v.unkId))
    // and over-long words are [UNK] outright
    val tiny = new WordPieceVocab(Array("a"), maxWordChars = 4)
    assert(tiny.encodeWord("aaaaa").toSeq == Seq(tiny.unkId))
    assert(tiny.encodeWord("aaaa").length == 4)
  }

  test("corpus encode via the kernel equals per-word reference concat") {
    val docs = Seq(
      (1L, "abc ab a"), (2L, "cab bc"), (3L, ""), (4L, "  ab  "))
      .toDF("doc_id", "text")
    val v = vocabOf("ab", "bc", "a", "b", "c")
    val got = WordPiece.encodeIds(docs, v)
      .as[(Long, Seq[Int])].collect().toMap
    val want = Map(
      1L -> ("abc ab a".split(" ").filter(_.nonEmpty)
        .flatMap(WordPiece.encodeWordLocal(_, v)).toSeq),
      2L -> ("cab bc".split(" ").filter(_.nonEmpty)
        .flatMap(WordPiece.encodeWordLocal(_, v)).toSeq),
      3L -> Seq.empty[Int],
      4L -> WordPiece.encodeWordLocal("ab", v).toSeq)
    assert(got == want)
  }

  test("decode round-trips UNK-free text modulo spaces") {
    val docs = Seq((1L, "abc ab"), (2L, "ccc")).toDF("doc_id", "text")
    val v = vocabOf("ab", "a", "b", "c")
    val back = WordPiece.decodeIds(WordPiece.encodeIds(docs, v), v)
      .as[(Long, String)].collect().toMap
    assert(back == Map(1L -> "abcab", 2L -> "ccc"))
  }

  test("training derives the BPE inventory; persistence round-trips") {
    val docs = (1 to 60).map(i => (i.toLong,
      if (i % 2 == 0) "alpha beta alpha" else "beta gamma alpha"))
      .toDF("doc_id", "text")
    val model = WordPiece.train(docs, nMerges = 10)
    assert(model.pieces.length > 0)
    assert(model.pieces.toSeq == model.pieces.toSeq.sortWith(Bpe.utf8Less))
    assert(model.pieces.distinct.length == model.pieces.length)
    val dir = java.nio.file.Files.createTempDirectory("wp").toString
    WordPiece.writeModel(model, spark, dir)
    val back = WordPiece.loadModel(spark, dir)
    assert(back.pieces.toSeq == model.pieces.toSeq)
    assert(back.maxWordChars == model.maxWordChars)
    // the loaded model encodes identically
    val a = WordPiece.encodeIds(docs, model).as[(Long, Seq[Int])].collect().toMap
    val b = WordPiece.encodeIds(docs, back).as[(Long, Seq[Int])].collect().toMap
    assert(a == b)
  }

  test("kernel takes the codegen path (no interpreted fallback)") {
    val v = vocabOf("ab", "a", "b")
    val e = graft.functions.WordPieceEncode(
      org.apache.spark.sql.catalyst.expressions.Literal("ab ab"), v)
    val fallback = classOf[
      org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
    assert(!fallback.isAssignableFrom(classOf[graft.functions.WordPieceEncode]))
    assert(!fallback.isAssignableFrom(classOf[graft.functions.WordPieceDecode]))
    // generated Java must compile: evaluate through a codegen'd projection
    val proj = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateMutableProjection.generate(Seq(e))
    val row = proj(org.apache.spark.sql.catalyst.InternalRow.empty)
    assert(row.getArray(0).numElements() == 2)
  }
}
