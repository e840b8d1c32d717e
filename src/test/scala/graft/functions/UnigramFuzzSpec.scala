package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite
import graft.functions.MinHashSignature.splitmix64

/** Adversarial property fuzz for the unigram kernels (the
  * QcFuzzSpec/BpeFuzzSpec discipline): random unicode text — including
  * multi-space runs, surrogate pairs, OOV characters — must (a) decode
  * back to the space-stripped text with U+FFFD exactly at OOV
  * positions, (b) produce identical ids through the codegen'd column
  * path and the interpreted eval path, and (c) yield E-step expected
  * counts that are sane (non-negative, per-word totals ≈ expected
  * piece count of the word). */
class UnigramFuzzSpec extends SparkSuite {

  private val alphabet =
    "abcdeé🎈語 " // incl. a space, a combining-free accent, an astral cp

  private def randText(seed: Long, len: Int): String = {
    val cps = alphabet.codePoints().toArray
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < len) {
      val c = cps((splitmix64(seed * 1013 + i).abs % cps.length).toInt)
      sb.appendCodePoint(c)
      i += 1
    }
    sb.toString
  }

  private def model(): UnigramModel = {
    import spark.implicits._
    // train on a corpus over a SUBSET of the alphabet so some fuzz
    // characters are genuinely OOV
    val docs = (0 until 50).map { i =>
      (i.toLong, randText(i, 40).replace("é", "a").replace("🎈", "b"))
    }.toDF("doc_id", "text")
    graft.operators.Unigram.modelOf(
      graft.operators.Unigram.train(docs, vocabSize = 40,
        maxPieceLen = 3, seedSize = 80))
  }

  test("300-text fuzz: round-trip, codegen == interpreted, sane E-step") {
    import spark.implicits._
    val m = model()
    val texts = (0 until 300).map(i => (i.toLong, randText(1000 + i, 30)))
    // codegen'd column path
    val viaColumn = graft.operators.Unigram.encodeIds(
      texts.toDF("doc_id", "text"), m)
      .as[(Long, Seq[Int])].collect().toMap
    texts.foreach { case (id, t) =>
      // interpreted path: direct kernel call
      val direct = m.encodeIds(UTF8String.fromString(t))
        .toIntArray().toSeq
      assert(direct == viaColumn(id),
        s"codegen/interpreted divergence on ${t.take(40)}")
      // round-trip: decode must reproduce the space-stripped text with
      // U+FFFD exactly where characters are OOV
      val decoded = m.decodeIds(
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(direct.toArray)).toString
      val stripped = t.replace(" ", "")
      assert(decoded.length == stripped.length ||
        decoded.codePointCount(0, decoded.length) ==
          stripped.codePointCount(0, stripped.length),
        s"length drift on ${t.take(40)}: '$decoded' vs '$stripped'")
      val strippedCps = stripped.codePoints().toArray
      val decodedCps = decoded.codePoints().toArray
      assert(decodedCps.length == strippedCps.length)
      strippedCps.zip(decodedCps).foreach { case (want, got) =>
        if (m.idOf(new String(Character.toChars(want))) >= 0)
          assert(got == want, s"known char lost in ${t.take(40)}")
        else assert(got == 0xFFFD,
          s"OOV char not U+FFFD in ${t.take(40)}")
      }
    }
    // E-step sanity on the fuzz words
    texts.take(60).foreach { case (_, t) =>
      t.split(" ").filter(_.nonEmpty).foreach { w =>
        val arr = m.expectedCounts(UTF8String.fromString(w))
        var total = 0L
        var i = 0
        while (i < arr.numElements()) {
          val mc = arr.getStruct(i, 2).getLong(1)
          assert(mc > 0, s"non-positive expected count for '$w'")
          total += mc
          i += 1
        }
        // expected piece count is between 1 and the word's cp length
        val n = w.codePointCount(0, w.length)
        assert(total <= n * 1000000L + 1000,
          s"'$w' expected-count total $total above $n pieces")
      }
    }
  }

  test("RotateVector: codegen == interpreted; malformed length throws") {
    import spark.implicits._
    val dim = 4
    val rot = Array.tabulate(dim * dim) { i =>
      ((splitmix64(i.toLong) % 1000) / 1000.0).toFloat
    }
    val vecs = (0 until 50).map { i =>
      (i.toLong, Seq.tabulate(dim)(d =>
        ((splitmix64(i.toLong * 31 + d) % 2000) / 1000.0).toFloat))
    }
    val viaColumn = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        QuantExpressions.rotate(col("embedding"), rot, dim).as("r"))
      .as[(Long, Seq[Float])].collect().toMap
    vecs.foreach { case (id, v) =>
      val expr = RotateVector(
        org.apache.spark.sql.catalyst.expressions.Literal
          .create(v, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)), rot, dim)
      val direct = expr.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toFloatArray().toSeq
      assert(direct == viaColumn(id), s"divergence on vec $id")
    }
    // short row must fail loudly, not read garbage
    val bad = RotateVector(
      org.apache.spark.sql.catalyst.expressions.Literal
        .create(Seq(1f, 2f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)), rot, dim)
    intercept[IllegalArgumentException] { bad.eval(null) }
  }
}
