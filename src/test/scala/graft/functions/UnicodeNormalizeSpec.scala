package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** UnicodeNormalize vs java.text.Normalizer ground truth: composition,
  * stability, compatibility forms, and null propagation. All non-ASCII
  * is written as \\u escapes — composed and decomposed forms of the same
  * glyph are indistinguishable in source otherwise. */
class UnicodeNormalizeSpec extends SparkSuite {

  private val composed = "\u00e9"       // é precomposed
  private val decomposed = "e\u0301"    // e + combining acute

  private def one(s: String, form: String = "NFC"): String = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(TextFunctions.unicodeNormalize(col("t"), form).as("n"))
      .collect().head.getString(0)
  }

  test("NFC composes decomposed sequences and is stable on composed") {
    assert(one(decomposed) == composed)
    assert(one(composed) == composed)
    assert(one("ascii stays") == "ascii stays")
    // Hangul: conjoining jamo (U+1100 U+1161) compose to syllable U+AC00
    assert(one("\u1100\u1161") == "\uac00")
  }

  test("NFD/NFKC/NFKD forms match java.text.Normalizer") {
    assert(one(composed, "NFD") == decomposed)
    // compatibility: ligature fi (U+FB01) and fullwidth digits fold
    assert(one("\ufb01n", "NFKC") == "fin")
    assert(one("\uff11\uff12", "NFKC") == "12")
    assert(one("\ufb01", "NFC") == "\ufb01") // canonical keeps the ligature
    assert(one(composed, "NFKD") == decomposed)
  }

  test("null propagates; batch of mixed rows round-trips") {
    import spark.implicits._
    val out = Seq(Some(decomposed), None, Some("plain"))
      .toDF("t")
      .select(TextFunctions.unicodeNormalize(col("t")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some(composed), None, Some("plain")))
  }
}
