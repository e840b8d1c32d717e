package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The extensions entry point makes custom expressions SQL-addressable. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("vec_dot is callable from spark.sql") {
    // extensions bind at session build: build a sibling session on the
    // SHARED SparkContext (never stop it — other suites use it)
    val base = SparkSuite.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = spark.sql(
        """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d
          |""".stripMargin).collect().head.getDouble(0)
      assert(r == 11.0)
      // round-11 registrations: XOR+popcount hamming over BINARY codes
      // and the Normalizer-backed unicode form expression
      val h = spark.sql(
        "SELECT bq_hamming(X'FF00', X'0F01') AS h")
        .collect().head.getInt(0)
      assert(h == 5) // F^0 = 4 bits + 0^1 = 1 bit
      val nfc = spark.sql(
        "SELECT unicode_normalize('e" + "\u0301" + "', 'NFC') AS s")
        .collect().head.getString(0)
      assert(nfc == "\u00e9", "NFC should compose e + combining acute")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
