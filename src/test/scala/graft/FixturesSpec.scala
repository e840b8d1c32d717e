package graft

/** The schema-drift gate itself, pinned: the current testdata matches
  * the FIXTURES.md contract, and a drifted table produces ONE named
  * diff (not an exception storm). */
class FixturesSpec extends SparkSuite {

  test("all sf0.001 tables match the contract schemas") {
    val ds = Fixtures.diffs(spark, "/root/testdata/sf0.001")
    assert(ds.isEmpty, ds.mkString("; "))
  }

  test("a drifted column type reports one named per-table diff") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fixtures-drift")
    // events with ts as LONG — the ns-era shape that motivated the gate
    Seq((1L, 2L, 3L, "signup", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val ds = Fixtures.diffs(spark, dir.toString)
    val evDiff = ds.filter(_.startsWith("events:"))
    assert(evDiff.size == 1 && evDiff.head.contains("ts:bigint"),
      s"expected one events diff naming ts:bigint, got $ds")
    // the other nine tables report unreadable, not a thrown exception
    assert(ds.size == Fixtures.expected.size)
  }

  test("events loader rejects a long-typed ts column") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fixtures-ts")
    Seq((1L, 2L, 3L, "signup", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] {
      Tables.events(spark, dir.toString)
    }
    assert(e.getMessage.contains("TIMESTAMP_NTZ"))
  }
}
