package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** JSONL ingest: schema-enforced parse, corrupt-line quarantine. */
class JsonlCorpusSpec extends SparkSuite {

  test("clean lines parse; malformed lines quarantine, none vanish") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jsonl").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "a"}""",
      """{"doc_id": 2, "text": "zweites dokument", "lang": "de", "source": "b"}""",
      """{"doc_id": 3, "text": "truncated upload""",          // malformed
      """not json at all""",                                   // malformed
      """{"doc_id": 4, "text": "last", "lang": "en", "source": "a"}""")
    Files.write(Paths.get(dir, "part0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val (clean, dead) = JsonlCorpus.split(
      JsonlCorpus.read(spark, s"$dir/part0.jsonl"))
    val docs = clean.select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(docs.map(_._1) == Seq(1L, 2L, 4L))
    assert(docs.head._2 == "hello world")
    // both bad lines land in the dead letter, verbatim
    val deadLines = dead.as[String].collect().toSeq
    assert(deadLines.size == 2)
    assert(deadLines.exists(_.contains("truncated upload")))
    assert(deadLines.contains("not json at all"))
    // nothing vanished: clean + dead == input lines
    assert(docs.size + deadLines.size == lines.size)
  }
}
