package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** proto_decode expression semantics over DataFrames: typed output,
  * null-payload guard, strict-vs-lenient corrupt handling. */
class DecodeSpec extends SparkSuite {

  private def blocks(payloads: Seq[Array[Byte]]) = {
    import spark.implicits._
    payloads.zipWithIndex
      .map { case (p, i) => (i.toLong, s"0xb$i", p) }
      .toDF("block_number", "block_id", "payload")
  }

  test("decodes to the derived struct; provenance kept") {
    val good = ProtoWire.encode(SampleBlocks.output,
      SampleBlocks.samplePayload(7))
    val out = Decode.mainTable(blocks(Seq(good)), SampleBlocks.output)
    assert(out.columns.take(2).toSeq == Seq("block_number", "block_id"))
    val row = out.select("block_hash", "gas_used").collect().head
    assert(row.getString(0) == "0xhash7")
    assert(row.getDecimal(1) == new java.math.BigDecimal(7000000))
  }

  test("null payloads are filtered (nil-output guard, sinker.go:158-160)") {
    val good = ProtoWire.encode(SampleBlocks.output,
      SampleBlocks.samplePayload(1))
    val df = blocks(Seq(good, null))
    assert(Decode.mainTable(df, SampleBlocks.output).count() == 1)
  }

  test("strict mode fails on corrupt bytes; lenient yields null") {
    val good = ProtoWire.encode(SampleBlocks.output,
      SampleBlocks.samplePayload(1))
    val corrupt = Array[Byte](0x0a, 0x7f, 1) // truncated len-delimited
    val df = blocks(Seq(good, corrupt))
    intercept[Exception] {
      Decode.mainTable(df, SampleBlocks.output).count()
    }
    val lenient = df.select(col("block_number"),
      Decode.protoDecode(col("payload"), SampleBlocks.output, lenient = true)
        .as("decoded"))
    assert(lenient.filter(col("decoded").isNull).count() == 1)
    assert(lenient.filter(col("decoded").isNotNull).count() == 1)
  }
}
