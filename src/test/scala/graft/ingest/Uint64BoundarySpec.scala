package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DecimalType

import ProtoSchema._

/** uint64 boundary proof (SURVEY §7.4.1): values above 2^63 — where a
  * signed Long would go negative — survive ProtoWire decode → parquet →
  * scan exactly, under both wire encodings (varint and fixed64).
  *
  * The DuckDB side of the round trip was verified against this exact
  * parquet shape: `SELECT * FROM read_parquet(...)` yields DECIMAL(20,0)
  * with identical digits for 2^63, 2^63+1, 2^64-1 (DuckDB reads parquet
  * DECIMAL(20,0) fixed-len-byte-array natively) — the same path
  * tools/check.py uses for every oracled query with a uint64 column.
  */
class Uint64BoundarySpec extends graft.SparkSuite {

  private val boundary = Seq(
    BigInt(0), BigInt(1), BigInt(Long.MaxValue),
    BigInt(Long.MaxValue) + 1,          // 2^63: first unrepresentable-as-Long
    BigInt(Long.MaxValue) + 12345,
    BigInt("18446744073709551615"))     // 2^64-1: uint64 max

  private def roundTrip(enc: PEncoding): Unit = {
    val msg = PMessage("U", Seq(PField(1, "v", PUInt64, encoding = enc)))
    val payloads = boundary.map(b => ProtoWire.encode(msg, Map("v" -> b)))
    import spark.implicits._
    val decoded = payloads.toDF("payload")
      .select(Decode.protoDecode(col("payload"), msg).as("d"))
      .select(col("d.v").as("v"))
    assert(decoded.schema("v").dataType == DecimalType(20, 0))
    val dir = Files.createTempDirectory("u64").toString + "/t"
    decoded.write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("v").dataType == DecimalType(20, 0))
    val got = back.collect().map(r => BigInt(r.getDecimal(0).toBigInteger)).toSet
    assert(got == boundary.toSet)
  }

  test("uint64 > 2^63 exact through decode → parquet → scan (varint)") {
    roundTrip(EVarint)
  }

  test("uint64 > 2^63 exact through decode → parquet → scan (fixed64)") {
    roundTrip(EFixed64)
  }
}
