package graft.ingest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import ProtoSchema._
import TestMessages._

/** Wire-format codec spec: encode with our writer, decode with the
  * engine's decoder, assert Catalyst-internal values. Covers every branch
  * of SURVEY.md §1.2's type table + wire-level edge cases (packed, zigzag,
  * unknown-field skip, absent→null, last-one-wins). */
class ProtoWireSpec extends AnyFunSuite {

  private def str(r: InternalRow, i: Int): String =
    r.get(i, null).asInstanceOf[UTF8String].toString
  private def arr(r: InternalRow, i: Int): ArrayData =
    r.get(i, null).asInstanceOf[ArrayData]
  private def row(a: ArrayData, i: Int): InternalRow =
    a.array(i).asInstanceOf[InternalRow]

  test("round-trip: full message") {
    val bytes = ProtoWire.encode(output, samplePayload(5))
    val r = ProtoWire.decode(output, bytes)
    assert(str(r, 0) == "0xhash5")
    assert(r.get(1, null) == Decimal(BigDecimal(5000000L), 20, 0))
    val transfers = arr(r, 2)
    assert(transfers.numElements() == 2) // 5 % 3
    val t0 = row(transfers, 0)
    assert(str(t0, 0) == "0xfrom5_0")
    assert(t0.get(2, null) == Decimal(BigDecimal(10), 20, 0))
    assert(t0.get(3, null) == 0) // log_index int32
    assert(t0.get(4, null) == 0) // kind enum number
    val topics = arr(t0, 5)
    assert(topics.numElements() == 2)
    assert(topics.array(0).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2))
    val touched = arr(r, 3)
    assert((0 until touched.numElements()).map(i =>
      touched.array(i).asInstanceOf[UTF8String].toString) ==
      Seq("0xacct5a", "0xacct5b"))
    val meta = r.get(5, null).asInstanceOf[InternalRow]
    assert(meta.get(0, null) == 1700000005L)
    assert(meta.get(1, null) == 35)
  }

  test("map entries decoded as entry list SORTED by key") {
    val bytes = ProtoWire.encode(output,
      Map("balances" -> Map("zz" -> 1L, "aa" -> 2L, "mm" -> 3L)))
    val r = ProtoWire.decode(output, bytes)
    val entries = arr(r, 4)
    val keys = (0 until entries.numElements())
      .map(i => row(entries, i).get(0, null).asInstanceOf[UTF8String].toString)
    assert(keys == Seq("aa", "mm", "zz"))
    assert(row(entries, 0).get(1, null) == 2L)
  }

  test("absent fields decode to null (converter_proto.go:137-140)") {
    val bytes = ProtoWire.encode(output, Map("block_hash" -> "only"))
    val r = ProtoWire.decode(output, bytes)
    assert(str(r, 0) == "only")
    (1 until 6).foreach(i => assert(r.isNullAt(i), s"field $i should be null"))
  }

  test("uint64 full unsigned range → Decimal(20,0)") {
    // 2^64 - 1: overflows Long, must survive as unsigned decimal
    val bytes = ProtoWire.encode(output,
      Map("gas_used" -> BigInt("18446744073709551615")))
    val r = ProtoWire.decode(output, bytes)
    assert(r.get(1, null) ==
      Decimal(BigDecimal("18446744073709551615"), 20, 0))
  }

  test("unknown field numbers are skipped per wire type") {
    val w = new ProtoWire.Writer
    w.tag(99, 0).varint(12345L)                 // unknown varint
    w.tag(98, 2).lenDelim("junk".getBytes)      // unknown len-delim
    w.tag(97, 1).fixed64(7L)                    // unknown fixed64
    w.tag(96, 5).fixed32(3)                     // unknown fixed32
    w.tag(1, 2).lenDelim("kept".getBytes)       // known: block_hash
    val r = ProtoWire.decode(output, w.toBytes)
    assert(str(r, 0) == "kept")
  }

  test("last-one-wins for non-repeated fields (wire spec)") {
    val w = new ProtoWire.Writer
    w.tag(1, 2).lenDelim("first".getBytes)
    w.tag(1, 2).lenDelim("second".getBytes)
    val r = ProtoWire.decode(output, w.toBytes)
    assert(str(r, 0) == "second")
  }

  test("packed repeated scalars decode (proto3 default encoding)") {
    val msg = PMessage("P", Seq(PField(1, "xs", PInt64, repeated = true)))
    val w = new ProtoWire.Writer
    val inner = new ProtoWire.Writer
    Seq(1L, 200L, 30000L).foreach(inner.varint)
    w.tag(1, 2).lenDelim(inner.toBytes)
    val r = ProtoWire.decode(msg, w.toBytes)
    val xs = arr(r, 0)
    assert((0 until 3).map(xs.array(_).asInstanceOf[Long]) == Seq(1L, 200L, 30000L))
  }

  test("zigzag encoding for sint fields") {
    val msg = PMessage("Z", Seq(
      PField(1, "s32", PInt32, encoding = EZigZag),
      PField(2, "s64", PInt64, encoding = EZigZag)))
    val bytes = ProtoWire.encode(msg, Map("s32" -> -7, "s64" -> -123456789L))
    val r = ProtoWire.decode(msg, bytes)
    assert(r.get(0, null) == -7)
    assert(r.get(1, null) == -123456789L)
  }

  test("fixed encodings + float/double/bool round-trip") {
    val msg = PMessage("F", Seq(
      PField(1, "f32", PFloat, encoding = EFixed32),
      PField(2, "f64", PDouble, encoding = EFixed64),
      PField(3, "sf64", PInt64, encoding = EFixed64),
      PField(4, "b", PBool),
      PField(5, "u32", PUInt32)))
    val bytes = ProtoWire.encode(msg, Map(
      "f32" -> 1.5f, "f64" -> -2.25, "sf64" -> -99L, "b" -> true,
      "u32" -> 0xFFFFFFFFL))
    val r = ProtoWire.decode(msg, bytes)
    assert(r.get(0, null) == 1.5f)
    assert(r.get(1, null) == -2.25)
    assert(r.get(2, null) == -99L)
    assert(r.get(3, null) == true)
    assert(r.get(4, null) == 0xFFFFFFFFL) // widened, not negative
  }

  test("property: round-trip id on randomized payloads") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val i = rnd.nextLong(1000)
      val bytes = ProtoWire.encode(output, samplePayload(i))
      val r = ProtoWire.decode(output, bytes)
      assert(str(r, 0) == s"0xhash$i")
      // proto3 wire format can't distinguish empty repeated from absent:
      // zero transfers decodes to null (reference appends null too)
      if (i % 3 == 0) assert(r.isNullAt(2))
      else assert(arr(r, 2).numElements() == (i % 3).toInt)
      // balances sorted by key regardless of input map order
      val entries = arr(r, 4)
      val keys = (0 until entries.numElements()).map(j =>
        row(entries, j).get(0, null).asInstanceOf[UTF8String].toString)
      assert(keys == keys.sorted)
    }
  }
  test("truncated buffer fails loudly instead of decoding garbage") {
    val bytes = ProtoWire.encode(output, samplePayload(5))
    intercept[IllegalArgumentException](
      ProtoWire.decode(output, bytes.dropRight(3)))
  }

  test("truncated nested message does not read sibling bytes") {
    // field 6 (meta), wire 2, len 2; inner: field 1 varint left UNTERMINATED
    // (0x80 continuation byte at the nested end) — the decoder must fail at
    // the nested extent, not continue into the sibling bytes that follow
    val buf = Array[Byte](0x32, 2, 0x08, 0x80.toByte, 0x08, 0x05)
    intercept[IllegalArgumentException](ProtoWire.decode(output, buf))
  }

  test("corrupt negative length-delimited varint terminates with an error") {
    // field 1, wire 2, then a 10-byte varint decoding to -1: before the
    // bounds check this moved the cursor BACKWARDS (non-terminating loop)
    val neg = Array.fill(9)(0xFF.toByte) :+ 0x01.toByte
    val buf = Array[Byte](0x0A) ++ neg
    intercept[IllegalArgumentException](ProtoWire.decode(output, buf))
  }

}
