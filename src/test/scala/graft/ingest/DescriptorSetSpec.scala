package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.types._

import ProtoSchema._

/** Manifest-driven schema derivation (converter_proto.go:24-45 parity):
  * a real FileDescriptorSet / .spkg byte stream, parsed and resolved into
  * the same PMessage the hand-built ADT fixtures use, reproducing the
  * SURVEY §1.2 type table — including nested messages, maps, enums and
  * the uint64→Decimal(20,0) policy — and decoding identical rows.
  */
class DescriptorSetSpec extends graft.SparkSuite {

  private val files = DescriptorSet.parseFiles(DescriptorFixture.fileDescriptorSetBytes)

  test("parses file name, package, messages, enums; skips unmodeled fields") {
    assert(files.size == 1)
    val f = files.head
    assert(f.name == "graft/test/blocks.proto")
    assert(f.pkg == "graft.test")
    assert(f.messages.map(_.name) ==
      Seq("Meta", "Transfer", "Output", "AllTypes", "MetaMap", "Tree",
        "Grouped", "Loose"))
    assert(f.enums == Seq("Kind"))
    val out = f.messages.find(_.name == "Output").get
    assert(out.nested.map(_.name) == Seq("BalancesEntry"))
    assert(out.nested.head.mapEntry)
  }

  test("resolved Output matches the hand-built ADT schema exactly") {
    val m = DescriptorSet.resolve(files, "graft.test.Output")
    assert(toStructType(m) == toStructType(SampleBlocks.output))
    // encodings match too (they drive the decoder's wire handling)
    def encs(p: PMessage): Seq[(Int, Boolean, PEncoding)] =
      p.fields.map(f => (f.number, f.repeated, f.encoding))
    assert(encs(m) == encs(SampleBlocks.output))
    val tr = m.fields.find(_.name == "transfers").get.ptype.asInstanceOf[PMessage]
    assert(encs(tr) == encs(SampleBlocks.transfer))
    // map field resolved through the synthesized BalancesEntry
    assert(m.fields.find(_.name == "balances").get.ptype == PMap(PString, PInt64))
  }

  test("descriptor-derived schema decodes payloads identically to the ADT") {
    val m = DescriptorSet.resolve(files, "graft.test.Output")
    val payloads = (0L until 7L).map(i =>
      ProtoWire.encode(SampleBlocks.output, SampleBlocks.samplePayload(i)))
    def rows(schema: PMessage) = {
      import org.apache.spark.sql.functions.{col, to_json, struct}
      import spark.implicits._
      // to_json so binary columns compare by value (base64), not reference
      payloads.toDF("payload")
        .select(Decode.protoDecode(col("payload"), schema).as("d"))
        .select(to_json(struct(col("d.*"))).as("j"))
        .collect().map(_.getString(0)).toSeq
    }
    assert(rows(m).exists(_.contains("transfers")))
    assert(rows(m) == rows(SampleBlocks.output))
  }

  test("AllTypes reproduces the full §1.2 type table") {
    val m = DescriptorSet.resolve(files, "graft.test.AllTypes")
    val byName = m.fields.map(f => f.name -> f).toMap
    def check(n: String, pt: PType, enc: PEncoding, dt: DataType): Unit = {
      assert(byName(n).ptype == pt, n); assert(byName(n).encoding == enc, n)
      assert(toStructType(m)(n).dataType == dt, n)
    }
    check("f_double", PDouble, EFixed64, DoubleType)
    check("f_float", PFloat, EFixed32, FloatType)
    check("f_int64", PInt64, EVarint, LongType)
    check("f_uint64", PUInt64, EVarint, DecimalType(20, 0))
    check("f_int32", PInt32, EVarint, IntegerType)
    check("f_fixed64", PUInt64, EFixed64, DecimalType(20, 0))
    check("f_fixed32", PUInt32, EFixed32, LongType)
    check("f_bool", PBool, EVarint, BooleanType)
    check("f_string", PString, ELenDelim, StringType)
    check("f_bytes", PBytes, ELenDelim, BinaryType)
    check("f_uint32", PUInt32, EVarint, LongType)
    check("f_enum", PEnum, EVarint, IntegerType)
    check("f_sfixed32", PInt32, EFixed32, IntegerType)
    check("f_sfixed64", PInt64, EFixed64, LongType)
    check("f_sint32", PInt32, EZigZag, IntegerType)
    check("f_sint64", PInt64, EZigZag, LongType)
  }

  test("map with MESSAGE values resolves and decodes") {
    val m = DescriptorSet.resolve(files, "graft.test.MetaMap")
    val mapT = m.fields.head.ptype.asInstanceOf[PMap]
    assert(mapT.key == PString)
    assert(mapT.value.isInstanceOf[PMessage])
    assert(toStructType(m)("by_key").dataType ==
      ArrayType(StructType(Seq(
        StructField("key", StringType),
        StructField("value", StructType(Seq(
          StructField("seconds", LongType),
          StructField("nanos", IntegerType)))))), containsNull = true))
    // round-trip a payload through the resolved schema
    val payload = ProtoWire.encode(m, Map("by_key" -> Map(
      "b" -> Map("seconds" -> 7L, "nanos" -> 9),
      "a" -> Map("seconds" -> 5L, "nanos" -> 3))))
    val row = ProtoWire.decode(m, payload)
    val entries = row.getArray(0)
    assert(entries.numElements() == 2)
    // entry list sorted by key (determinism contract)
    val first = entries.getStruct(0, 2)
    assert(first.getUTF8String(0).toString == "a")
    assert(first.getStruct(1, 2).getLong(0) == 5L)
  }

  test(".spkg Package resolves to the same schema as the descriptor set") {
    val viaSpkg = DescriptorSet.parseFiles(DescriptorFixture.spkgBytes)
    assert(toStructType(DescriptorSet.resolve(viaSpkg, "graft.test.Output")) ==
      toStructType(DescriptorSet.resolve(files, "graft.test.Output")))
  }

  test("load() reads a manifest file end-to-end") {
    val p = Files.createTempFile("fixture", ".fdset")
    Files.write(p, DescriptorFixture.fileDescriptorSetBytes)
    val m = DescriptorSet.load(p.toString, "graft.test.Output")
    assert(toStructType(m) == toStructType(SampleBlocks.output))
  }

  test("unknown message lists what the set defines") {
    val e = intercept[IllegalArgumentException](
      DescriptorSet.resolve(files, "graft.test.Nope"))
    assert(e.getMessage.contains("graft.test.Output"))
  }

  test("recursive message types are rejected (no static schema exists)") {
    val e = intercept[IllegalArgumentException](
      DescriptorSet.resolve(files, "graft.test.Tree"))
    assert(e.getMessage.contains("recursive"))
  }

  test("proto2 groups are rejected") {
    val e = intercept[IllegalArgumentException](
      DescriptorSet.resolve(files, "graft.test.Grouped"))
    assert(e.getMessage.contains("group"))
  }

  test("type UNSET with type_name set resolves via the symbol tables") {
    // descriptor.proto: "If type_name is set, this need not be set" —
    // non-protoc producers emit such descriptors
    val m = DescriptorSet.resolve(files, "graft.test.Loose")
    val byName = m.fields.map(f => f.name -> f).toMap
    assert(byName("k").ptype == PEnum)
    assert(byName("m").ptype.isInstanceOf[PMessage])
    assert(byName("m").ptype.asInstanceOf[PMessage].fields.map(_.name) ==
      Seq("seconds", "nanos"))
  }

  test("deeply nested descriptors throw IAE, not StackOverflowError") {
    // shallow nesting parses fine…
    assert(DescriptorSet.parseFiles(DescriptorFixture.deepNestBytes(50)).nonEmpty)
    // …but a crafted over-deep manifest must hit the depth cap, keeping
    // the corrupt-manifest contract (IllegalArgumentException, never an
    // Error that would kill the executor thread)
    val e = intercept[IllegalArgumentException](
      DescriptorSet.parseFiles(DescriptorFixture.deepNestBytes(500)))
    assert(e.getMessage.contains("nesting"))
  }

  test("over-deep message reference chains are capped at resolve time") {
    val shallow = DescriptorSet.parseFiles(DescriptorFixture.chainBytes(50))
    assert(DescriptorSet.resolve(shallow, "graft.test.C0") != null)
    val deep = DescriptorSet.parseFiles(DescriptorFixture.chainBytes(150))
    val e = intercept[IllegalArgumentException](
      DescriptorSet.resolve(deep, "graft.test.C0"))
    assert(e.getMessage.contains("nesting"))
  }

  test("truncated manifests fail loudly (bounds-checked reader)") {
    val whole = DescriptorFixture.fileDescriptorSetBytes
    intercept[IllegalArgumentException](
      DescriptorSet.parseFiles(whole.dropRight(3)))
  }

  test("fuzz: corrupt manifests never hang or crash the JVM — they throw") {
    // manifests are untrusted input (downloaded .spkg files); the parser
    // must terminate with a clean error on garbage, truncations and bit
    // flips — same contract the payload decoder's fuzz suite pins
    val whole = DescriptorFixture.fileDescriptorSetBytes
    val rnd = new scala.util.Random(7)
    def attempt(bytes: Array[Byte]): Unit =
      try { val f = DescriptorSet.parseFiles(bytes); f.size: Unit }
      catch { case _: IllegalArgumentException => () }
    for (_ <- 1 to 50) { // random garbage
      val b = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(b); attempt(b)
    }
    for (_ <- 1 to 100) { // bit flips in a real manifest
      val b = whole.clone()
      val i = rnd.nextInt(b.length)
      b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      attempt(b)
    }
    for (n <- 0 until whole.length by 7) attempt(whole.take(n)) // truncations
  }
}
