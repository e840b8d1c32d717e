package graft.ingest

import java.nio.charset.StandardCharsets.UTF_8

import ProtoSchema._

/** Builds real `FileDescriptorSet` / substreams-`Package` fixture BYTES
  * for [[DescriptorSet]] tests — protoc is not in this environment, so the
  * fixture is encoded with our own wire writer against descriptor.proto's
  * public field numbers (the same numbers [[DescriptorSet]] reads; the
  * writer itself is independently pinned by ProtoWireSpec round-trips and
  * the fuzz property suite).
  *
  * The described package mirrors [[SampleBlocks.output]] exactly, plus an
  * `AllTypes` message covering every FieldDescriptorProto.Type, so specs
  * can assert descriptor-derived schemas byte-for-byte against the
  * hand-built ADT and decode real payloads through both.
  *
  * In .proto form:
  * {{{
  * syntax = "proto3"; package graft.test;
  * enum Kind { KIND_UNSPECIFIED = 0; MINT = 1; BURN = 2; }
  * message Meta { int64 seconds = 1; int32 nanos = 2; }
  * message Transfer {
  *   string from = 1; string to = 2; uint64 amount = 3;
  *   int32 log_index = 4; Kind kind = 5; repeated bytes topics = 6;
  * }
  * message Output {
  *   string block_hash = 1; uint64 gas_used = 2;
  *   repeated Transfer transfers = 3; repeated string touched_accounts = 4;
  *   map<string, int64> balances = 5; Meta meta = 6;
  * }
  * message AllTypes { ...all 16 non-group scalar kinds + enum... }
  * message Tree { Tree child = 1; }        // for the recursion guard
  * message Grouped { group G = 1 { ... } } // for the proto2-group guard
  * }}}
  */
object DescriptorFixture {

  // ---- descriptor.proto (the subset that determines a schema), as ADT --

  private val fieldProto = PMessage("FieldDescriptorProto", Seq(
    PField(1, "name", PString, encoding = ELenDelim),
    PField(3, "number", PInt32),
    PField(4, "label", PEnum),
    PField(5, "type", PEnum),
    PField(6, "type_name", PString, encoding = ELenDelim)))

  private val messageOptions = PMessage("MessageOptions", Seq(
    PField(7, "map_entry", PBool)))

  private val enumValue = PMessage("EnumValueDescriptorProto", Seq(
    PField(1, "name", PString, encoding = ELenDelim),
    PField(2, "number", PInt32)))

  private val enumProto = PMessage("EnumDescriptorProto", Seq(
    PField(1, "name", PString, encoding = ELenDelim),
    PField(2, "value", enumValue, repeated = true, encoding = ELenDelim)))

  // One level of message nesting is enough for the fixtures (map entries);
  // the ADT can't self-reference, so nested_type uses a leaf copy.
  private val descriptorLeaf = PMessage("DescriptorProto", Seq(
    PField(1, "name", PString, encoding = ELenDelim),
    PField(2, "field", fieldProto, repeated = true, encoding = ELenDelim),
    PField(7, "options", messageOptions, encoding = ELenDelim)))

  private val descriptor = PMessage("DescriptorProto", Seq(
    PField(1, "name", PString, encoding = ELenDelim),
    PField(2, "field", fieldProto, repeated = true, encoding = ELenDelim),
    PField(3, "nested_type", descriptorLeaf, repeated = true, encoding = ELenDelim),
    PField(7, "options", messageOptions, encoding = ELenDelim)))

  private val fileProto = PMessage("FileDescriptorProto", Seq(
    PField(1, "name", PString, encoding = ELenDelim),
    PField(2, "package", PString, encoding = ELenDelim),
    PField(4, "message_type", descriptor, repeated = true, encoding = ELenDelim),
    PField(5, "enum_type", enumProto, repeated = true, encoding = ELenDelim),
    PField(12, "syntax", PString, encoding = ELenDelim)))

  private val fileSet = PMessage("FileDescriptorSet", Seq(
    PField(1, "file", fileProto, repeated = true, encoding = ELenDelim)))

  // substreams Package: proto_files shares tag 1 with FileDescriptorSet's
  // file; the extra fields stand in for version/modules/metadata and must
  // be skipped by wire type.
  private val spkg = PMessage("Package", Seq(
    PField(1, "proto_files", fileProto, repeated = true, encoding = ELenDelim),
    PField(5, "version", PUInt64),
    PField(6, "image", PBytes, encoding = ELenDelim),
    PField(8, "network", PString, encoding = ELenDelim)))

  // ------------------------------------------------------ fixture content

  // FieldDescriptorProto.Type / .Label constants (descriptor.proto)
  private val LOpt = 1; private val LRep = 3

  private def fld(name: String, number: Int, tpe: Int, label: Int = LOpt,
      typeName: String = null): Map[String, Any] = {
    val base = Map[String, Any](
      "name" -> name, "number" -> number, "label" -> label, "type" -> tpe)
    if (typeName == null) base else base + ("type_name" -> typeName)
  }

  private val kindEnum = Map[String, Any]("name" -> "Kind", "value" -> Seq(
    Map[String, Any]("name" -> "KIND_UNSPECIFIED", "number" -> 0),
    Map[String, Any]("name" -> "MINT", "number" -> 1),
    Map[String, Any]("name" -> "BURN", "number" -> 2)))

  private val metaMsg = Map[String, Any]("name" -> "Meta", "field" -> Seq(
    fld("seconds", 1, 3 /*int64*/ ), fld("nanos", 2, 5 /*int32*/ )))

  private val transferMsg = Map[String, Any]("name" -> "Transfer", "field" -> Seq(
    fld("from", 1, 9 /*string*/ ), fld("to", 2, 9),
    fld("amount", 3, 4 /*uint64*/ ), fld("log_index", 4, 5 /*int32*/ ),
    fld("kind", 5, 14 /*enum*/, typeName = ".graft.test.Kind"),
    fld("topics", 6, 12 /*bytes*/, label = LRep)))

  private val outputMsg = Map[String, Any]("name" -> "Output",
    "field" -> Seq(
      fld("block_hash", 1, 9), fld("gas_used", 2, 4 /*uint64*/ ),
      fld("transfers", 3, 11 /*message*/, label = LRep,
        typeName = ".graft.test.Transfer"),
      fld("touched_accounts", 4, 9, label = LRep),
      fld("balances", 5, 11, label = LRep,
        typeName = ".graft.test.Output.BalancesEntry"),
      fld("meta", 6, 11, typeName = ".graft.test.Meta")),
    "nested_type" -> Seq(Map[String, Any]("name" -> "BalancesEntry",
      "field" -> Seq(fld("key", 1, 9), fld("value", 2, 3 /*int64*/ )),
      "options" -> Map[String, Any]("map_entry" -> true))))

  private val allTypesMsg = Map[String, Any]("name" -> "AllTypes", "field" -> Seq(
    fld("f_double", 1, 1), fld("f_float", 2, 2), fld("f_int64", 3, 3),
    fld("f_uint64", 4, 4), fld("f_int32", 5, 5), fld("f_fixed64", 6, 6),
    fld("f_fixed32", 7, 7), fld("f_bool", 8, 8), fld("f_string", 9, 9),
    fld("f_bytes", 10, 12), fld("f_uint32", 11, 13),
    fld("f_enum", 12, 14, typeName = ".graft.test.Kind"),
    fld("f_sfixed32", 13, 15), fld("f_sfixed64", 14, 16),
    fld("f_sint32", 15, 17), fld("f_sint64", 16, 18)))

  // map<string, Meta>: entry VALUE is a message — exercises the
  // recursive map-value resolution branch (converter_proto.go:176-199
  // appends message map values through the generic value path)
  private val metaMapMsg = Map[String, Any]("name" -> "MetaMap",
    "field" -> Seq(
      fld("by_key", 1, 11, label = LRep,
        typeName = ".graft.test.MetaMap.ByKeyEntry")),
    "nested_type" -> Seq(Map[String, Any]("name" -> "ByKeyEntry",
      "field" -> Seq(fld("key", 1, 9),
        fld("value", 2, 11, typeName = ".graft.test.Meta")),
      "options" -> Map[String, Any]("map_entry" -> true))))

  private val treeMsg = Map[String, Any]("name" -> "Tree", "field" -> Seq(
    fld("child", 1, 11, typeName = ".graft.test.Tree")))

  private val groupedMsg = Map[String, Any]("name" -> "Grouped", "field" -> Seq(
    fld("g", 1, 10 /*group*/, typeName = ".graft.test.Grouped")))

  // `type` deliberately UNSET (only type_name): descriptor.proto allows
  // this ("If type_name is set, this need not be set") and non-protoc
  // producers rely on it — resolution must classify via the symbol tables
  private val looseMsg = Map[String, Any]("name" -> "Loose", "field" -> Seq(
    Map[String, Any]("name" -> "k", "number" -> 1, "label" -> LOpt,
      "type_name" -> ".graft.test.Kind"),
    Map[String, Any]("name" -> "m", "number" -> 2, "label" -> LOpt,
      "type_name" -> ".graft.test.Meta")))

  private val fileValue = Map[String, Any](
    "name" -> "graft/test/blocks.proto",
    "package" -> "graft.test",
    "syntax" -> "proto3",
    "enum_type" -> Seq(kindEnum),
    "message_type" -> Seq(metaMsg, transferMsg, outputMsg, allTypesMsg,
      metaMapMsg, treeMsg, groupedMsg, looseMsg))

  /** protoc `--descriptor_set_out` analogue. */
  def fileDescriptorSetBytes: Array[Byte] =
    ProtoWire.encode(fileSet, Map("file" -> Seq(fileValue)))

  /** substreams `.spkg` analogue: same descriptors at tag 1 plus Package
    * fields (version/image/network) the parser must skip by wire type. */
  def spkgBytes: Array[Byte] =
    ProtoWire.encode(spkg, Map(
      "proto_files" -> Seq(fileValue),
      "version" -> BigInt("18446744073709551615"), // uint64 max, skipped
      "image" -> Array[Byte](0x50, 0x4e, 0x47, 0x00),
      "network" -> "mainnet"))

  // ---- adversarial fixtures (hand-rolled bytes — the ADT can't nest
  //      arbitrarily deep, which is exactly the point of these)

  private def varint(n: Int): Array[Byte] = {
    var v = n; val b = Array.newBuilder[Byte]
    while ((v & ~0x7f) != 0) { b += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
    b += v.toByte; b.result()
  }
  private def lenDelim(tag: Int, payload: Array[Byte]): Array[Byte] =
    Array(((tag << 3) | 2).toByte) ++ varint(payload.length) ++ payload

  /** A FileDescriptorSet whose single message nests `depth` levels of
    * DescriptorProto.nested_type — the StackOverflowError probe. */
  def deepNestBytes(depth: Int): Array[Byte] = {
    val leaf = lenDelim(1, "M".getBytes(UTF_8))
    val nested = (1 to depth).foldLeft(leaf)((inner, _) =>
      lenDelim(1, "M".getBytes(UTF_8)) ++ lenDelim(3, inner))
    val file = lenDelim(1, "deep.proto".getBytes(UTF_8)) ++
      lenDelim(2, "p".getBytes(UTF_8)) ++ lenDelim(4, nested)
    lenDelim(1, file)
  }

  /** A FileDescriptorSet with `n` top-level messages C0→C1→…→C(n-1)
    * chained by message-typed fields — probes resolve-side depth. */
  def chainBytes(n: Int): Array[Byte] = {
    val msgs = (0 until n).map { i =>
      val f = if (i == n - 1) fld("leaf", 1, 3 /*int64*/ )
        else fld("next", 1, 11 /*message*/, typeName = s".graft.test.C${i + 1}")
      Map[String, Any]("name" -> s"C$i", "field" -> Seq(f))
    }
    ProtoWire.encode(fileSet, Map("file" -> Seq(Map[String, Any](
      "name" -> "chain.proto", "package" -> "graft.test",
      "message_type" -> msgs))))
  }
}
