package graft.ingest

import java.nio.charset.StandardCharsets.UTF_8

import ProtoSchema._

/** Protobuf `FileDescriptorSet` / substreams-package (`.spkg`) parser →
  * [[ProtoSchema.PMessage]].
  *
  * The reference derives its whole output schema from the descriptors
  * bundled in the manifest: `NewProtoConverter(pkg.ProtoFiles, fullName)`
  * (converter_proto.go:24-45, wired at factory.go:183). This is the same
  * capability without protobuf-java on the classpath: the descriptor wire
  * format is itself protobuf (google/protobuf/descriptor.proto, public
  * spec), so the parser is a small recursive walk over the same
  * bounds-checked [[ProtoWire.Reader]] the payload decoder uses —
  * bootstrapped exactly the way protobuf's own runtime is.
  *
  * One parser covers both container formats, because both carry the file
  * descriptors at FIELD 1:
  *   - `FileDescriptorSet { repeated FileDescriptorProto file = 1; }`
  *   - substreams `Package { repeated FileDescriptorProto proto_files = 1;
  *     ... }` (the substreams authors pinned proto_files to tag 1 for
  *     descriptor-set compatibility; every other Package field — version,
  *     modules, metadata — is skipped by wire type here).
  *
  * Only the descriptor fields that determine a schema are read; unknown
  * field numbers (options we don't model, source-code info, reserved
  * ranges, …) are skipped by wire type, so descriptor sets emitted by any
  * protoc version parse.
  */
object DescriptorSet {

  // ---------------------------------------------------------------- model

  /** Parsed descriptor fragments, pre-resolution. Field/type numbers are
    * the public descriptor.proto constants. */
  final case class RawField(
      name: String,
      number: Int,
      label: Int,     // FieldDescriptorProto.Label: 1 optional, 2 required, 3 repeated
      tpe: Int,       // FieldDescriptorProto.Type: 1..18
      typeName: String) // fully-qualified ".pkg.Msg" for message/enum fields
  final case class RawMessage(
      name: String,
      fields: Vector[RawField],
      nested: Vector[RawMessage],
      enums: Vector[String],
      mapEntry: Boolean)
  final case class RawFile(
      name: String,
      pkg: String,
      messages: Vector[RawMessage],
      enums: Vector[String])

  // FieldDescriptorProto.Type constants (descriptor.proto, public spec)
  private val TDouble = 1; private val TFloat = 2; private val TInt64 = 3
  private val TUInt64 = 4; private val TInt32 = 5; private val TFixed64 = 6
  private val TFixed32 = 7; private val TBool = 8; private val TString = 9
  private val TGroup = 10; private val TMessage = 11; private val TBytes = 12
  private val TUInt32 = 13; private val TEnum = 14; private val TSFixed32 = 15
  private val TSFixed64 = 16; private val TSInt32 = 17; private val TSInt64 = 18

  // ---------------------------------------------------------------- parse

  /** Parse a FileDescriptorSet (protoc `--descriptor_set_out`) or a
    * substreams `.spkg` package — both carry `repeated FileDescriptorProto`
    * at field 1. */
  def parseFiles(bytes: Array[Byte]): Seq[RawFile] = {
    val r = new ProtoWire.Reader(bytes, 0, bytes.length)
    val files = Vector.newBuilder[RawFile]
    while (r.hasNext) {
      val key = r.varint()
      val wire = (key & 7).toInt
      if ((key >>> 3).toInt == 1 && wire == 2) {
        val (s, l) = r.lenDelim()
        files += parseFile(bytes, s, l)
      } else r.skip(wire)
    }
    files.result()
  }

  /** FileDescriptorProto: name=1, package=2, message_type=4, enum_type=5. */
  private def parseFile(buf: Array[Byte], from: Int, len: Int): RawFile = {
    val r = new ProtoWire.Reader(buf, from, from + len)
    var name = ""; var pkg = ""
    val msgs = Vector.newBuilder[RawMessage]
    val enums = Vector.newBuilder[String]
    while (r.hasNext) {
      val key = r.varint(); val wire = (key & 7).toInt
      (key >>> 3).toInt match {
        case 1 if wire == 2 => name = str(r)
        case 2 if wire == 2 => pkg = str(r)
        case 4 if wire == 2 =>
          val (s, l) = r.lenDelim(); msgs += parseMessage(buf, s, l)
        case 5 if wire == 2 =>
          val (s, l) = r.lenDelim(); enums += parseEnumName(buf, s, l)
        case _ => r.skip(wire)
      }
    }
    RawFile(name, pkg, msgs.result(), enums.result())
  }

  /** Max message-nesting depth accepted from an untrusted manifest — the
    * same order as protobuf runtimes' default recursion limit. Without a
    * cap, a crafted deeply-nested descriptor turns the natural recursion
    * into StackOverflowError (an Error, not the IllegalArgumentException
    * the corrupt-manifest contract promises). */
  private val MaxDepth = 100

  /** DescriptorProto: name=1, field=2, nested_type=3, enum_type=4,
    * options=7 (MessageOptions.map_entry=7). Naturally recursive — depth
    * is capped at [[MaxDepth]] because the input is untrusted, and every
    * read stays inside the parent's extent. */
  private def parseMessage(buf: Array[Byte], from: Int, len: Int,
      depth: Int = 0): RawMessage = {
    if (depth > MaxDepth)
      throw new IllegalArgumentException(
        s"descriptor message nesting exceeds $MaxDepth levels")
    val r = new ProtoWire.Reader(buf, from, from + len)
    var name = ""; var mapEntry = false
    val fields = Vector.newBuilder[RawField]
    val nested = Vector.newBuilder[RawMessage]
    val enums = Vector.newBuilder[String]
    while (r.hasNext) {
      val key = r.varint(); val wire = (key & 7).toInt
      (key >>> 3).toInt match {
        case 1 if wire == 2 => name = str(r)
        case 2 if wire == 2 =>
          val (s, l) = r.lenDelim(); fields += parseField(buf, s, l)
        case 3 if wire == 2 =>
          val (s, l) = r.lenDelim(); nested += parseMessage(buf, s, l, depth + 1)
        case 4 if wire == 2 =>
          val (s, l) = r.lenDelim(); enums += parseEnumName(buf, s, l)
        case 7 if wire == 2 =>
          val (s, l) = r.lenDelim(); mapEntry = parseMapEntryOption(buf, s, l)
        case _ => r.skip(wire)
      }
    }
    RawMessage(name, fields.result(), nested.result(), enums.result(), mapEntry)
  }

  /** FieldDescriptorProto: name=1, number=3, label=4, type=5, type_name=6. */
  private def parseField(buf: Array[Byte], from: Int, len: Int): RawField = {
    val r = new ProtoWire.Reader(buf, from, from + len)
    var name = ""; var number = 0; var label = 1; var tpe = 0; var typeName = ""
    while (r.hasNext) {
      val key = r.varint(); val wire = (key & 7).toInt
      (key >>> 3).toInt match {
        case 1 if wire == 2 => name = str(r)
        case 3 if wire == 0 => number = r.varint().toInt
        case 4 if wire == 0 => label = r.varint().toInt
        case 5 if wire == 0 => tpe = r.varint().toInt
        case 6 if wire == 2 => typeName = str(r)
        case _ => r.skip(wire)
      }
    }
    RawField(name, number, label, tpe, typeName)
  }

  /** EnumDescriptorProto: only the name matters here — enum values decode
    * to their NUMBER (converter_proto.go:109-110), so the value list never
    * affects the schema. */
  private def parseEnumName(buf: Array[Byte], from: Int, len: Int): String = {
    val r = new ProtoWire.Reader(buf, from, from + len)
    var name = ""
    while (r.hasNext) {
      val key = r.varint(); val wire = (key & 7).toInt
      if ((key >>> 3).toInt == 1 && wire == 2) name = str(r) else r.skip(wire)
    }
    name
  }

  /** MessageOptions.map_entry = 7 (bool): protoc synthesizes a nested
    * `XxxEntry { key=1; value=2; map_entry=true }` message per map field. */
  private def parseMapEntryOption(buf: Array[Byte], from: Int, len: Int): Boolean = {
    val r = new ProtoWire.Reader(buf, from, from + len)
    var mapEntry = false
    while (r.hasNext) {
      val key = r.varint(); val wire = (key & 7).toInt
      if ((key >>> 3).toInt == 7 && wire == 0) mapEntry = r.varint() != 0
      else r.skip(wire)
    }
    mapEntry
  }

  private def str(r: ProtoWire.Reader): String = {
    val (s, l) = r.lenDelim()
    new String(r.buf, s, l, UTF_8)
  }

  // -------------------------------------------------------------- resolve

  private final case class Sym(msg: RawMessage, fqn: String)

  /** Resolve `fullName` (e.g. `"graft.test.BlockEvents"`, leading dot
    * optional) across all files into a decode-ready [[PMessage]] — the
    * analogue of `protodesc.NewFiles(...).FindDescriptorByName` +
    * `buildArrowSchemaFromMessage` (converter_proto.go:24-45,69-128).
    *
    * Recursive message types are rejected: a static relational schema (a
    * StructType, like the reference's Arrow schema) cannot represent
    * unbounded nesting.
    */
  def resolve(files: Seq[RawFile], fullName: String): PMessage = {
    val msgs = scala.collection.mutable.HashMap.empty[String, Sym]
    val enums = scala.collection.mutable.HashSet.empty[String]
    def register(prefix: String, m: RawMessage): Unit = {
      val fqn = s"$prefix.${m.name}"
      msgs(fqn) = Sym(m, fqn)
      m.enums.foreach(e => enums += s"$fqn.$e")
      m.nested.foreach(register(fqn, _))
    }
    files.foreach { f =>
      val prefix = if (f.pkg.isEmpty) "" else s".${f.pkg}"
      f.enums.foreach(e => enums += s"$prefix.$e")
      f.messages.foreach(register(prefix, _))
    }

    def toPMessage(sym: Sym, visiting: Set[String]): PMessage = {
      if (visiting.contains(sym.fqn))
        throw new IllegalArgumentException(
          s"recursive message type ${sym.fqn} cannot map to a static schema")
      if (visiting.size > MaxDepth)
        throw new IllegalArgumentException(
          s"descriptor message nesting exceeds $MaxDepth levels")
      val seen = visiting + sym.fqn
      PMessage(sym.fqn.stripPrefix("."), sym.msg.fields.map { f =>
        val repeated = f.label == 3
        // descriptor.proto: `type` may be UNSET when `type_name` is set
        // ("If type_name is set, this need not be set") — non-protoc
        // producers rely on that, so classify via the symbol tables
        // instead of rejecting tpe=0
        val effTpe =
          if (f.tpe == 0 && f.typeName.nonEmpty)
            if (enums.contains(f.typeName)) TEnum
            else if (msgs.contains(f.typeName)) TMessage
            else throw new IllegalArgumentException(
              s"type ${f.typeName} (field ${f.name}) not in descriptor set")
          else f.tpe
        val (ptype, enc) = effTpe match {
          case TDouble   => (PDouble, EFixed64)
          case TFloat    => (PFloat, EFixed32)
          case TInt64    => (PInt64, EVarint)
          case TUInt64   => (PUInt64, EVarint)
          case TInt32    => (PInt32, EVarint)
          case TFixed64  => (PUInt64, EFixed64)
          case TFixed32  => (PUInt32, EFixed32)
          case TBool     => (PBool, EVarint)
          case TString   => (PString, ELenDelim)
          case TBytes    => (PBytes, ELenDelim)
          case TUInt32   => (PUInt32, EVarint)
          case TEnum     =>
            if (!enums.contains(f.typeName))
              throw new IllegalArgumentException(
                s"enum type ${f.typeName} (field ${f.name}) not in descriptor set")
            (PEnum, EVarint)
          case TSFixed32 => (PInt32, EFixed32)
          case TSFixed64 => (PInt64, EFixed64)
          case TSInt32   => (PInt32, EZigZag)
          case TSInt64   => (PInt64, EZigZag)
          case TGroup    => throw new IllegalArgumentException(
            s"proto2 group field ${f.name} is unsupported")
          case TMessage  =>
            val target = msgs.getOrElse(f.typeName, throw new IllegalArgumentException(
              s"message type ${f.typeName} (field ${f.name}) not in descriptor set"))
            if (target.msg.mapEntry) {
              // map<K,V>: synthesized entry message {key=1, value=2} →
              // PMap; entry-list normalization happens in ProtoSchema
              val entry = toPMessage(target, seen)
              def part(num: Int, what: String): PField =
                entry.fields.find(_.number == num).getOrElse(
                  throw new IllegalArgumentException(
                    s"map entry ${f.typeName} lacks $what field $num"))
              (PMap(part(1, "key").ptype, part(2, "value").ptype), ELenDelim)
            } else (toPMessage(target, seen), ELenDelim)
          case other => throw new IllegalArgumentException(
            s"unknown field type $other on ${f.name}")
        }
        // descriptor maps are label=repeated over the entry message; the
        // PMap ADT convention carries repetition in the type itself
        val rep = repeated && !ptype.isInstanceOf[PMap]
        PField(f.number, f.name, ptype, repeated = rep, encoding = enc)
      })
    }

    val want = if (fullName.startsWith(".")) fullName else s".$fullName"
    val root = msgs.getOrElse(want, throw new IllegalArgumentException(
      s"message $fullName not found; descriptor set defines: " +
        msgs.keys.toSeq.sorted.mkString(", ")))
    toPMessage(root, Set.empty)
  }

  /** One-call manifest → schema: read a `.fdset`/`.spkg` file and resolve
    * the output message (what `CliMain run --descriptor-set F --message M`
    * uses; run.go's manifest reading + factory.go:183 analogue). */
  def load(path: String, fullName: String): PMessage = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    resolve(parseFiles(bytes), fullName)
  }
}
