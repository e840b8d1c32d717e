package graft.ingest

import org.apache.spark.sql.types._

/** Protobuf message-schema model + Spark StructType derivation.
  *
  * The reference derives a fixed Arrow schema once at startup from the
  * manifest's FileDescriptorSet (converter_proto.go:24-45) with the type
  * mapping at converter_proto.go:78-128. Here the descriptor is modeled as
  * a plain Scala ADT (no protobuf-java on the classpath — the wire format
  * and descriptor semantics are public spec), and the mapping targets
  * Spark types per SURVEY.md §1.2:
  *
  *   bool→Boolean, int32/sint32/sfixed32→Int, int64/sint64/sfixed64→Long,
  *   uint32/fixed32→Long (widened; Spark has no unsigned),
  *   uint64/fixed64→Decimal(20,0) (value-correct; see SURVEY.md §7.4.1),
  *   float→Float, double→Double, string→String, bytes→Binary,
  *   enum→Int (the enum number, converter_proto.go:109-110),
  *   message→Struct (recursive, :111-118), repeated T→Array(T) (:123-126),
  *   map<K,V>→Array(Struct(key,value)) entry list (:82-87).
  *
  * Everything nullable (converter_proto.go:80).
  */
object ProtoSchema {

  sealed trait PType
  case object PBool extends PType
  case object PInt32 extends PType        // int32 | sint32 | sfixed32
  case object PInt64 extends PType        // int64 | sint64 | sfixed64
  case object PUInt32 extends PType       // uint32 | fixed32 → Long
  case object PUInt64 extends PType       // uint64 | fixed64 → Decimal(20,0)
  case object PFloat extends PType
  case object PDouble extends PType
  case object PString extends PType
  case object PBytes extends PType
  case object PEnum extends PType         // enum number → Int
  final case class PMessage(name: String, fields: Seq[PField]) extends PType
  final case class PMap(key: PType, value: PType) extends PType

  /** Wire encodings that need decode-time transforms. */
  sealed trait PEncoding
  case object EVarint extends PEncoding   // int32/int64/uint*/bool/enum
  case object EZigZag extends PEncoding   // sint32/sint64
  case object EFixed32 extends PEncoding  // fixed32/sfixed32/float
  case object EFixed64 extends PEncoding  // fixed64/sfixed64/double
  case object ELenDelim extends PEncoding // string/bytes/message/packed

  final case class PField(
      number: Int,
      name: String,
      ptype: PType,
      repeated: Boolean = false,
      encoding: PEncoding = EVarint)

  /** uint64 policy (SURVEY.md §7.4.1): Decimal(20,0) holds the full
    * unsigned range; Parquet UINT_64 round-trips to this in Spark. */
  val UInt64Type: DataType = DecimalType(20, 0)

  def sparkType(t: PType): DataType = t match {
    case PBool => BooleanType
    case PInt32 => IntegerType
    case PInt64 => LongType
    case PUInt32 => LongType
    case PUInt64 => UInt64Type
    case PFloat => FloatType
    case PDouble => DoubleType
    case PString => StringType
    case PBytes => BinaryType
    case PEnum => IntegerType
    case m: PMessage => toStructType(m)
    case PMap(k, v) =>
      // Entry-list normalization (converter_proto.go:82-87); entries are
      // sorted by key at decode time — a determinism fix over the
      // reference's unspecified map iteration order (SURVEY.md §2.A#8).
      ArrayType(StructType(Seq(
        StructField("key", sparkType(k), nullable = true),
        StructField("value", sparkType(v), nullable = true))), containsNull = true)
  }

  def fieldType(f: PField): DataType = {
    val base = sparkType(f.ptype)
    if (f.repeated && !f.ptype.isInstanceOf[PMap])
      ArrayType(base, containsNull = true)
    else base
  }

  /** Main-table schema: one column per root field (converter_proto.go:69-76). */
  def toStructType(m: PMessage): StructType =
    StructType(m.fields.map(f =>
      StructField(f.name, fieldType(f), nullable = true)))

  /** Root repeated fields eligible for explode — lists, maps excluded
    * (factory.go:213: fd.IsList() && !fd.IsMap()). */
  def explodableFields(m: PMessage): Seq[PField] =
    m.fields.filter(f => f.repeated && !f.ptype.isInstanceOf[PMap])

  /** Exploded child-table schema (converter_field.go:24-35): message
    * elements are flattened to top-level columns, scalar elements become a
    * single column named after the field. */
  def childStructType(f: PField): StructType = f.ptype match {
    case PMessage(_, fields) =>
      StructType(fields.map(cf =>
        StructField(cf.name, fieldType(cf), nullable = true)))
    case other =>
      StructType(Seq(StructField(f.name, sparkType(other), nullable = true)))
  }
}
