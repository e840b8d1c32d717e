package graft.ingest

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import ProtoSchema._

/** Descriptor→StructType mapping per SURVEY.md §1.2 and the expected
  * derived schemas in FIXTURES.md §B. */
class ProtoSchemaSpec extends AnyFunSuite {

  test("scalar mapping table") {
    assert(sparkType(PBool) == BooleanType)
    assert(sparkType(PInt32) == IntegerType)
    assert(sparkType(PInt64) == LongType)
    assert(sparkType(PUInt32) == LongType) // widened: Spark has no unsigned
    assert(sparkType(PUInt64) == DecimalType(20, 0)) // value-correct uint64
    assert(sparkType(PFloat) == FloatType)
    assert(sparkType(PDouble) == DoubleType)
    assert(sparkType(PString) == StringType)
    assert(sparkType(PBytes) == BinaryType)
    assert(sparkType(PEnum) == IntegerType) // enum number, not symbol
  }

  test("main-table schema: one column per root field, all nullable") {
    val st = toStructType(TestMessages.output)
    assert(st.fieldNames.toSeq ==
      Seq("block_hash", "gas_used", "transfers", "touched_accounts",
          "balances", "meta"))
    assert(st.fields.forall(_.nullable))
    assert(st("gas_used").dataType == DecimalType(20, 0))
    assert(st("transfers").dataType.isInstanceOf[ArrayType])
    val transferSt = st("transfers").dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(transferSt.fieldNames.toSeq ==
      Seq("from", "to", "amount", "log_index", "kind", "topics"))
    assert(transferSt("kind").dataType == IntegerType)
    assert(transferSt("topics").dataType == ArrayType(BinaryType, true))
    // map → entry list (converter_proto.go:82-87)
    assert(st("balances").dataType ==
      ArrayType(StructType(Seq(
        StructField("key", StringType, true),
        StructField("value", LongType, true))), true))
    // nested message stays a struct (no recursion into explode)
    assert(st("meta").dataType ==
      StructType(Seq(
        StructField("seconds", LongType, true),
        StructField("nanos", IntegerType, true))))
  }

  test("explodable fields: lists yes, maps never (factory.go:213)") {
    assert(explodableFields(TestMessages.output).map(_.name) ==
      Seq("transfers", "touched_accounts"))
  }

  test("child-table schemas (converter_field.go:24-35)") {
    val transfers = explodableFields(TestMessages.output).head
    // message elements flattened — no wrapper struct
    assert(childStructType(transfers).fieldNames.toSeq ==
      Seq("from", "to", "amount", "log_index", "kind", "topics"))
    // scalar elements → single column named after the field
    val touched = explodableFields(TestMessages.output)(1)
    assert(childStructType(touched) ==
      StructType(Seq(StructField("touched_accounts", StringType, true))))
  }
}
