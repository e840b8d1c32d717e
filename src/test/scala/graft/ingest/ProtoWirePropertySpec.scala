package graft.ingest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import ProtoSchema._

/** Deep round-trip property: RANDOM schemas (random field numbers, kinds,
  * encodings, nesting, repetition) × random values — encode with the
  * writer, decode with the engine decoder, compare value-by-value.
  * Seeded RNG: failures reproduce. */
class ProtoWirePropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260812)

  private def randScalar(): (PType, PEncoding) = rnd.nextInt(10) match {
    case 0 => (PBool, EVarint)
    case 1 => (PInt32, if (rnd.nextBoolean()) EVarint else EZigZag)
    case 2 => (PInt64, rnd.nextInt(3) match {
      case 0 => EVarint; case 1 => EZigZag; case _ => EFixed64 })
    case 3 => (PUInt32, if (rnd.nextBoolean()) EVarint else EFixed32)
    case 4 => (PUInt64, if (rnd.nextBoolean()) EVarint else EFixed64)
    case 5 => (PFloat, EFixed32)
    case 6 => (PDouble, EFixed64)
    case 7 => (PString, ELenDelim)
    case 8 => (PBytes, ELenDelim)
    case _ => (PEnum, EVarint)
  }

  private def randSchema(depth: Int, nameSeed: String): PMessage = {
    val nFields = 1 + rnd.nextInt(6)
    // distinct, gappy field numbers (tests the slot table)
    val numbers = rnd.shuffle((1 to 40).toList).take(nFields).sorted
    PMessage(s"M$nameSeed", numbers.zipWithIndex.map { case (num, i) =>
      val repeated = rnd.nextInt(4) == 0
      if (depth > 0 && rnd.nextInt(5) == 0)
        PField(num, s"f$i", randSchema(depth - 1, s"${nameSeed}_$i"),
          repeated = repeated, encoding = ELenDelim)
      else if (depth > 0 && rnd.nextInt(8) == 0)
        PField(num, s"f$i", PMap(PString, PInt64), encoding = ELenDelim)
      else {
        val (t, e) = randScalar()
        PField(num, s"f$i", t, repeated = repeated, encoding = e)
      }
    })
  }

  private def randValue(f: PField): Any = f.ptype match {
    case m: PMessage if f.repeated =>
      Seq.fill(1 + rnd.nextInt(3))(randPayload(m))
    case m: PMessage => randPayload(m)
    case PMap(_, _) =>
      (0 until rnd.nextInt(4)).map(i => s"k${rnd.nextInt(100)}_$i" ->
        rnd.nextLong(1000000)).toMap
    case t =>
      def one(): Any = t match {
        case PBool => rnd.nextBoolean()
        case PInt32 => rnd.nextInt()
        case PInt64 => rnd.nextLong()
        case PUInt32 => rnd.nextLong(1L << 32)
        case PUInt64 => BigInt(rnd.nextLong()) & BigInt("18446744073709551615")
        case PFloat => rnd.nextFloat() * 100 - 50
        case PDouble => rnd.nextDouble() * 1e6 - 5e5
        case PString => rnd.alphanumeric.take(rnd.nextInt(12)).mkString
        case PBytes => Array.fill(rnd.nextInt(8))(rnd.nextInt().toByte)
        case PEnum => rnd.nextInt(5)
        case other => fail(s"unexpected $other")
      }
      if (f.repeated) Seq.fill(1 + rnd.nextInt(3))(one()) else one()
  }

  private def randPayload(m: PMessage): Map[String, Any] =
    m.fields.filter(_ => rnd.nextInt(4) > 0) // some fields absent
      .map(f => f.name -> randValue(f)).toMap

  private def check(m: PMessage, values: Map[String, Any],
      row: InternalRow): Unit =
    m.fields.zipWithIndex.foreach { case (f, i) =>
      values.get(f.name) match {
        case None => assert(row.isNullAt(i), s"${f.name} should be null")
        case Some(v) => checkValue(f, v, row, i)
      }
    }

  private def checkValue(f: PField, v: Any, row: InternalRow, i: Int): Unit = {
    def scalarEq(expected: Any, actual: Any): Unit = (f.ptype, expected) match {
      case (PUInt64, b: BigInt) =>
        assert(actual == Decimal(BigDecimal(b), 20, 0))
      case (PString, s: String) =>
        assert(actual.asInstanceOf[UTF8String].toString == s)
      case (PBytes, bs: Array[Byte]) =>
        assert(actual.asInstanceOf[Array[Byte]].toSeq == bs.toSeq)
      case _ => assert(actual == expected, s"field ${f.name}")
    }
    f.ptype match {
      case m: PMessage if !f.repeated =>
        check(m, v.asInstanceOf[Map[String, Any]],
          row.get(i, null).asInstanceOf[InternalRow])
      case m: PMessage =>
        val arr = row.get(i, null).asInstanceOf[ArrayData]
        val seq = v.asInstanceOf[Seq[Map[String, Any]]]
        assert(arr.numElements() == seq.size)
        seq.zipWithIndex.foreach { case (mv, j) =>
          check(m, mv, arr.array(j).asInstanceOf[InternalRow]) }
      case PMap(_, _) =>
        val mv = v.asInstanceOf[Map[String, Long]]
        if (mv.isEmpty) {
          // proto3 wire can't distinguish empty map from absent → null
          assert(row.isNullAt(i)); return
        }
        val entries = row.get(i, null).asInstanceOf[ArrayData]
        assert(entries.numElements() == mv.size)
        val got = (0 until entries.numElements()).map { j =>
          val e = entries.array(j).asInstanceOf[InternalRow]
          e.get(0, null).asInstanceOf[UTF8String].toString ->
            e.get(1, null).asInstanceOf[Long]
        }
        assert(got.toMap == mv)
        assert(got.map(_._1) == got.map(_._1).sorted) // sorted entries
      case _ if f.repeated =>
        val arr = row.get(i, null).asInstanceOf[ArrayData]
        val seq = v.asInstanceOf[Seq[Any]]
        assert(arr.numElements() == seq.size)
        seq.zipWithIndex.foreach { case (x, j) => scalarEq(x, arr.array(j)) }
      case _ => scalarEq(v, row.get(i, null))
    }
  }

  test("round-trip id over 300 random schemas × payloads") {
    (1 to 300).foreach { trial =>
      val schema = randSchema(depth = 2, nameSeed = trial.toString)
      val payload = randPayload(schema)
      val bytes = ProtoWire.encode(schema, payload)
      val row = ProtoWire.decode(schema, bytes)
      check(schema, payload, row)
    }
  }

  test("fuzz: garbage and truncated bytes never hang or escape the " +
      "strict/lenient contract") {
    val rnd = new scala.util.Random(1234)
    val schema = randSchema(depth = 2, nameSeed = "fuzz")
    val valid = ProtoWire.encode(schema, randPayload(schema))
    val cases =
      // pure garbage
      (1 to 200).map(_ => Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)) ++
      // valid prefix truncations (the interrupted-upload shape)
      (0 until valid.length).map(valid.take) ++
      // single-bit corruptions of a valid message
      (1 to 200).map { _ =>
        val b = valid.clone()
        if (b.nonEmpty) {
          val i = rnd.nextInt(b.length)
          b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
        }
        b
      }
    val strictDecoder = graft.ingest.ProtoDecodeExpression(
      org.apache.spark.sql.catalyst.expressions.Literal(Array.empty[Byte]),
      schema, lenient = false)
    val lenientDecoder = strictDecoder.copy(lenient = true)
    cases.foreach { bytes =>
      // strict: decodes or throws IllegalArgumentException — nothing else
      // (no raw index errors, no negative-length allocations, no loops)
      try { strictDecoder.decodeOne(bytes); () }
      catch { case _: IllegalArgumentException => () }
      // lenient: NEVER throws; null or a row
      lenientDecoder.decodeOne(bytes)
    }
  }
}
