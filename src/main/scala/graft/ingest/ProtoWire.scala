package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

import ProtoSchema._

/** Protobuf wire-format codec, written against the PUBLIC wire spec
  * (https://protobuf.dev/programming-guides/encoding/): varint / zigzag /
  * fixed32 / fixed64 / length-delimited, packed + unpacked repeated
  * scalars, map entries as repeated `{1:key, 2:value}` messages.
  *
  * Replaces the reference's dynamicpb decode (converter_proto.go:53-61,
  * helpers.go:10-16) — protobuf-java is not on this classpath, and the
  * decoder writes Catalyst internal values directly (UTF8String /
  * InternalRow / GenericArrayData / Decimal), so [[ProtoDecodeExpression]]
  * evaluates with zero external↔internal conversion.
  *
  * Decode semantics mirror the reference:
  *  - absent field → null (converter_proto.go:137-140);
  *  - last-one-wins for non-repeated fields (wire spec);
  *  - enum → its number (converter_proto.go:261-262);
  *  - uint64 → Decimal(20,0), uint32 → widened long (SURVEY.md §1.2);
  *  - map → entry list SORTED by key — determinism fix over the
  *    reference's unspecified Map.Range order (SURVEY.md §2.A#8);
  *  - unknown field numbers are skipped by wire type.
  */
object ProtoWire {

  // ---------------------------------------------------------------- encode

  final class Writer {
    private val out = new ByteArrayOutputStream()

    def toBytes: Array[Byte] = out.toByteArray

    def varint(v: Long): Writer = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt); this
    }
    def tag(field: Int, wire: Int): Writer = varint((field.toLong << 3) | wire)
    def zigzag(v: Long): Writer = varint((v << 1) ^ (v >> 63))
    def fixed32(v: Int): Writer = {
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v)
      out.write(b.array()); this
    }
    def fixed64(v: Long): Writer = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v)
      out.write(b.array()); this
    }
    def lenDelim(bytes: Array[Byte]): Writer = {
      varint(bytes.length.toLong); out.write(bytes); this
    }
  }

  /** Encode a message from a name→value map (test fixtures + round-trip
    * properties; the engine itself only decodes). Accepted value shapes:
    * Boolean/Int/Long/Float/Double/String/Array[Byte], BigInt for uint64,
    * Seq[_] for repeated, Map[_,_] for map fields, Map[String,Any] for
    * nested messages. */
  def encode(msg: PMessage, values: Map[String, Any]): Array[Byte] = {
    val w = new Writer
    msg.fields.foreach { f =>
      values.get(f.name).foreach(v => if (v != null) writeField(w, f, v))
    }
    w.toBytes
  }

  private def writeField(w: Writer, f: PField, v: Any): Unit = f.ptype match {
    case PMap(kt, vt) =>
      val entryMsg = PMessage("entry", Seq(
        PField(1, "key", kt, encoding = encodingOf(kt)),
        PField(2, "value", vt, encoding = encodingOf(vt))))
      v.asInstanceOf[Map[Any, Any]].foreach { case (k, ev) =>
        w.tag(f.number, 2).lenDelim(
          encode(entryMsg, Map("key" -> k, "value" -> ev)))
      }
    case _ if f.repeated =>
      v.asInstanceOf[Seq[Any]].foreach(writeSingle(w, f, _))
    case _ => writeSingle(w, f, v)
  }

  private def encodingOf(t: PType): PEncoding = t match {
    case PFloat => EFixed32
    case PDouble => EFixed64
    case PString | PBytes | _: PMessage | _: PMap => ELenDelim
    case _ => EVarint
  }

  private def writeSingle(w: Writer, f: PField, v: Any): Unit = f.ptype match {
    case m: PMessage => w.tag(f.number, 2)
      .lenDelim(encode(m, v.asInstanceOf[Map[String, Any]]))
    case PString => w.tag(f.number, 2)
      .lenDelim(v.asInstanceOf[String].getBytes("UTF-8"))
    case PBytes => w.tag(f.number, 2).lenDelim(v.asInstanceOf[Array[Byte]])
    case PFloat => w.tag(f.number, 5)
      .fixed32(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
    case PDouble => w.tag(f.number, 1)
      .fixed64(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
    case PBool => w.tag(f.number, 0).varint(if (v.asInstanceOf[Boolean]) 1 else 0)
    case PEnum => w.tag(f.number, 0).varint(v.asInstanceOf[Int].toLong)
    case PInt32 | PInt64 => f.encoding match {
      case EZigZag => w.tag(f.number, 0).zigzag(anyToLong(v))
      case EFixed32 => w.tag(f.number, 5).fixed32(anyToLong(v).toInt)
      case EFixed64 => w.tag(f.number, 1).fixed64(anyToLong(v))
      case _ => w.tag(f.number, 0).varint(anyToLong(v))
    }
    case PUInt32 => f.encoding match {
      case EFixed32 => w.tag(f.number, 5).fixed32(anyToLong(v).toInt)
      case _ => w.tag(f.number, 0).varint(anyToLong(v) & 0xffffffffL)
    }
    case PUInt64 =>
      val raw = v match {
        case b: BigInt => b.toLong // wraps to the unsigned bit pattern
        case other => anyToLong(other)
      }
      f.encoding match {
        case EFixed64 => w.tag(f.number, 1).fixed64(raw)
        case _ => w.tag(f.number, 0).varint(raw)
      }
    case _: PMap => throw new IllegalStateException("map handled in writeField")
  }

  private def anyToLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case other => throw new IllegalArgumentException(s"not integral: $other")
  }

  // ---------------------------------------------------------------- decode

  // private[ingest]: DescriptorSet's recursive descriptor parser reuses the
  // same bounds-checked reader (manifests are untrusted input too).
  private[ingest] final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
    // Every read is bounded by the LOGICAL `end` (a nested message's
    // extent), not the buffer length: a truncated nested message must fail
    // instead of silently decoding sibling bytes of the shared buffer.
    private def need(n: Int): Unit =
      if (n < 0 || pos + n > end)
        throw new IllegalArgumentException(
          s"truncated message: need $n bytes at $pos, logical end $end")
    def varint(): Long = {
      var shift = 0; var result = 0L
      while (true) {
        need(1)
        val b = buf(pos); pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
        if (shift >= 64) throw new IllegalArgumentException("varint too long")
      }
      result
    }
    def fixed32(): Int = {
      need(4)
      val v = ByteBuffer.wrap(buf, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      pos += 4; v
    }
    def fixed64(): Long = {
      need(8)
      val v = ByteBuffer.wrap(buf, pos, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
      pos += 8; v
    }
    def lenDelim(): (Int, Int) = {
      val len = varint().toInt
      // need() also rejects len < 0 (a corrupt varint would move pos
      // BACKWARDS and the decode loop would never terminate)
      need(len)
      val start = pos
      pos += len
      (start, len)
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => need(8); pos += 8
      case 2 => val _ = lenDelim()
      case 5 => need(4); pos += 4
      case other => throw new IllegalArgumentException(s"unsupported wire type $other")
    }
  }

  /** Per-schema decode plan, compiled once and cached: field-number →
    * slot is an array lookup (the wire loop runs per ROW at ingest — no
    * per-row map allocation), map-entry sub-messages precomputed. */
  private final class Compiled(msg: PMessage) {
    val fields: Array[PField] = msg.fields.toArray
    private val maxNum = fields.iterator.map(_.number).max
    val slotByNum: Array[Int] = {
      val a = Array.fill(maxNum + 1)(-1)
      fields.zipWithIndex.foreach { case (f, i) => a(f.number) = i }
      a
    }
    def slotOf(num: Int): Int =
      if (num >= 0 && num <= maxNum) slotByNum(num) else -1
    // precomputed per-slot map-entry message (for PMap fields)
    val entryMsg: Array[PMessage] = fields.map(_.ptype match {
      case PMap(kt, vt) => PMessage("entry", Seq(
        PField(1, "key", kt, encoding = encodingOf(kt)),
        PField(2, "value", vt, encoding = encodingOf(vt))))
      case _ => null
    })
  }

  private val compiledCache =
    new java.util.concurrent.ConcurrentHashMap[PMessage, Compiled]
  private def compiledOf(msg: PMessage): Compiled =
    compiledCache.computeIfAbsent(msg, new Compiled(_))

  /** Decode `bytes` as `msg`, producing an InternalRow laid out exactly as
    * ProtoSchema.toStructType(msg). */
  def decode(msg: PMessage, bytes: Array[Byte]): InternalRow =
    decodeMessage(msg, bytes, 0, bytes.length)

  private def decodeMessage(
      msg: PMessage, bytes: Array[Byte], from: Int, len: Int): InternalRow = {
    val c = compiledOf(msg)
    val n = c.fields.length
    val values = new Array[Any](n)
    // per-slot repeat buffers, allocated lazily (most fields are scalar)
    var repeats: Array[mutable.ArrayBuffer[Any]] = null
    def repeatBuf(slot: Int): mutable.ArrayBuffer[Any] = {
      if (repeats == null) repeats = new Array(n)
      if (repeats(slot) == null) repeats(slot) = mutable.ArrayBuffer.empty
      repeats(slot)
    }
    val r = new Reader(bytes, from, from + len)
    while (r.hasNext) {
      val key = r.varint()
      val slot = c.slotOf((key >>> 3).toInt)
      val wire = (key & 7).toInt
      if (slot < 0) r.skip(wire)
      else {
        val f = c.fields(slot)
        f.ptype match {
          case _: PMap =>
            val (s, l) = r.lenDelim()
            repeatBuf(slot) += decodeMessage(c.entryMsg(slot), bytes, s, l)
          case m: PMessage if f.repeated =>
            val (s, l) = r.lenDelim()
            repeatBuf(slot) += decodeMessage(m, bytes, s, l)
          case m: PMessage =>
            val (s, l) = r.lenDelim()
            values(slot) = decodeMessage(m, bytes, s, l)
          case _ if f.repeated =>
            if (wire == 2 && packable(f)) {
              // packed encoding: concatenated scalars in one len-delim
              val (s, l) = r.lenDelim()
              val pr = new Reader(bytes, s, s + l)
              val buf = repeatBuf(slot)
              while (pr.hasNext) buf += readScalar(f, pr, scalarWire(f))
            } else repeatBuf(slot) += readScalar(f, r, wire)
          case _ =>
            values(slot) = readScalar(f, r, wire)
        }
      }
    }
    // materialize repeated fields (+ sort map entries by key)
    if (repeats != null) {
      var slot = 0
      while (slot < n) {
        if (repeats(slot) != null) {
          val data = c.fields(slot).ptype match {
            case _: PMap => sortEntries(repeats(slot))
            case _ => repeats(slot)
          }
          values(slot) = new GenericArrayData(data.toArray)
        }
        slot += 1
      }
    }
    new GenericInternalRow(values)
  }

  private def packable(f: PField): Boolean = f.ptype match {
    case PString | PBytes | _: PMessage | _: PMap => false
    case _ => true
  }

  private def scalarWire(f: PField): Int = f.ptype match {
    case PFloat => 5
    case PDouble => 1
    case _ => f.encoding match {
      case EFixed32 => 5
      case EFixed64 => 1
      case _ => 0
    }
  }

  private def readScalar(f: PField, r: Reader, wire: Int): Any = f.ptype match {
    case PString => val (s, l) = r.lenDelim()
      UTF8String.fromBytes(java.util.Arrays.copyOfRange(
        rBytes(r), s, s + l))
    case PBytes => val (s, l) = r.lenDelim()
      java.util.Arrays.copyOfRange(rBytes(r), s, s + l)
    case PBool => r.varint() != 0
    case PEnum => r.varint().toInt
    case PFloat => java.lang.Float.intBitsToFloat(r.fixed32())
    case PDouble => java.lang.Double.longBitsToDouble(r.fixed64())
    case PInt32 => f.encoding match {
      case EZigZag => val v = r.varint(); ((v >>> 1) ^ -(v & 1)).toInt
      case EFixed32 => r.fixed32()
      case _ => r.varint().toInt
    }
    case PInt64 => f.encoding match {
      case EZigZag => val v = r.varint(); (v >>> 1) ^ -(v & 1)
      case EFixed64 => r.fixed64()
      case _ => r.varint()
    }
    case PUInt32 => (f.encoding match {
      case EFixed32 => r.fixed32().toLong
      case _ => r.varint()
    }) & 0xffffffffL
    case PUInt64 =>
      val raw = f.encoding match {
        case EFixed64 => r.fixed64()
        case _ => r.varint()
      }
      Decimal(BigDecimal(new java.math.BigDecimal(
        java.lang.Long.toUnsignedString(raw))), 20, 0)
    case other => throw new IllegalArgumentException(s"not a scalar: $other")
  }

  // Reader doesn't expose its buffer; thread it through a tiny accessor to
  // keep copyOfRange allocation at the leaf.
  private def rBytes(r: Reader): Array[Byte] = r.buf

  private def sortEntries(buf: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] =
    buf.sortBy[String](row =>
      // GenericInternalRow.get ignores the DataType argument
      row.asInstanceOf[InternalRow].get(0, null) match {
        case s: UTF8String => s.toString
        // sign-flip → unsigned string keeps numeric order incl. negatives
        case i: Int => numKey(i.toLong)
        case l: Long => numKey(l)
        case b: Boolean => b.toString
        case other => String.valueOf(other)
      })

  private def numKey(l: Long): String = {
    val s = java.lang.Long.toUnsignedString(l ^ Long.MinValue)
    "0" * (20 - s.length) + s
  }
}
