package graft.ingest

import java.nio.ByteBuffer

import scala.collection.mutable

/** Hand-rolled wire codec for the subset of `sf.substreams.rpc.v2` the
  * sink consumes — the messages the reference's stream handler receives
  * (sinker.go:131 `HandleBlockScopedData`, sinker.go:142
  * `HandleBlockUndoSignal`) and the `Request` its embedded client sends
  * (run.go:100-108). Field numbers follow the PUBLIC substreams
  * `sf/substreams/rpc/v2/service.proto` and `sf/substreams/v1/clock.proto`;
  * unknown fields are skipped on decode, so richer peers interoperate.
  *
  * Built on [[ProtoWire]]'s bounded Writer/Reader — the same fuzz-hardened
  * primitives the dynamic block decoder uses; no generated code, no
  * protobuf runtime.
  */
object SubstreamsRpc {

  /** gRPC method path of the stream (service.proto: `service Stream
    * { rpc Blocks(Request) returns (stream Response); }`). */
  val BlocksPath = "/sf.substreams.rpc.v2.Stream/Blocks"

  // wire types
  private val VARINT = 0
  private val LEN = 2

  // ------------------------------------------------------------- messages

  /** Request (service.proto): start_block_num=1 int64 (negative =
    * head-relative), start_cursor=2, stop_block_num=3 uint64 (exclusive),
    * final_blocks_only=4, production_mode=5, output_module=6. */
  final case class Request(
      startBlockNum: Long,
      stopBlockNum: Long,
      outputModule: String,
      finalBlocksOnly: Boolean,
      startCursor: String = "",
      productionMode: Boolean = true)

  /** Clock (sf.substreams.v1): id=1, number=2 (timestamp=3 skipped). */
  final case class Clock(id: String, number: Long)

  /** BlockScopedData essentials: the Clock and the map module output's
    * Any-wrapped payload bytes — exactly the access path the reference
    * takes (sinker.go:159 `data.Clock.Number, data.Clock.Id,
    * data.Output.MapOutput.Value`). */
  final case class BlockScopedData(clock: Clock, payload: Array[Byte],
                                   cursor: String, finalBlockHeight: Long)

  /** BlockUndoSignal: last_valid_block=1 (BlockRef id=1 number=2),
    * last_valid_cursor=2. */
  final case class BlockUndoSignal(lastValidId: String, lastValidNum: Long,
                                   lastValidCursor: String)

  /** One decoded Response event. `Other` carries the oneof field number
    * of messages the sink ignores (session=1, progress=2, …). */
  sealed trait Event
  final case class Data(d: BlockScopedData) extends Event
  final case class Undo(u: BlockUndoSignal) extends Event
  final case class Other(field: Int) extends Event

  // -------------------------------------------------------------- encode

  def encodeRequest(r: Request): Array[Byte] = {
    val w = new ProtoWire.Writer
    if (r.startBlockNum != 0) w.tag(1, VARINT).varint(r.startBlockNum)
    if (r.startCursor.nonEmpty)
      w.tag(2, LEN).lenDelim(r.startCursor.getBytes("UTF-8"))
    if (r.stopBlockNum != 0) w.tag(3, VARINT).varint(r.stopBlockNum)
    if (r.finalBlocksOnly) w.tag(4, VARINT).varint(1)
    if (r.productionMode) w.tag(5, VARINT).varint(1)
    if (r.outputModule.nonEmpty)
      w.tag(6, LEN).lenDelim(r.outputModule.getBytes("UTF-8"))
    w.toBytes
  }

  /** Response{block_scoped_data=3} around the block. The payload rides in
    * output=1 → MapModuleOutput{name=1, map_output=2 → Any{type_url=1,
    * value=2}}. */
  def encodeData(d: BlockScopedData, moduleName: String = "map_output",
                 typeUrl: String = ""): Array[Byte] = {
    val any = new ProtoWire.Writer
    if (typeUrl.nonEmpty) any.tag(1, LEN).lenDelim(typeUrl.getBytes("UTF-8"))
    any.tag(2, LEN).lenDelim(d.payload)
    val mmo = new ProtoWire.Writer
    mmo.tag(1, LEN).lenDelim(moduleName.getBytes("UTF-8"))
    mmo.tag(2, LEN).lenDelim(any.toBytes)
    val clock = new ProtoWire.Writer
    clock.tag(1, LEN).lenDelim(d.clock.id.getBytes("UTF-8"))
    clock.tag(2, VARINT).varint(d.clock.number)
    val bsd = new ProtoWire.Writer
    bsd.tag(1, LEN).lenDelim(mmo.toBytes)
    bsd.tag(2, LEN).lenDelim(clock.toBytes)
    if (d.cursor.nonEmpty) bsd.tag(3, LEN).lenDelim(d.cursor.getBytes("UTF-8"))
    if (d.finalBlockHeight != 0) bsd.tag(4, VARINT).varint(d.finalBlockHeight)
    new ProtoWire.Writer().tag(3, LEN).lenDelim(bsd.toBytes).toBytes
  }

  /** Response{block_undo_signal=4}. */
  def encodeUndo(u: BlockUndoSignal): Array[Byte] = {
    val ref = new ProtoWire.Writer
    ref.tag(1, LEN).lenDelim(u.lastValidId.getBytes("UTF-8"))
    ref.tag(2, VARINT).varint(u.lastValidNum)
    val sig = new ProtoWire.Writer
    sig.tag(1, LEN).lenDelim(ref.toBytes)
    if (u.lastValidCursor.nonEmpty)
      sig.tag(2, LEN).lenDelim(u.lastValidCursor.getBytes("UTF-8"))
    new ProtoWire.Writer().tag(4, LEN).lenDelim(sig.toBytes).toBytes
  }

  // -------------------------------------------------------------- decode

  private def str(buf: Array[Byte], off: Int, len: Int): String =
    new String(buf, off, len, "UTF-8")

  def decodeRequest(bytes: Array[Byte]): Request = {
    val r = new ProtoWire.Reader(bytes, 0, bytes.length)
    var start = 0L; var stop = 0L; var module = ""; var finalOnly = false
    var cursor = ""; var prod = false
    while (r.hasNext) {
      val key = r.varint()
      val (field, wire) = ((key >>> 3).toInt, (key & 7).toInt)
      (field, wire) match {
        case (1, VARINT) => start = r.varint()
        case (2, LEN) => val (o, l) = r.lenDelim(); cursor = str(bytes, o, l)
        case (3, VARINT) => stop = r.varint()
        case (4, VARINT) => finalOnly = r.varint() != 0
        case (5, VARINT) => prod = r.varint() != 0
        case (6, LEN) => val (o, l) = r.lenDelim(); module = str(bytes, o, l)
        case (_, w) => r.skip(w)
      }
    }
    Request(start, stop, module, finalOnly, cursor, prod)
  }

  def decodeResponse(bytes: Array[Byte]): Event = {
    val r = new ProtoWire.Reader(bytes, 0, bytes.length)
    var ev: Event = Other(0)
    while (r.hasNext) {
      val key = r.varint()
      val (field, wire) = ((key >>> 3).toInt, (key & 7).toInt)
      (field, wire) match {
        case (3, LEN) =>
          val (o, l) = r.lenDelim(); ev = Data(decodeData(bytes, o, o + l))
        case (4, LEN) =>
          val (o, l) = r.lenDelim(); ev = Undo(decodeUndo(bytes, o, o + l))
        case (f, w) => r.skip(w); if (ev == Other(0)) ev = Other(f)
      }
    }
    ev
  }

  private def decodeData(buf: Array[Byte], from: Int, end: Int): BlockScopedData = {
    val r = new ProtoWire.Reader(buf, from, end)
    var clock = Clock("", 0L); var payload = Array.emptyByteArray
    var cursor = ""; var finalH = 0L
    while (r.hasNext) {
      val key = r.varint()
      ((key >>> 3).toInt, (key & 7).toInt) match {
        case (1, LEN) => val (o, l) = r.lenDelim()
          payload = decodeMapOutput(buf, o, o + l)
        case (2, LEN) => val (o, l) = r.lenDelim()
          clock = decodeClock(buf, o, o + l)
        case (3, LEN) => val (o, l) = r.lenDelim(); cursor = str(buf, o, l)
        case (4, VARINT) => finalH = r.varint()
        case (_, w) => r.skip(w)
      }
    }
    BlockScopedData(clock, payload, cursor, finalH)
  }

  private def decodeClock(buf: Array[Byte], from: Int, end: Int): Clock = {
    val r = new ProtoWire.Reader(buf, from, end)
    var id = ""; var num = 0L
    while (r.hasNext) {
      val key = r.varint()
      ((key >>> 3).toInt, (key & 7).toInt) match {
        case (1, LEN) => val (o, l) = r.lenDelim(); id = str(buf, o, l)
        case (2, VARINT) => num = r.varint()
        case (_, w) => r.skip(w)
      }
    }
    Clock(id, num)
  }

  /** MapModuleOutput{map_output=2: Any{value=2}} → the payload bytes. */
  private def decodeMapOutput(buf: Array[Byte], from: Int, end: Int): Array[Byte] = {
    val r = new ProtoWire.Reader(buf, from, end)
    var out = Array.emptyByteArray
    while (r.hasNext) {
      val key = r.varint()
      ((key >>> 3).toInt, (key & 7).toInt) match {
        case (2, LEN) =>
          val (o, l) = r.lenDelim()
          val a = new ProtoWire.Reader(buf, o, o + l)
          while (a.hasNext) {
            val k2 = a.varint()
            ((k2 >>> 3).toInt, (k2 & 7).toInt) match {
              case (2, LEN) =>
                val (vo, vl) = a.lenDelim()
                out = java.util.Arrays.copyOfRange(buf, vo, vo + vl)
              case (_, w) => a.skip(w)
            }
          }
        case (_, w) => r.skip(w)
      }
    }
    out
  }

  private def decodeUndo(buf: Array[Byte], from: Int, end: Int): BlockUndoSignal = {
    val r = new ProtoWire.Reader(buf, from, end)
    var id = ""; var num = 0L; var cursor = ""
    while (r.hasNext) {
      val key = r.varint()
      ((key >>> 3).toInt, (key & 7).toInt) match {
        case (1, LEN) =>
          val (o, l) = r.lenDelim()
          val ref = new ProtoWire.Reader(buf, o, o + l)
          while (ref.hasNext) {
            val k2 = ref.varint()
            ((k2 >>> 3).toInt, (k2 & 7).toInt) match {
              case (1, LEN) => val (ro, rl) = ref.lenDelim(); id = str(buf, ro, rl)
              case (2, VARINT) => num = ref.varint()
              case (_, w) => ref.skip(w)
            }
          }
        case (2, LEN) => val (o, l) = r.lenDelim(); cursor = str(buf, o, l)
        case (_, w) => r.skip(w)
      }
    }
    BlockUndoSignal(id, num, cursor)
  }

  // ---------------------------------------------------------- gRPC frames

  /** Length-prefix one gRPC message (flag 0 = uncompressed + u32 BE len). */
  def frame(msg: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + msg.length)
    ByteBuffer.wrap(out).put(0: Byte).putInt(msg.length)
    System.arraycopy(msg, 0, out, 5, msg.length)
    out
  }

  /** Stateful reassembler: gRPC messages may split across (or share)
    * HTTP/2 DATA frames; feed chunks, get complete messages.
    *
    * `maxMessageBytes` (default 4 MiB — the gRPC default receive cap)
    * bounds what a byzantine or misconfigured server can make the client
    * buffer: an advertised multi-GB frame fails the stream at the length
    * prefix instead of accumulating chunks toward an executor OOM. */
  final class FrameAccumulator(maxMessageBytes: Int = 4 * 1024 * 1024) {
    private var buf = Array.emptyByteArray

    def feed(chunk: Array[Byte]): Seq[Array[Byte]] = {
      buf = if (buf.isEmpty) chunk else buf ++ chunk
      val out = mutable.ArrayBuffer.empty[Array[Byte]]
      var pos = 0
      var fits = true
      while (fits && buf.length - pos >= 5) {
        require(buf(pos) == 0, "compressed gRPC messages not supported")
        val len = ByteBuffer.wrap(buf, pos + 1, 4).getInt
        require(len >= 0, s"negative gRPC frame length $len")
        require(len <= maxMessageBytes,
          s"gRPC frame length $len exceeds max message size $maxMessageBytes")
        if (buf.length - pos - 5 < len) fits = false
        else {
          out += java.util.Arrays.copyOfRange(buf, pos + 5, pos + 5 + len)
          pos += 5 + len
        }
      }
      if (pos > 0) buf = java.util.Arrays.copyOfRange(buf, pos, buf.length)
      out.toSeq
    }

    def isEmpty: Boolean = buf.isEmpty
  }
}
