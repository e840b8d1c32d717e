package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import SubstreamsRpc._

/** The RPC codec parses NETWORK input (a gRPC peer's bytes) — same
  * contract as the block decoder: corrupt input throws
  * IllegalArgumentException (or parses as a degenerate message), never
  * hangs, never over-reads, never throws anything uncontrolled. */
class SubstreamsRpcSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260813)

  test("fuzz: garbage, truncated, and bit-flipped responses never " +
      "crash uncontrolled") {
    val valid = Seq(
      encodeData(BlockScopedData(Clock("0xb9", 9L), Array[Byte](1, 2), "c", 8L)),
      encodeUndo(BlockUndoSignal("0xb5", 5L, "c5")),
      encodeRequest(Request(-1L, 100L, "m", finalBlocksOnly = true)))
    val cases =
      // pure garbage
      (1 to 300).map(_ => Array.fill(rnd.nextInt(60))(rnd.nextInt().toByte)) ++
        // truncations of valid messages
        valid.flatMap(v => (0 until v.length).map(v.take)) ++
        // single bit flips of valid messages
        valid.flatMap(v => (1 to 200).map { _ =>
          val c = v.clone()
          val i = rnd.nextInt(c.length)
          c(i) = (c(i) ^ (1 << rnd.nextInt(8))).toByte
          c
        })
    cases.foreach { bytes =>
      try { decodeResponse(bytes); () }
      catch { case _: IllegalArgumentException => () }
      try { decodeRequest(bytes); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("frame accumulator rejects compressed and negative-length frames") {
    val acc = new FrameAccumulator
    intercept[IllegalArgumentException] {
      acc.feed(Array[Byte](1, 0, 0, 0, 0)) // compressed flag
    }
    val acc2 = new FrameAccumulator
    intercept[IllegalArgumentException] {
      acc2.feed(Array[Byte](0, -1, -1, -1, -1)) // length < 0
    }
  }

  test("frame accumulator caps advertised message size BEFORE buffering") {
    // a byzantine server advertising a 1 GiB frame must fail at the
    // length prefix, not accumulate chunks toward an executor OOM
    val acc = new FrameAccumulator(maxMessageBytes = 1024)
    val prefix = java.nio.ByteBuffer.allocate(5)
      .put(0: Byte).putInt(1 << 30).array()
    intercept[IllegalArgumentException] { acc.feed(prefix) }
    // at the cap exactly: accepted and reassembled across split chunks
    val ok = new FrameAccumulator(maxMessageBytes = 1024)
    val msg = Array.fill[Byte](1024)(7)
    val framed = java.nio.ByteBuffer.allocate(5 + 1024)
      .put(0: Byte).putInt(1024).put(msg).array()
    assert(ok.feed(framed.take(600)).isEmpty)
    val out = ok.feed(framed.drop(600))
    assert(out.size == 1 && out.head.sameElements(msg))
  }

  test("unknown response oneof fields skip; the sink sees Other") {
    // session=1 (a message the sink ignores) wrapped as Response
    val w = new ProtoWire.Writer
    w.tag(1, 2).lenDelim(Array[Byte](0x0a, 0x01, 0x58)) // session bytes
    assert(decodeResponse(w.toBytes) == Other(1))
    // a data event AFTER an ignored field still decodes
    val mixed = w.toBytes ++ encodeData(
      BlockScopedData(Clock("0xb3", 3L), Array[Byte](7), "", 2L))
    decodeResponse(mixed) match {
      case Data(d) => assert(d.clock.number == 3L)
      case other => fail(s"expected Data, got $other")
    }
  }
}
