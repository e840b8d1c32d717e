package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.ingest.{SubstreamsRpc, UndoBuffer}
import graft.ingest.SubstreamsRpc.{BlockScopedData, BlockUndoSignal, Clock, Data, Undo}

/** The gRPC leg of the block source: a REAL client and a REAL in-process
  * server speaking gRPC-over-HTTP/2 on an actual TCP socket — the
  * drop-in proof for the BlockClient seam (sinker.go:91 parity), undo
  * signals included (sinker.go:142-148 via UndoBuffer). */
class GrpcBlockClientSpec extends SparkSuite {

  test("substreams rpc codec round-trips; frames reassemble at any split") {
    val req = SubstreamsRpc.Request(startBlockNum = -1L, stopBlockNum = 500L,
      outputModule = "map_transfers", finalBlocksOnly = true,
      startCursor = "abc", productionMode = true)
    assert(SubstreamsRpc.decodeRequest(SubstreamsRpc.encodeRequest(req)) == req)

    val d = BlockScopedData(Clock("0xb7", 7L), Array[Byte](1, 2, 3, 9),
      cursor = "c7", finalBlockHeight = 6L)
    SubstreamsRpc.decodeResponse(SubstreamsRpc.encodeData(d)) match {
      case Data(got) =>
        assert(got.clock == d.clock && got.cursor == "c7" &&
          got.finalBlockHeight == 6L &&
          got.payload.toSeq == d.payload.toSeq)
      case other => fail(s"expected Data, got $other")
    }
    val u = BlockUndoSignal("0xb5", 5L, "c5")
    assert(SubstreamsRpc.decodeResponse(SubstreamsRpc.encodeUndo(u)) == Undo(u))

    // two messages through the accumulator, fed one byte at a time —
    // gRPC messages split across DATA frames must reassemble exactly
    val wire = SubstreamsRpc.frame(SubstreamsRpc.encodeData(d)) ++
      SubstreamsRpc.frame(SubstreamsRpc.encodeUndo(u))
    val acc = new SubstreamsRpc.FrameAccumulator
    val out = wire.flatMap(b => acc.feed(Array(b)))
    assert(out.length == 2 && acc.isEmpty)
    assert(SubstreamsRpc.decodeResponse(out(1)) == Undo(u))
  }

  test("end-to-end: the DSv2 source drains a chain through a real " +
      "gRPC socket, finality and reorg identities intact") {
    import spark.implicits._
    // 40-block fully-mined chain (head probe reaches chainLen+margin at
    // once — the historical-backfill shape), blocks 19-20 re-mined
    val server = new TestSubstreamsServer(chainLen = 40L,
      blocksPerProbe = 43L, margin = 3L, reorgs = Seq((20L, 2)))
    try {
      val out = Files.createTempDirectory("grpc-out").toString
      val q = spark.readStream.format("graft.sources.BlockStreamProvider")
        .option("client", classOf[GrpcBlockClientFactory].getName)
        .option("endpoint", s"127.0.0.1:${server.port}")
        .option("outputModule", "map_output")
        .option("confirmations", "3")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation",
          Files.createTempDirectory("grpc-ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.processAllAvailable(); q.stop()
      val rows = spark.read.parquet(out)
        .select("block_number", "block_id").as[(Long, String)]
        .collect().sortBy(_._1).toSeq
      assert(rows.map(_._1) == (1L to 40L), "gapless, duplicate-free")
      val ids = rows.toMap
      assert(ids(19L) == "0xb19_r1" && ids(20L) == "0xb20_r1")
      assert(ids(18L) == "0xb18" && ids(21L) == "0xb21")
      // both planes actually hit the socket: driver head probes AND
      // executor-task range fetches
      assert(server.probeCalls.get() >= 1 && server.rangeCalls.get() >= 1)
      // payloads survived the Any/MapModuleOutput wrapping: decode one
      val payload = spark.read.parquet(out)
        .filter($"block_number" === 7L)
        .select("payload").as[Array[Byte]].head()
      assert(payload.toSeq == graft.ingest.ProtoWire.encode(
        graft.ingest.SampleBlocks.output,
        graft.ingest.SampleBlocks.samplePayload(7L)).toSeq)
    } finally server.close()
  }

  test("live tail: undo signal crosses the socket and UndoBuffer " +
      "yields the canonical chain") {
    // unfinalized feed: 1..8, undo to 5, fork 6..8 re-mined — the
    // sinker.go:131/142 event sequence
    def data(n: Long, gen: Int) = Data(BlockScopedData(
      Clock(BlockStreamSource.blockId(n, gen), n),
      Array[Byte](n.toByte), s"c$n", math.max(0L, n - 1)))
    val script =
      (1L to 8L).map(data(_, 0)) ++
        Seq(Undo(BlockUndoSignal("0xb5", 5L, "c5"))) ++
        (6L to 8L).map(data(_, 1))
    val server = new TestSubstreamsServer(chainLen = 8L,
      liveScript = script)
    try {
      val client = new GrpcBlockClient("127.0.0.1", server.port, "map_output")
      try {
        val buf = new UndoBuffer[BlockData](3, _.number)
        val released = scala.collection.mutable.ArrayBuffer.empty[BlockData]
        client.live(1L).foreach {
          case Data(d) =>
            released ++= buf.addBlock(
              BlockData(d.clock.number, d.clock.id, d.payload))
          case Undo(u) => buf.handleUndo(u.lastValidNum)
          case _ => ()
        }
        released ++= buf.flush()
        assert(released.map(_.number).toSeq == (1L to 8L))
        val ids = released.map(b => b.number -> b.id).toMap
        assert(ids(5L) == "0xb5" && ids(6L) == "0xb6_r1" &&
          ids(8L) == "0xb8_r1")
      } finally client.close()
    } finally server.close()
  }

  test("grpc-status errors and dead endpoints fail loudly, never hang") {
    // a scripted INTERNAL(13) error surfaces as an exception naming the
    // status — not a silent empty range
    val server = new TestSubstreamsServer(chainLen = 10L,
      errorStatus = Some(13))
    try {
      val client = new GrpcBlockClient("127.0.0.1", server.port,
        "map_output", timeoutMs = 5000L)
      try {
        val e = intercept[IllegalStateException] {
          client.blocks(1L, 5L).toList
        }
        assert(e.getMessage.contains("grpc-status 13"))
      } finally client.close()
    } finally server.close()
    // connection refused propagates from the factory promptly
    intercept[Exception] {
      new GrpcBlockClientFactory().create(
        Map("endpoint" -> "127.0.0.1:1")) // reserved port, nothing listens
    }
  }

  test("factory endpoint parsing: IPv6 literals and junk") {
    val f = new GrpcBlockClientFactory
    // [::1]:port parses (connection refused is fine — nothing listens on
    // port 1; the parse must not be the failure)
    val e6 = intercept[Exception] { f.create(Map("endpoint" -> "[::1]:1")) }
    assert(!e6.getMessage.contains("unparseable"), e6.getMessage)
    // bare host (no port), trailing colon, non-numeric port all rejected
    // with the parse error, not a connect attempt
    for (bad <- Seq("hostonly", "host:", ":9000", "host:abc")) {
      val e = intercept[IllegalArgumentException] {
        f.create(Map("endpoint" -> bad))
      }
      assert(e.getMessage.contains("unparseable"), s"$bad -> ${e.getMessage}")
    }
  }

  test("headBlock probes advance with the simulated mining") {
    val server = new TestSubstreamsServer(chainLen = 30L,
      blocksPerProbe = 10L)
    try {
      val client = new GrpcBlockClient("127.0.0.1", server.port, "map_output")
      try {
        assert(client.headBlock() == 10L)
        assert(client.headBlock() == 20L)
        assert(client.headBlock() == 30L)
        assert(client.headBlock() == 30L) // capped at chain end
      } finally client.close()
    } finally server.close()
  }

  test("prepareDrain pins the head so AvailableNow stops chasing a " +
      "live chain") {
    val server = new TestSubstreamsServer(chainLen = 1000L,
      blocksPerProbe = 10L)
    try {
      val client = new GrpcBlockClient("127.0.0.1", server.port, "map_output")
      try {
        assert(client.headBlock() == 10L)
        client.prepareDrain() // pins at the NEXT probe's head (20)
        assert(client.headBlock() == 20L)
        assert(client.headBlock() == 20L) // stable despite mining
        assert(client.headBlock() == 20L)
      } finally client.close()
    } finally server.close()
  }

  test("TLS + ALPN h2: DSv2 drain with reorg identities over an " +
      "encrypted socket (self-signed trust, not insecure)") {
    import spark.implicits._
    val (sslCtx, pem) = TestTls.serverContextAndCert()
    val server = new TestSubstreamsServer(chainLen = 40L,
      blocksPerProbe = 43L, margin = 3L, reorgs = Seq((20L, 2)),
      sslContext = Some(sslCtx))
    try {
      val out = Files.createTempDirectory("grpc-tls-out").toString
      val q = spark.readStream.format("graft.sources.BlockStreamProvider")
        .option("client", classOf[GrpcBlockClientFactory].getName)
        .option("endpoint", s"127.0.0.1:${server.port}")
        .option("outputModule", "map_output")
        .option("confirmations", "3")
        .option("tls", "true")
        .option("trustcert", pem)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation",
          Files.createTempDirectory("grpc-tls-ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.processAllAvailable(); q.stop()
      val rows = spark.read.parquet(out)
        .select("block_number", "block_id").as[(Long, String)]
        .collect().sortBy(_._1).toSeq
      assert(rows.map(_._1) == (1L to 40L), "gapless, duplicate-free")
      val ids = rows.toMap
      assert(ids(19L) == "0xb19_r1" && ids(20L) == "0xb20_r1")
      assert(ids(18L) == "0xb18" && ids(21L) == "0xb21")
      assert(server.probeCalls.get() >= 1 && server.rangeCalls.get() >= 1)
    } finally server.close()
  }

  test("TLS: live-tail undo crosses the encrypted socket; plaintext " +
      "client against a TLS server fails, as does an untrusted cert") {
    def data(n: Long, gen: Int) = Data(BlockScopedData(
      Clock(BlockStreamSource.blockId(n, gen), n),
      Array[Byte](n.toByte), s"c$n", math.max(0L, n - 1)))
    val script =
      (1L to 8L).map(data(_, 0)) ++
        Seq(Undo(BlockUndoSignal("0xb5", 5L, "c5"))) ++
        (6L to 8L).map(data(_, 1))
    val (sslCtx, pem) = TestTls.serverContextAndCert()
    val server = new TestSubstreamsServer(chainLen = 8L,
      liveScript = script, sslContext = Some(sslCtx))
    try {
      val client = new GrpcBlockClient("127.0.0.1", server.port,
        "map_output", tls = true, trustCertPem = Some(pem))
      try {
        val buf = new UndoBuffer[BlockData](3, _.number)
        val released = scala.collection.mutable.ArrayBuffer.empty[BlockData]
        client.live(1L).foreach {
          case Data(d) =>
            released ++= buf.addBlock(
              BlockData(d.clock.number, d.clock.id, d.payload))
          case Undo(u) => buf.handleUndo(u.lastValidNum)
          case _ => ()
        }
        released ++= buf.flush()
        assert(released.map(_.number).toSeq == (1L to 8L))
        val ids = released.map(b => b.number -> b.id).toMap
        assert(ids(5L) == "0xb5" && ids(6L) == "0xb6_r1" &&
          ids(8L) == "0xb8_r1")
      } finally client.close()
      // a plaintext client can't speak to the TLS port — it must FAIL
      // (h2c preface into a TLS listener), not hang or return blocks
      intercept[Exception] {
        val pt = new GrpcBlockClient("127.0.0.1", server.port,
          "map_output", timeoutMs = 5000L)
        try pt.blocks(1L, 3L).toList finally pt.close()
      }
      // and a TLS client WITHOUT the self-signed cert in its trust store
      // must fail the handshake (proves trustcert is load-bearing)
      intercept[Exception] {
        val un = new GrpcBlockClient("127.0.0.1", server.port,
          "map_output", timeoutMs = 5000L, tls = true)
        try un.blocks(1L, 3L).toList finally un.close()
      }
    } finally server.close()
  }
}
