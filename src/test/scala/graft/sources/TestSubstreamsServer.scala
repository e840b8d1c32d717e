package graft.sources

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.{ByteBufUtil, Unpooled}
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer}
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioServerSocketChannel
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame, DefaultHttp2Headers, DefaultHttp2HeadersFrame, Http2DataFrame, Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler}

import graft.ingest.{ProtoWire, SampleBlocks, SubstreamsRpc}
import graft.ingest.SubstreamsRpc.{BlockScopedData, BlockUndoSignal, Clock, Request}

/** In-process `sf.substreams.rpc.v2.Stream/Blocks` server speaking the
  * real gRPC wire protocol over a real TCP socket (Netty HTTP/2, h2c):
  * validates :path/content-type, decodes the length-prefixed Request,
  * streams length-prefixed Response messages, ends with `grpc-status: 0`
  * trailers. Test-only — the PEER that proves GrpcBlockClient is a
  * drop-in for a live endpoint.
  *
  * Serves a deterministic simulated chain (same id/payload scheme as
  * SimChainClient so the e2e pipeline asserts are comparable):
  *  - head probe (start_block_num < 0): one BlockScopedData at the
  *    current head; the head advances `blocksPerProbe` per probe up to
  *    `chainLen + margin` (a SimChain-compatible "mining" model);
  *  - range (final_blocks_only): blocks [start, stop) capped at chainLen;
  *  - live (start ≥ 0, no stop, not final-only): scripted unfinalized
  *    tail — blocks, then an undo signal, then the re-mined fork, per
  *    `liveScript`.
  */
final class TestSubstreamsServer(
    chainLen: Long,
    blocksPerProbe: Long = 10L,
    margin: Long = 0L,
    reorgs: Seq[(Long, Int)] = Seq.empty,
    liveScript: Seq[SubstreamsRpc.Event] = Seq.empty,
    errorStatus: Option[Int] = None,
    sslContext: Option[io.netty.handler.ssl.SslContext] = None)
  extends AutoCloseable {

  private val boss = new NioEventLoopGroup(1)
  private val workers = new NioEventLoopGroup(2)
  private val head = new AtomicLong(0L)
  val rangeCalls = new AtomicInteger(0)
  val probeCalls = new AtomicInteger(0)

  private def blockData(n: Long): BlockScopedData = {
    val gen = BlockStreamSource.generation(n, reorgs)
    BlockScopedData(
      Clock(BlockStreamSource.blockId(n, gen), n),
      ProtoWire.encode(SampleBlocks.output, SampleBlocks.samplePayload(n)),
      cursor = s"c$n", finalBlockHeight = math.max(0L, n - 1))
  }

  private def respond(req: Request): Seq[Array[Byte]] =
    if (req.startBlockNum < 0) { // head probe
      probeCalls.incrementAndGet()
      // the probe reports the true head, which mines margin blocks past
      // chainLen so a K-lagged consumer can expose the whole chain
      val h = head.updateAndGet(x =>
        math.min(x + blocksPerProbe, chainLen + margin))
      Seq(SubstreamsRpc.encodeData(blockData(h)))
    } else if (req.finalBlocksOnly) { // finalized range
      rangeCalls.incrementAndGet()
      (req.startBlockNum until math.min(req.stopBlockNum, chainLen + 1))
        .map(n => SubstreamsRpc.encodeData(blockData(n)))
    } else { // live tail: the scripted unfinalized feed
      liveScript.collect {
        case SubstreamsRpc.Data(d) => SubstreamsRpc.encodeData(d)
        case SubstreamsRpc.Undo(u) => SubstreamsRpc.encodeUndo(u)
      }
    }

  private val channel: Channel = new ServerBootstrap()
    .group(boss, workers)
    .channel(classOf[NioServerSocketChannel])
    .childHandler(new ChannelInitializer[SocketChannel] {
      override def initChannel(ch: SocketChannel): Unit = {
        sslContext.foreach(c => ch.pipeline.addLast(c.newHandler(ch.alloc())))
        ch.pipeline.addLast(
          Http2FrameCodecBuilder.forServer().build(),
          new Http2MultiplexHandler(new ChannelInitializer[Channel] {
            override def initChannel(stream: Channel): Unit =
              stream.pipeline.addLast(new ChannelInboundHandlerAdapter {
                private val frames = new SubstreamsRpc.FrameAccumulator
                private var pathOk = false
                private var request: Option[Request] = None

                override def channelRead(ctx: ChannelHandlerContext,
                    msg: Any): Unit = msg match {
                  case h: Http2HeadersFrame =>
                    pathOk =
                      h.headers.path() != null &&
                        h.headers.path.toString ==
                          SubstreamsRpc.BlocksPath &&
                        h.headers.get("content-type") != null &&
                        h.headers.get("content-type").toString
                          .startsWith("application/grpc")
                    if (h.isEndStream) reply(ctx)
                  case d: Http2DataFrame =>
                    try frames.feed(ByteBufUtil.getBytes(d.content))
                      .foreach(m =>
                        request = Some(SubstreamsRpc.decodeRequest(m)))
                    finally d.release()
                    if (d.isEndStream) reply(ctx)
                  case other =>
                    io.netty.util.ReferenceCountUtil.release(other)
                }

                private def reply(ctx: ChannelHandlerContext): Unit = {
                  errorStatus.foreach { code =>
                    // scripted failure: gRPC trailers-only error response
                    val trailers = new DefaultHttp2Headers()
                    trailers.status("200")
                    trailers.set("content-type", "application/grpc")
                    trailers.set("grpc-status", code.toString)
                    ctx.writeAndFlush(
                      new DefaultHttp2HeadersFrame(trailers, true))
                    return
                  }
                  if (!pathOk || request.isEmpty) {
                    val trailers = new DefaultHttp2Headers()
                    trailers.status("200")
                    trailers.set("content-type", "application/grpc")
                    trailers.set("grpc-status", "12") // UNIMPLEMENTED
                    ctx.writeAndFlush(
                      new DefaultHttp2HeadersFrame(trailers, true))
                    return
                  }
                  val headers = new DefaultHttp2Headers()
                  headers.status("200")
                  headers.set("content-type", "application/grpc")
                  ctx.write(new DefaultHttp2HeadersFrame(headers))
                  respond(request.get).foreach { m =>
                    ctx.write(new DefaultHttp2DataFrame(
                      Unpooled.wrappedBuffer(SubstreamsRpc.frame(m))))
                  }
                  val trailers = new DefaultHttp2Headers()
                  trailers.set("grpc-status", "0")
                  ctx.writeAndFlush(
                    new DefaultHttp2HeadersFrame(trailers, true))
                  ()
                }
              })
          }))
        ()
      }
    })
    .bind("127.0.0.1", 0).sync().channel()

  val port: Int =
    channel.localAddress.asInstanceOf[java.net.InetSocketAddress].getPort

  override def close(): Unit = {
    channel.close().sync()
    boss.shutdownGracefully(0, 100, java.util.concurrent.TimeUnit.MILLISECONDS)
    workers.shutdownGracefully(0, 100, java.util.concurrent.TimeUnit.MILLISECONDS)
    ()
  }
}
