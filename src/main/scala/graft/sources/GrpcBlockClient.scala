package graft.sources

import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import io.netty.bootstrap.Bootstrap
import io.netty.buffer.{ByteBufUtil, Unpooled}
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer}
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame, DefaultHttp2Headers, DefaultHttp2HeadersFrame, Http2DataFrame, Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler, Http2StreamChannel, Http2StreamChannelBootstrap}
import io.netty.handler.ssl.{ApplicationProtocolConfig, ApplicationProtocolNames, SslContext, SslContextBuilder, SslHandler}
import io.netty.handler.ssl.ApplicationProtocolConfig.{Protocol, SelectedListenerFailureBehavior, SelectorFailureBehavior}
import io.netty.handler.ssl.util.InsecureTrustManagerFactory

import graft.ingest.SubstreamsRpc
import graft.ingest.SubstreamsRpc.{Data, Event, Other, Request, Undo}

/** A REAL gRPC client for `sf.substreams.rpc.v2.Stream/Blocks`, speaking
  * the public gRPC-over-HTTP/2 wire protocol on Netty's HTTP/2 codec (the
  * one transport stack shipped with Spark): h2c prior-knowledge by
  * default, or TLS with ALPN-negotiated h2 (`tls=true`, trust from
  * `trustcert` PEM / the JVM default store — production Substreams
  * endpoints are TLS, run.go:73-92's plaintext-vs-TLS dispatch); one
  * HTTP/2 stream per call with
  * `POST /sf.substreams.rpc.v2.Stream/Blocks`, `content-type:
  * application/grpc`, `te: trailers`; length-prefixed protobuf messages
  * in DATA frames; `grpc-status` read from the trailers. No generated
  * stubs, no grpc-java — the messages are [[SubstreamsRpc]]'s hand-rolled
  * codec over the fuzz-hardened ProtoWire primitives.
  *
  * This closes the [[BlockClient]] seam the way the reference's embedded
  * sink client does (sinker.go:91; endpoint resolution run.go:100-108):
  *  - [[headBlock]] — a head probe: `start_block_num = -1`
  *    (head-relative per the public protocol), read ONE
  *    BlockScopedData's clock, cancel the stream;
  *  - [[blocks]] — `[from, until)` with `final_blocks_only = true`; a
  *    finalized range can never reorg, so an undo signal here is a
  *    protocol violation and throws;
  *  - [[live]] — the unfinalized tail: Data AND Undo events, exactly
  *    what `HandleBlockScopedData`/`HandleBlockUndoSignal`
  *    (sinker.go:131,142) receive; compose with graft.ingest.UndoBuffer
  *    for K-confirmation finality.
  *
  * One event-loop thread per client; clients are per-task on executors
  * (the data plane never routes through the driver) and per-stream on
  * the driver (metadata-only head polls).
  */
final class GrpcBlockClient(host: String, port: Int, outputModule: String,
                            timeoutMs: Long = 30000L,
                            maxMessageBytes: Int = 4 * 1024 * 1024,
                            tls: Boolean = false,
                            trustCertPem: Option[String] = None,
                            tlsInsecure: Boolean = false)
    extends BlockClient {

  /** TLS + ALPN h2 (production Substreams endpoints are TLS; h2c
    * prior-knowledge stays the plaintext default for local/test use).
    * Trust comes from `trustCertPem` (a CA / self-signed cert PEM), the
    * JVM default trust store, or — test rigs only — `tlsInsecure`. */
  private val sslContext: Option[SslContext] =
    if (!tls) None
    else {
      val b = SslContextBuilder.forClient()
      trustCertPem.foreach(pem => b.trustManager(new java.io.File(pem)))
      if (tlsInsecure) b.trustManager(InsecureTrustManagerFactory.INSTANCE)
      b.applicationProtocolConfig(new ApplicationProtocolConfig(
        Protocol.ALPN,
        SelectorFailureBehavior.NO_ADVERTISE,
        SelectedListenerFailureBehavior.ACCEPT,
        ApplicationProtocolNames.HTTP_2))
      Some(b.build())
    }

  private val channel: Channel = {
    val b = new Bootstrap()
      .group(GrpcBlockClient.sharedGroup)
      .channel(classOf[NioSocketChannel])
      .handler(new ChannelInitializer[SocketChannel] {
        override def initChannel(ch: SocketChannel): Unit = {
          // TLS first when configured: handshake + ALPN select h2, then
          // the frame codec reads the negotiated stream
          sslContext.foreach(c =>
            ch.pipeline.addLast(c.newHandler(ch.alloc(), host, port)))
          ch.pipeline.addLast(
            Http2FrameCodecBuilder.forClient().build(),
            // peer-initiated streams don't exist on a gRPC client
            new Http2MultiplexHandler(new ChannelInboundHandlerAdapter()))
        }
      })
    val ch = b.connect(host, port).sync().channel()
    if (tls) {
      // block until the handshake completes and PROVE h2 was negotiated —
      // writing gRPC frames into an http/1.1-negotiated pipe would fail
      // with opaque codec errors later
      val h = ch.pipeline.get(classOf[SslHandler])
      h.handshakeFuture().sync()
      val proto = h.applicationProtocol()
      if (proto != ApplicationProtocolNames.HTTP_2) {
        ch.close().sync()
        throw new IllegalStateException(
          s"ALPN negotiated ${Option(proto).getOrElse("no protocol")} " +
            "(need h2) with " + s"$host:$port")
      }
    }
    ch
  }

  /** Terminal queue elements. */
  private case object EndOfStream
  private final case class StreamError(t: Throwable)

  /** Messages buffered between the event loop and the consumer before
    * reads pause. The consumer restarts reads as it drains, so a slow
    * sink pushes back through HTTP/2 flow control to the server instead
    * of accumulating the rest of the range on the executor heap. */
  private val queueCap = 64

  /** Open one gRPC call; the returned queue yields decoded Events, then
    * EndOfStream/StreamError. */
  private def call(req: Request)
      : (Http2StreamChannel, LinkedBlockingQueue[AnyRef]) = {
    val queue = new LinkedBlockingQueue[AnyRef]()
    val sb = new Http2StreamChannelBootstrap(channel)
    sb.handler(new ChannelInitializer[Channel] {
      override def initChannel(ch: Channel): Unit = {
        // explicit read-demand: the multiplexed child channel otherwise
        // auto-replenishes its flow-control window as frames arrive and
        // the server streams the whole range at network speed regardless
        // of how fast the consumer drains
        ch.config.setAutoRead(false)
        ch.pipeline.addLast(new ChannelInboundHandlerAdapter {
          private val frames =
            new SubstreamsRpc.FrameAccumulator(maxMessageBytes)
          private var status: Option[String] = None
          private var done = false

          override def channelRead(ctx: ChannelHandlerContext, msg: Any): Unit = {
            msg match {
              case h: Http2HeadersFrame =>
                // a non-200 :status is a transport-level failure (proxy
                // error, wrong server) — gRPC errors ride grpc-status
                val st = h.headers.status()
                if (st != null && st.toString != "200")
                  status = Some(s"http ${st.toString}")
                val s = h.headers.get("grpc-status")
                if (s != null) status = Some(s.toString)
                if (h.isEndStream) finish(ctx)
              case d: Http2DataFrame =>
                try {
                  val bytes = ByteBufUtil.getBytes(d.content)
                  frames.feed(bytes).foreach(m =>
                    queue.put(SubstreamsRpc.decodeResponse(m)))
                } finally d.release()
                if (d.isEndStream) finish(ctx)
              case other =>
                io.netty.util.ReferenceCountUtil.release(other)
            }
          }

          override def channelReadComplete(ctx: ChannelHandlerContext): Unit =
            // continue reading only while the consumer keeps up; when the
            // queue is full the consumer's drain restarts the reads (and
            // HTTP/2 flow control holds the server meanwhile)
            if (!done && queue.size < queueCap) ctx.read()

          private def finish(ctx: ChannelHandlerContext): Unit = {
            done = true
            status match {
              case Some("0") | None if frames.isEmpty =>
                queue.put(EndOfStream)
              case Some("0") | None =>
                queue.put(StreamError(new IllegalStateException(
                  "stream ended mid-message (truncated gRPC frame)")))
              case Some(s) =>
                queue.put(StreamError(new IllegalStateException(
                  s"grpc-status $s")))
            }
            ctx.close()
          }

          override def channelInactive(ctx: ChannelHandlerContext): Unit =
            // RST / connection drop without trailers: report, don't hang
            if (!done) queue.put(StreamError(new IllegalStateException(
              "stream closed without grpc trailers")))

          override def exceptionCaught(ctx: ChannelHandlerContext,
              cause: Throwable): Unit = {
            if (!done) { done = true; queue.put(StreamError(cause)) }
            ctx.close()
          }
        })
        ()
      }
    })
    val stream = sb.open().sync().getNow
    val headers = new DefaultHttp2Headers()
    headers.method("POST").scheme(if (tls) "https" else "http")
      .path(SubstreamsRpc.BlocksPath).authority(s"$host:$port")
    headers.set("content-type", "application/grpc")
    headers.set("te", "trailers")
    stream.write(new DefaultHttp2HeadersFrame(headers))
    stream.writeAndFlush(new DefaultHttp2DataFrame(
      Unpooled.wrappedBuffer(SubstreamsRpc.frame(
        SubstreamsRpc.encodeRequest(req))), true))
    stream.read() // demand the response headers/first frames
    (stream, queue)
  }

  private def awaitEvent(stream: Http2StreamChannel,
                         queue: LinkedBlockingQueue[AnyRef]): AnyRef = {
    val e = queue.poll(timeoutMs, TimeUnit.MILLISECONDS)
    if (e == null) throw new java.util.concurrent.TimeoutException(
      s"no gRPC event within ${timeoutMs}ms from $host:$port")
    // drain-side read restart: if the handler paused reads on a full
    // queue, consuming below half-capacity resumes them (redundant
    // read() calls while a read is pending are harmless)
    if (queue.size < queueCap / 2 && stream.isActive) stream.read()
    e
  }

  /** Blocking iterator over one call's events; the first StreamError
    * rethrows, EndOfStream ends iteration. Every exceptional exit —
    * including an awaitEvent timeout — closes the stream (RST_STREAM), so
    * an abandoned call can't keep its flow-control window and queue alive
    * until the whole client closes. */
  private def events(req: Request): Iterator[Event] =
    eventsAndStream(req)._2

  private def eventsAndStream(req: Request)
      : (Http2StreamChannel, Iterator[Event]) = {
    val (stream, queue) = call(req)
    // a consumer that abandons this iterator mid-stream stops issuing
    // reads, so HTTP/2 flow control caps what the server can push to
    // ~queueCap buffered messages until close() tears the connection down
    val it = new Iterator[Event] {
      private var nextEv: Option[Event] = None
      private var done = false
      private def pump(): Unit =
        if (!done && nextEv.isEmpty) {
          val ev = try awaitEvent(stream, queue) catch {
            case t: Throwable => done = true; stream.close(); throw t
          }
          ev match {
            case EndOfStream => done = true; stream.close()
            case StreamError(t) => done = true; stream.close(); throw t
            case e: Event => nextEv = Some(e)
          }
        }
      override def hasNext: Boolean = { pump(); nextEv.isDefined }
      override def next(): Event = {
        pump()
        val e = nextEv.getOrElse(throw new NoSuchElementException)
        nextEv = None
        e
      }
    }
    (stream, it)
  }

  // Trigger.AvailableNow on a live chain: the head keeps advancing, so
  // an unpinned drain would chase it forever. prepareDrain pins the head
  // observed at prepare time; the engine then drains to a fixed offset
  // and terminates deterministically.
  @volatile private var drainCap: Option[Long] = None

  override def prepareDrain(): Unit = drainCap = Some(probeHead())

  /** Head probe: head-relative start, one block, cancel; pinned after
    * [[prepareDrain]]. */
  override def headBlock(): Long = drainCap.getOrElse(probeHead())

  private def probeHead(): Long = {
    val (stream, queue) = call(Request(startBlockNum = -1L, stopBlockNum = 0L,
      outputModule = outputModule, finalBlocksOnly = false))
    try {
      var head = -1L
      var waiting = true
      while (waiting) awaitEvent(stream, queue) match {
        case Data(d) => head = d.clock.number; waiting = false
        case Undo(_) | _: Other => // keep waiting for a data event
        case EndOfStream => waiting = false
        case StreamError(t) => throw t
      }
      if (head < 0) throw new IllegalStateException(
        "head probe got no block before end of stream")
      head
    } finally stream.close() // cancel (RST_STREAM) — we only wanted one
  }

  /** Finalized range [from, until): final_blocks_only streams never carry
    * undo signals (protocol guarantee), so one is a hard error — which
    * also cancels the call, since the throw happens outside the event
    * iterator's own close-on-error path. */
  override def blocks(from: Long, until: Long): Iterator[BlockData] = {
    val (stream, it) = eventsAndStream(Request(startBlockNum = from,
      stopBlockNum = until, outputModule = outputModule,
      finalBlocksOnly = true))
    it.flatMap {
      case Data(d) => Some(BlockData(d.clock.number, d.clock.id, d.payload))
      case Undo(u) =>
        stream.close()
        throw new IllegalStateException(
          s"undo signal on a final-blocks-only stream (last valid " +
            s"${u.lastValidNum}) — endpoint violated finality")
      case _: Other => None
    }
  }

  /** Live tail from `from`, unfinalized: Data and Undo events as they
    * come — the sinker.go:131/142 feed; wrap with UndoBuffer for
    * finality. Ends when the server ends the stream. */
  def live(from: Long): Iterator[Event] =
    events(Request(startBlockNum = from, stopBlockNum = 0L,
      outputModule = outputModule, finalBlocksOnly = false))
      .filter(!_.isInstanceOf[Other])

  override def close(): Unit = {
    channel.close().sync()
    ()
  }
}

object GrpcBlockClient {
  /** One daemon event-loop group per JVM, shared by every client: an
    * executor creates one client PER TASK (the data plane is
    * task-local), and per-client groups would churn threads at
    * one-per-task rates. Daemon threads die with the JVM — no shutdown
    * bookkeeping; close() only closes the client's connection. */
  private lazy val sharedGroup = new NioEventLoopGroup(2,
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-grpc-elg-${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      }
    })
}

/** The endpoint-resolution factory (source option `client` → FQCN,
  * run.go:100-108 analogue): reads `endpoint` (host:port) and
  * `outputmodule` from the source option map. */
final class GrpcBlockClientFactory extends BlockClientFactory {
  override def create(o: Map[String, String]): BlockClient = {
    // explicit endpoint, or a named network through the registry
    // (run.go:73-92 precedence; Networks.resolve errors when neither
    // option names a chain)
    val endpoint = Networks.resolve(
      o.get("endpoint"), o.get("network"), o.get("manifestnetwork"))
    // split on the LAST ':' so IPv6 literals ([::1]:9000) parse; brackets
    // around the host part are stripped
    val cut = endpoint.lastIndexOf(':')
    if (cut <= 0 || cut == endpoint.length - 1)
      throw new IllegalArgumentException(
        s"unparseable endpoint: $endpoint (want host:port or [ipv6]:port)")
    val host = endpoint.substring(0, cut).stripPrefix("[").stripSuffix("]")
    val port = try endpoint.substring(cut + 1).toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"unparseable endpoint port: $endpoint")
    }
    new GrpcBlockClient(host, port,
      outputModule = o.getOrElse("outputmodule", "map_output"),
      timeoutMs = o.getOrElse("rpctimeoutms", "30000").toLong,
      maxMessageBytes =
        o.getOrElse("maxmessagebytes", (4 * 1024 * 1024).toString).toInt,
      tls = o.getOrElse("tls", "false").toBoolean,
      trustCertPem = o.get("trustcert"),
      tlsInsecure = o.getOrElse("tlsinsecure", "false").toBoolean)
  }
}
