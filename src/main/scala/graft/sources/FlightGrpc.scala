package graft.sources

import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{CompletableFuture, Executors, ThreadFactory, TimeUnit}

import scala.util.control.NonFatal

import io.netty.bootstrap.{Bootstrap, ServerBootstrap}
import io.netty.buffer.ByteBuf
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer, MultiThreadIoEventLoopGroup}
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.{NioServerSocketChannel, NioSocketChannel}
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame, DefaultHttp2Headers, DefaultHttp2HeadersFrame, DefaultHttp2WindowUpdateFrame, Http2DataFrame, Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler, Http2StreamChannel, Http2StreamChannelBootstrap}
import io.netty.handler.ssl.{ApplicationProtocolConfig, ApplicationProtocolNames, ApplicationProtocolNegotiationHandler, SslContext, SslContextBuilder, SslProvider}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Arrow Flight over REAL gRPC/HTTP/2 — the session layer that was the
  * one remaining delta between this engine's Flight surface and the
  * reference's (Producer.java:86-510 + App.java serve these RPCs via
  * arrow-flight's grpc-java binding). No grpc or arrow-flight jar ships
  * in this environment, but Netty's HTTP/2 codec DOES (netty-codec-http2
  * is on the Spark classpath — Spark's own RPC rides Netty), and gRPC is
  * a thin, public convention over HTTP/2 (gRPC `PROTOCOL-HTTP2.md`):
  *
  *  - one RPC = one HTTP/2 stream; request HEADERS carry `:method POST`,
  *    `:path /arrow.flight.protocol.FlightService/<Method>`,
  *    `content-type: application/grpc+proto`, `te: trailers`, and the
  *    `authorization` credential;
  *  - each DATA frame carries length-prefixed messages: 1 byte
  *    compressed-flag (0 — identity) + u32 big-endian length + the
  *    protobuf payload ([[FlightProto]] messages, already wire-exact);
  *  - the response is HEADERS (`:status 200`) + DATA + trailing HEADERS
  *    with `grpc-status`/`grpc-message` (or a trailers-only response for
  *    failures before any message is sent).
  *
  * HTTP/2 session mechanics — connection preface, SETTINGS exchange,
  * HPACK header compression, stream multiplexing, flow-control windows,
  * frame splitting at max-frame-size — come from Netty's vetted codec
  * (`Http2FrameCodec` + `Http2MultiplexHandler`), exactly the layering
  * grpc-java itself uses (grpc-netty). The verbs run on the SAME
  * [[FlightService]] instance as the framed-TCP transport, so both wires
  * front one catalog/job registry.
  *
  * Methods served (Flight.proto service surface): Handshake, ListFlights,
  * GetFlightInfo, GetSchema, DoGet, DoPut, DoExchange, DoAction,
  * ListActions — the full reference verb set plus the two the reference
  * lacked (GetSchema as a first-class RPC, DoExchange).
  *
  * Scale posture: DoGet streams one partition's IPC messages at a time
  * through `toLocalIterator` (never the whole dataset on the heap), and
  * the response DATA rides HTTP/2 flow control — a slow client applies
  * backpressure through its window instead of losing rows (the
  * reference's producer DROPS batches under backpressure; ours never
  * does, COVERAGE.md §2.4). Spark work is dispatched off the Netty event
  * loops onto a worker pool, so a long query never stalls other streams'
  * frames. */
object FlightGrpc {

  val ServicePath = "/arrow.flight.protocol.FlightService/"

  /** gRPC status codes used here (public grpc codes.md). */
  object Status {
    val Ok = 0
    val Unknown = 2
    val InvalidArgument = 3
    val NotFound = 5
    val Unimplemented = 12
    val Internal = 13
    val Unauthenticated = 16
  }

  final class GrpcException(val code: Int, msg: String)
      extends RuntimeException(msg)

  /** Actions whose gRPC Result.body is a serialized Ticket protobuf
    * (the reference's `_submit` contract, neo4j_arrow.py:157-168). */
  private val TicketActions = Set("cypher.read", "gds.read", "job.submit",
    "gds.write.nodes", "gds.write.relationships")

  /** Raised by the producer loop when the client closes its stream
    * mid-response — the disconnect hook (Producer.java:133-136 analog):
    * the remaining work is abandoned, not burned into a dead socket. */
  private[sources] final class ClientGoneException
      extends RuntimeException("stream closed by client mid-response")

  /** Growable byte accumulator with a read cursor — O(1) amortized
    * append/consume (a BAOS here forced a full copy of the buffered
    * tail per HTTP/2 DATA frame: quadratic memcpy per large message). */
  private final class ByteAccum {
    private var buf = new Array[Byte](1 << 16)
    private var start = 0
    private var end = 0
    def size: Int = end - start
    def append(b: Array[Byte], off: Int, n: Int): Unit = {
      if (end + n > buf.length) {
        if (size + n <= buf.length / 2) {
          System.arraycopy(buf, start, buf, 0, size) // compact in place
        } else {
          val nb = new Array[Byte](
            java.lang.Math.max(buf.length * 2, size + n))
          System.arraycopy(buf, start, nb, 0, size)
          buf = nb
        }
        end = size; start = 0
      }
      System.arraycopy(b, off, buf, end, n)
      end += n
    }
    def peek(i: Int): Int = buf(start + i) & 0xFF
    def skip(n: Int): Unit = { start += n }
    def take(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(buf, start, start + n)
      start += n
      out
    }
    def toByteArray: Array[Byte] =
      java.util.Arrays.copyOfRange(buf, start, end)
  }

  // ---------------------------------------------------------------- TLS
  /** TLS for the Flight endpoint — the last session-layer delta to a
    * stock grpc-java Flight deployment (`grpc+tls://` locations). gRPC
    * over TLS requires ALPN advertising exactly `h2` (PROTOCOL-HTTP2.md);
    * JDK 17's SSLEngine negotiates ALPN natively, so the JDK provider
    * suffices — no tcnative. Key material comes from a PKCS12 keystore
    * (`keytool -genkeypair -storetype PKCS12` — plain JDK tooling; see
    * FlightTlsSpec), never from code-generated sun.security.* internals.
    *
    * Server side: keystore with the private key + cert chain. Client
    * side: truststore holding the peer's cert (pinned trust — the
    * loopback-test analog of a CA bundle). */
  object Tls {
    final case class ServerTls(keyStorePath: String, password: String)
    final case class ClientTls(trustStorePath: String, password: String)

    private val alpnH2 = new ApplicationProtocolConfig(
      ApplicationProtocolConfig.Protocol.ALPN,
      // NO_ADVERTISE + ACCEPT: the JDK-provider-compatible failure modes
      // (grpc-netty uses the same pair)
      ApplicationProtocolConfig.SelectorFailureBehavior.NO_ADVERTISE,
      ApplicationProtocolConfig.SelectedListenerFailureBehavior.ACCEPT,
      ApplicationProtocolNames.HTTP_2)

    private def loadKeyStore(path: String,
                             password: String): java.security.KeyStore = {
      val ks = java.security.KeyStore.getInstance("PKCS12")
      val in = new java.io.FileInputStream(path)
      try ks.load(in, password.toCharArray) finally in.close()
      ks
    }

    private[FlightGrpc] def serverContext(tls: ServerTls): SslContext = {
      val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
        javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
      kmf.init(loadKeyStore(tls.keyStorePath, tls.password),
        tls.password.toCharArray)
      SslContextBuilder.forServer(kmf)
        .sslProvider(SslProvider.JDK)
        .applicationProtocolConfig(alpnH2)
        .build()
    }

    private[FlightGrpc] def clientContext(tls: ClientTls): SslContext = {
      val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
        javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(loadKeyStore(tls.trustStorePath, tls.password))
      SslContextBuilder.forClient()
        .sslProvider(SslProvider.JDK)
        .trustManager(tmf)
        .applicationProtocolConfig(alpnH2)
        .build()
    }
  }

  // ------------------------------------------------------ gRPC framing
  /** One length-prefixed gRPC message: flag 0 (identity) + u32 BE length
    * + protobuf payload. */
  private def grpcFrame(ctx: ChannelHandlerContext,
                        msg: Array[Byte]): ByteBuf = {
    val b = ctx.alloc().buffer(5 + msg.length)
    b.writeByte(0)
    b.writeInt(msg.length)
    b.writeBytes(msg)
    b
  }

  /** Split a request body into its length-prefixed gRPC messages. */
  private def parseGrpcMessages(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val acc = Seq.newBuilder[Array[Byte]]
    var pos = 0
    while (pos < bytes.length) {
      if (pos + 5 > bytes.length)
        throw new GrpcException(Status.Internal, "truncated gRPC frame")
      val flag = bytes(pos) & 0xFF
      if (flag != 0)
        throw new GrpcException(Status.Unimplemented,
          "compressed gRPC messages not supported (identity only)")
      val len = ((bytes(pos + 1) & 0xFF) << 24) | ((bytes(pos + 2) & 0xFF) << 16) |
        ((bytes(pos + 3) & 0xFF) << 8) | (bytes(pos + 4) & 0xFF)
      if (len < 0 || pos + 5 + len > bytes.length)
        throw new GrpcException(Status.Internal, s"bad gRPC frame length $len")
      acc += java.util.Arrays.copyOfRange(bytes, pos + 5, pos + 5 + len)
      pos += 5 + len
    }
    acc.result()
  }

  private def daemonFactory(prefix: String): ThreadFactory = new ThreadFactory {
    private val n = new java.util.concurrent.atomic.AtomicInteger(0)
    def newThread(r: Runnable): Thread = {
      val t = new Thread(r, s"$prefix-${n.getAndIncrement()}")
      t.setDaemon(true)
      t
    }
  }

  /** FlightData messages for a DataFrame, Flight-shaped: ONE leading
    * Schema message, then every partition's record batches (partition
    * streams after the first drop their redundant Schema headers — a
    * Flight getStream is a single logical Arrow stream). */
  private def flightDataMessages(df: DataFrame)
      : Iterator[FlightProto.IpcMessage] = {
    val it = ArrowIpc.toIpcStreams(df).toLocalIterator()
    var firstPartition = true
    new Iterator[Array[Byte]] {
      def hasNext: Boolean = it.hasNext
      def next(): Array[Byte] = it.next()
    }.flatMap { blob =>
      val msgs = FlightProto.splitIpcStream(blob)
      val keep =
        if (firstPartition) msgs
        else msgs.filterNot(FlightProto.isSchemaMessage)
      firstPartition = false
      keep
    }
  }

  // ------------------------------------------------------------- server
  final class Server(spark: SparkSession, token: String,
                     sharedService: Option[FlightService] = None,
                     tls: Option[Tls.ServerTls] = None) {
    val service: FlightService =
      sharedService.getOrElse(new FlightService(spark))
    /** Responses abandoned because the client went away mid-stream —
      * observable evidence the disconnect hook fired (specs poll it). */
    val abortedResponses = new java.util.concurrent.atomic.AtomicInteger(0)
    private[FlightGrpc] val secure: Boolean = tls.isDefined
    private val group =
      new MultiThreadIoEventLoopGroup(2, NioIoHandler.newFactory())
    private[FlightGrpc] val dispatchPool =
      Executors.newCachedThreadPool(daemonFactory("graft-grpc-dispatch"))
    private var ch: Channel = _

    def register(name: String, df: DataFrame): Unit =
      service.register(name, df)
    def registerGraph(name: String, nodes: DataFrame,
                      rels: DataFrame): Unit =
      service.registerGraph(name, nodes, rels)

    def port: Int =
      ch.localAddress().asInstanceOf[InetSocketAddress].getPort

    def start(): this.type = {
      val sslCtx = tls.map(Tls.serverContext)
      def installH2(p: io.netty.channel.ChannelPipeline): Unit = {
        p.addLast(Http2FrameCodecBuilder.forServer().build())
        p.addLast(new Http2MultiplexHandler(
          new ChannelInitializer[Channel] {
            override def initChannel(sc: Channel): Unit = {
              sc.pipeline().addLast(
                new ServerStreamHandler(Server.this, token)); ()
            }
          }))
        ()
      }
      val b = new ServerBootstrap()
        .group(group)
        .channel(classOf[NioServerSocketChannel])
        .childHandler(new ChannelInitializer[SocketChannel] {
          override def initChannel(c: SocketChannel): Unit = sslCtx match {
            case None => installH2(c.pipeline())
            case Some(ssl) =>
              // TLS first; H2 handlers install only after ALPN settles on
              // h2 (a client that negotiated anything else is not gRPC)
              c.pipeline().addLast(ssl.newHandler(c.alloc()))
              c.pipeline().addLast(new ApplicationProtocolNegotiationHandler(
                  ApplicationProtocolNames.HTTP_2) {
                override def configurePipeline(ctx: ChannelHandlerContext,
                                               protocol: String): Unit = {
                  if (protocol != ApplicationProtocolNames.HTTP_2)
                    throw new IllegalStateException(
                      s"ALPN negotiated '$protocol', need h2")
                  installH2(ctx.pipeline())
                }
              })
              ()
          }
        })
      ch = b.bind("127.0.0.1", 0).sync().channel()
      this
    }

    def close(): Unit = {
      if (ch != null) ch.close().sync()
      dispatchPool.shutdownNow()
      group.shutdownGracefully(0, 200, TimeUnit.MILLISECONDS)
      service.cleanupStaging()
      ()
    }
  }

  /** Collects one RPC's request (headers + body), then dispatches OFF the
    * event loop and streams the response back. One instance per HTTP/2
    * stream (the multiplex handler guarantees it). */
  private final class ServerStreamHandler(srv: Server, token: String)
      extends ChannelInboundHandlerAdapter {
    private var method = ""
    private var authorized = false
    private val body = new ByteAccum

    private def authOk(header: Option[String]): Boolean = header.exists { v =>
      // Bearer <token> (what our Handshake hands back) or the reference's
      // basic-auth shape, any user + the shared secret as password
      // (HorribleBasicAuthValidator.java:19-56). Constant-time compares.
      if (v.startsWith("Bearer "))
        java.security.MessageDigest.isEqual(
          v.substring(7).getBytes(UTF_8), token.getBytes(UTF_8))
      else if (v.startsWith("Basic ")) {
        val decoded =
          try new String(java.util.Base64.getDecoder.decode(v.substring(6)), UTF_8)
          catch { case NonFatal(_) => return false }
        decoded.split(":", 2) match {
          case Array(_, pass) => java.security.MessageDigest.isEqual(
            pass.getBytes(UTF_8), token.getBytes(UTF_8))
          case _ => false
        }
      } else false
    }

    /** gRPC BINARY metadata (`-bin` suffix) rides base64 on the wire,
      * padding optional per the gRPC spec — the credential an upstream
      * client's legacy AuthHandler sends after a payload Handshake. */
    private def tokenBinOk(header: Option[String]): Boolean = header.exists { v =>
      val padded = v + "=" * ((4 - v.length % 4) % 4)
      val decoded =
        try java.util.Base64.getDecoder.decode(padded)
        catch { case NonFatal(_) => return false }
      java.security.MessageDigest.isEqual(decoded, token.getBytes(UTF_8))
    }

    override def channelRead(ctx: ChannelHandlerContext,
                             msg: AnyRef): Unit = msg match {
      case h: Http2HeadersFrame =>
        Option(h.headers().path()).foreach { p =>
          method = p.toString.stripPrefix(ServicePath)
        }
        authorized = authorized || authOk(
          Option(h.headers().get("authorization")).map(_.toString)) ||
          tokenBinOk(
            Option(h.headers().get("auth-token-bin")).map(_.toString))
        if (h.isEndStream) {
          // once a DoPut routed through the ingest worker, ALL put
          // state belongs to that thread — END_STREAM on a trailing
          // HEADERS frame (legal HTTP/2 half-close) must flow through
          // the queue like END_STREAM on DATA does; finish() here would
          // race the worker mid-drain (closeSpill under its writes,
          // dispatch with a partial frame list, double respond)
          if (putQueue != null) putQueue.put(new PutChunk(null, 0, end = true))
          else finish(ctx)
        }
      case d: Http2DataFrame =>
        // an unauthenticated request's body is DISCARDED as it arrives:
        // buffering (or spilling!) bytes for a caller that will be
        // rejected at END_STREAM is a free memory/disk-exhaustion hole.
        // The credential rides the HEADERS frame, which precedes DATA.
        val wanted = authorized || method == "Handshake"
        val n = d.content().readableBytes()
        val fc = d.initialFlowControlledBytes()
        val end = d.isEndStream
        if (method == "DoPut" && wanted) {
          // DoPut DATA routes through a per-stream ingest worker: the
          // FlightData decode and the blocking spill-file disk writes
          // happen OFF the (2-thread) event loop, so a slow disk during
          // one large upload never stalls frame delivery for other
          // streams. Backpressure: the flow-control credit for a chunk
          // is replenished only AFTER the worker consumed it, so the
          // client can never run ahead of the disk by more than the
          // HTTP/2 window (which also bounds the queue).
          if (putQueue == null) startPutWorker(ctx)
          if (putParseError != null) {
            // the RPC is already doomed: drop arriving bytes on the
            // floor (buffering a failed upload to END_STREAM is the
            // same exhaustion hole the auth gate closes) and replenish
            // the window directly so the client reaches END_STREAM and
            // the error trailer
            d.release()
            if (fc > 0) {
              ctx.writeAndFlush(new DefaultHttp2WindowUpdateFrame(fc)); ()
            }
            putQueue.put(new PutChunk(null, 0, end))
          } else {
            val tmp = if (n > 0) {
              val a = new Array[Byte](n); d.content().readBytes(a); a
            } else null
            d.release()
            putQueue.put(new PutChunk(tmp, fc, end))
          }
        } else {
          if (n > 0 && wanted) {
            val tmp = new Array[Byte](n)
            d.content().readBytes(tmp)
            body.append(tmp, 0, n)
          }
          d.release()
          // replenish stream + connection windows for what we consumed
          // (the multiplex stream channel forwards this as consumed bytes)
          if (fc > 0) {
            ctx.writeAndFlush(new DefaultHttp2WindowUpdateFrame(fc)); ()
          }
          if (end) finish(ctx)
          else if (method == "Handshake" && hasCompleteMessage())
            // Handshake is BIDI: an upstream auth handler blocks reading
            // the HandshakeResponse BEFORE half-closing its side, so the
            // server must answer the first message eagerly — waiting for
            // END_STREAM here deadlocks a stock client's authenticate()
            finish(ctx)
        }
      case other =>
        io.netty.util.ReferenceCountUtil.release(other)
        ()
    }

    /** At least one complete length-prefixed gRPC message buffered? */
    private def hasCompleteMessage(): Boolean =
      body.size >= 5 && {
        val len = (body.peek(1) << 24) | (body.peek(2) << 16) |
          (body.peek(3) << 8) | body.peek(4)
        len >= 0 && body.size >= 5 + len
      }

    // ---- streaming DoPut ingest: FlightData messages decode AS THEY
    // ARRIVE (the request body is consumed, never accumulated) and, past
    // SpillThreshold, the decoded IPC streams spill to `.arrows` files —
    // so a 100 GB upload holds ONE message on the heap, and the flight
    // registers as a lazy DSv2 read over the spill files
    // (FlightService.ingestSpilledPut). CMD-descriptor puts (graph
    // parts) keep the buffered route: their ingest re-shapes columns
    // eagerly anyway.
    private val SpillThreshold = 4 << 20
    private val SpillRollBytes = 64L << 20 // new file every ~64 MB
    private var putFramesRev = List.empty[FlightProto.FlightData]
    private var putBytes = 0L
    private var putDescriptor: Option[FlightProto.FlightDescriptor] = None
    private var putSchemaDdl: String = null
    private var spillDir: java.io.File = null
    private var spillOut: java.io.OutputStream = null
    private var spillFileIdx = 0
    // written by the put worker, read by the event loop (early-discard
    // gate) — hence volatile
    @volatile private var putParseError: GrpcException = null

    // ---- per-stream DoPut ingest worker (decode + spill off the event
    // loop). One chunk per DATA frame; `credit` is the flow-control
    // replenish deferred until the worker consumed the bytes; a
    // bytes=null chunk carries only credit/END_STREAM ordering.
    private final class PutChunk(val bytes: Array[Byte], val credit: Int,
                                 val end: Boolean)
    private var putQueue:
      java.util.concurrent.LinkedBlockingQueue[PutChunk] = null
    @volatile private var putAborted = false

    private def startPutWorker(ctx: ChannelHandlerContext): Unit = {
      putQueue = new java.util.concurrent.LinkedBlockingQueue[PutChunk]()
      // the dispatch pool is cached (unbounded, reused threads): same
      // one-thread-owns-the-stream model as a dedicated Thread, without
      // per-RPC thread creation on the ingest hot path
      srv.dispatchPool.execute(() => putWorkerLoop(ctx))
    }

    private def putWorkerLoop(ctx: ChannelHandlerContext): Unit = {
      var done = false
      while (!done) {
        val c = putQueue.take()
        if (putAborted) {
          // client went away before END_STREAM: reclaim the spill here —
          // this thread owns all put state, so no cleanup races the
          // decode path
          try closeSpill() catch { case NonFatal(_) => () }
          if (spillDir != null) {
            Option(spillDir.listFiles).foreach(_.foreach(_.delete()))
            spillDir.delete()
            spillDir = null
          }
          return
        }
        if (c.bytes != null && putParseError == null) {
          body.append(c.bytes, 0, c.bytes.length)
          drainPut()
        }
        // replenish only now: the bytes are consumed (decoded/spilled),
        // so a stalled disk withholds window credit instead of letting
        // the client fill an unbounded queue. Netty schedules the write
        // onto the event loop; calling from here is safe.
        if (c.credit > 0) {
          ctx.writeAndFlush(new DefaultHttp2WindowUpdateFrame(c.credit)); ()
        }
        if (c.end) done = true
      }
      finishPut(ctx)
    }

    /** END_STREAM path for worker-routed DoPut — same hand-off as
      * finish(), but reading the put state this worker thread owns. */
    private def finishPut(ctx: ChannelHandlerContext): Unit = {
      if (dispatched) return
      dispatched = true
      val ok = authorized
      val frames = putFramesRev.reverse
      val spilled =
        if (spillDir != null) {
          closeSpill()
          Some((putDescriptor, spillDir, putSchemaDdl))
        } else None
      val err = putParseError
      srv.dispatchPool.execute(() =>
        respond(ctx, "DoPut", ok, Array.emptyByteArray, frames, spilled, err))
    }

    /** Drain complete gRPC messages from `body` (DoPut only): decode
      * each FlightData immediately; the accumulator's read cursor
      * advances past consumed messages with no tail re-copy. */
    private def drainPut(): Unit = {
      try {
        var more = true
        while (more) {
          more = false
          if (body.size >= 5) {
            val flag = body.peek(0)
            if (flag != 0)
              throw new GrpcException(Status.Unimplemented,
                "compressed gRPC messages not supported (identity only)")
            val len = (body.peek(1) << 24) | (body.peek(2) << 16) |
              (body.peek(3) << 8) | body.peek(4)
            if (len < 0)
              throw new GrpcException(Status.Internal,
                s"bad gRPC frame length $len")
            if (body.size >= 5 + len) {
              body.skip(5)
              onPutMessage(body.take(len))
              more = true
            }
          }
        }
      } catch {
        case e: GrpcException => putParseError = e
        case NonFatal(e) =>
          putParseError = new GrpcException(Status.Internal,
            s"put stream decode failed: ${e.getMessage}")
      }
    }

    private def spillEligible: Boolean = putDescriptor.exists(d =>
      d.dtype == FlightProto.DescriptorType.Path)

    private def onPutMessage(payload: Array[Byte]): Unit = {
      val fd = FlightProto.FlightData.decode(payload)
      if (putDescriptor.isEmpty) putDescriptor = fd.descriptor
      if (spillOut == null) {
        putFramesRev ::= fd
        putBytes += payload.length
        if (putBytes > SpillThreshold && spillEligible) {
          spillDir = java.nio.file.Files
            .createTempDirectory("graft_put_spill_").toFile
          val buffered = putFramesRev.reverse
          putFramesRev = Nil
          buffered.foreach(writeSpill)
        }
      } else writeSpill(fd)
    }

    /** One FlightData onto the spill: a Schema header rolls to the next
      * `.arrows` file (one file per logical partition stream). */
    private var spillSchemaMsg: FlightProto.IpcMessage = null
    private var spillFileBytes = 0L

    private def writeSpill(fd: FlightProto.FlightData): Unit = {
      if (fd.dataHeader.isEmpty) return // descriptor-/metadata-only frame
      val msg = FlightProto.IpcMessage(fd.dataHeader, fd.dataBody)
      if (FlightProto.isSchemaMessage(msg)) {
        if (putSchemaDdl == null) {
          putSchemaDdl =
            FlightService.sparkSchemaOfStream(Seq(msg)).toDDL
          spillSchemaMsg = msg
        }
        rollSpillFile()
      } else if (spillOut == null)
        throw new GrpcException(Status.InvalidArgument,
          "put stream does not start with a Schema message")
      else if (spillFileBytes > SpillRollBytes) {
        // roll at a batch boundary so a single-stream upload of any
        // size reads back with file-level parallelism; each file is a
        // self-contained stream, so re-head it with the schema
        rollSpillFile()
        writeSpillMsg(spillSchemaMsg)
      }
      writeSpillMsg(msg)
    }

    private def writeSpillMsg(msg: FlightProto.IpcMessage): Unit = {
      val hdr = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      hdr.putInt(-1); hdr.putInt(msg.metadata.length)
      spillOut.write(hdr.array())
      spillOut.write(msg.metadata)
      spillOut.write(msg.body)
      spillFileBytes += 8L + msg.metadata.length + msg.body.length
    }

    private val SpillEos: Array[Byte] =
      Array(-1, -1, -1, -1, 0, 0, 0, 0).map(_.toByte)

    private def rollSpillFile(): Unit = {
      if (spillOut != null) { spillOut.write(SpillEos); spillOut.close() }
      val f = new java.io.File(spillDir, f"part-$spillFileIdx%05d.arrows")
      spillFileIdx += 1
      spillFileBytes = 0L
      spillOut = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(f), 1 << 16)
    }

    private def closeSpill(): Unit = {
      if (spillOut != null) { spillOut.write(SpillEos); spillOut.close() }
      spillOut = null
    }

    override def exceptionCaught(ctx: ChannelHandlerContext,
                                 cause: Throwable): Unit = {
      ctx.close(); ()
    }

    // ---- outbound backpressure: the dispatch thread must not outrun the
    // client's HTTP/2 flow-control window. The stream channel turns
    // unwritable when its window (or the parent's buffer) fills; the
    // producer loop then parks HERE until the event loop signals
    // writability back — so a slow DoGet consumer holds at most one
    // in-flight message on the heap, never the dataset.
    private val writeGate = new Object
    override def channelWritabilityChanged(ctx: ChannelHandlerContext): Unit = {
      writeGate.synchronized { writeGate.notifyAll() }
      ctx.fireChannelWritabilityChanged(); ()
    }
    override def channelInactive(ctx: ChannelHandlerContext): Unit = {
      writeGate.synchronized { writeGate.notifyAll() }
      // an upload that died before END_STREAM never reaches finishPut():
      // signal the ingest worker (which owns the spill state) to reclaim
      // the files — a poison chunk wakes it if it is parked on take().
      // After finishPut(), respond() owns the cleanup-or-transfer
      // decision and the worker has already exited.
      if (putQueue != null && !dispatched) {
        putAborted = true
        putQueue.put(new PutChunk(null, 0, end = false))
      }
      ctx.fireChannelInactive(); ()
    }
    private def awaitWritable(ctx: ChannelHandlerContext): Unit = {
      val ch = ctx.channel()
      writeGate.synchronized {
        while (!ch.isWritable && ch.isActive) writeGate.wait(100)
      }
      // a closed stream (client cancel / disconnect) aborts the
      // producer loop instead of burning Spark work into a void —
      // the reference's disconnect hook (Producer.java:133-136)
      if (!ch.isActive) throw new ClientGoneException
    }

    /** Spark work (ingest, query, egress) runs on the dispatch pool — a
      * long DoGet must never stall the event loop that carries OTHER
      * streams' frames. Netty writes are thread-safe (scheduled onto the
      * loop). */
    // set by the event loop (finish) or the put worker (finishPut), read
    // by both plus channelInactive — volatile
    @volatile private var dispatched = false
    private def finish(ctx: ChannelHandlerContext): Unit = {
      if (dispatched) return // eager-Handshake path already answered
      dispatched = true
      val bytes = body.toByteArray
      val m = method
      val ok = authorized
      val frames = putFramesRev.reverse
      val spilled =
        if (spillDir != null) {
          closeSpill()
          Some((putDescriptor, spillDir, putSchemaDdl))
        } else None
      val err = putParseError
      srv.dispatchPool.execute(() =>
        respond(ctx, m, ok, bytes, frames, spilled, err))
    }

    private def respond(ctx: ChannelHandlerContext, method: String,
                        ok: Boolean, bytes: Array[Byte],
                        putFrames: Seq[FlightProto.FlightData],
                        spilled: Option[(Option[FlightProto.FlightDescriptor],
                          java.io.File, String)],
                        putError: GrpcException): Unit = {
      var headersSent = false
      def writeMsg(payload: Array[Byte]): Unit = {
        if (!headersSent) {
          val h = new DefaultHttp2Headers().status("200")
          h.set("content-type", "application/grpc+proto")
          // a successful Handshake hands the bearer back in response
          // metadata — the upstream AuthenticateBasicToken contract
          if (method == "Handshake")
            h.set("authorization", s"Bearer $token")
          ctx.write(new DefaultHttp2HeadersFrame(h))
          headersSent = true
        }
        awaitWritable(ctx)
        ctx.writeAndFlush(new DefaultHttp2DataFrame(grpcFrame(ctx, payload)))
        ()
      }
      def finishRpc(status: Int, message: String): Unit = {
        val t = new DefaultHttp2Headers()
        if (!headersSent) { // trailers-only response (gRPC error shape)
          t.status("200")
          t.set("content-type", "application/grpc+proto")
        }
        if (method == "Handshake" && status == Status.Ok)
          t.set("authorization", s"Bearer $token")
        t.set("grpc-status", status.toString)
        if (message.nonEmpty)
          t.set("grpc-message",
            message.replaceAll("[^\\x20-\\x7e]", "?").take(400))
        ctx.writeAndFlush(new DefaultHttp2HeadersFrame(t, true))
        ()
      }
      // dropped on any failure UNLESS ingest transferred ownership
      var spillPending = spilled
      try {
        if (putError != null) throw putError
        // DoPut bodies were consumed incrementally — bytes holds only
        // an (empty) tail for them
        val reqs =
          if (method == "DoPut") Seq.empty else parseGrpcMessages(bytes)
        if (!ok && method != "Handshake")
          throw new GrpcException(Status.Unauthenticated, "unauthenticated")
        spilled match {
          case Some((Some(desc), dir, ddl)) =>
            if (ddl == null)
              throw new GrpcException(Status.InvalidArgument,
                "put stream carried no Schema message")
            val n = srv.service.ingestSpilledPut(desc, dir, ddl)
            spillPending = None // the service owns the files now
            writeMsg(FlightProto.PutResult.of(n.toString).encode)
          case Some((None, _, _)) =>
            throw new GrpcException(Status.InvalidArgument,
              "first FlightData must carry a descriptor")
          case None =>
            dispatch(method, reqs, ok, putFrames, writeMsg)
        }
        finishRpc(Status.Ok, "")
      } catch {
        case _: ClientGoneException =>
          // the socket is gone: count the abort, send nothing
          srv.abortedResponses.incrementAndGet()
          dropSpill(spillPending)
        case e: GrpcException =>
          dropSpill(spillPending)
          finishRpc(e.code, e.getMessage)
        case e: NoSuchElementException =>
          dropSpill(spillPending)
          finishRpc(Status.NotFound, String.valueOf(e.getMessage))
        case e: UnsupportedOperationException =>
          dropSpill(spillPending)
          finishRpc(Status.Unimplemented, String.valueOf(e.getMessage))
        case e: IllegalArgumentException =>
          dropSpill(spillPending)
          finishRpc(Status.InvalidArgument, String.valueOf(e.getMessage))
        case NonFatal(e) =>
          // e.toString when there is no message: "null" diagnoses nothing
          dropSpill(spillPending)
          finishRpc(Status.Unknown,
            if (e.getMessage == null) e.toString else e.getMessage)
      }
    }

    /** Delete an un-ingested spill directory (an RPC that failed before
      * FlightService took ownership of the files). */
    private def dropSpill(
        pending: Option[(Option[FlightProto.FlightDescriptor],
          java.io.File, String)]): Unit = pending.foreach { case (_, dir, _) =>
      Option(dir.listFiles).foreach(_.foreach(_.delete()))
      dir.delete()
      ()
    }

    private def dispatch(method: String, reqs: Seq[Array[Byte]],
                         headerAuthorized: Boolean,
                         putFrames: Seq[FlightProto.FlightData],
                         write: Array[Byte] => Unit): Unit = {
      val service = srv.service
      // Flight location scheme per the upstream convention: grpc+tcp for
      // cleartext h2c, grpc+tls once the endpoint serves TLS
      def location =
        s"grpc+${if (srv.secure) "tls" else "tcp"}://127.0.0.1:${srv.port}"
      method match {
        case "Handshake" =>
          // the reference's auth exchange (HorribleBasicAuthValidator):
          // payload carries the shared secret; success hands back the
          // bearer the client then sends as `authorization`. An upstream
          // AuthenticateBasicToken client instead sends NO payload
          // messages — its Basic header is the credential and the bearer
          // rides back in the response metadata (set in respond()), so
          // an empty-bodied, header-authorized Handshake succeeds
          // trailers-only.
          reqs.headOption match {
            case Some(req) =>
              val hs = FlightProto.Handshake.decode(req)
              val payloadOk = java.security.MessageDigest.isEqual(
                hs.payload, token.getBytes(UTF_8))
              if (!payloadOk && !(hs.payload.isEmpty && headerAuthorized))
                throw new GrpcException(Status.Unauthenticated,
                  "invalid handshake secret")
              write(FlightProto.Handshake.of(token).encode)
            case None =>
              if (!headerAuthorized)
                throw new GrpcException(Status.Unauthenticated,
                  "handshake carried no credential")
              // no response message: the client half-closed without
              // writing and reads only the metadata, not the body
          }
        case "ListFlights" =>
          // Criteria ignored like the reference's listFlights
          service.list().foreach { case (n, df) =>
            write(service.flightInfoOf(n, df, location).encode)
          }
        case "GetFlightInfo" =>
          val desc = FlightProto.FlightDescriptor.decode(
            reqs.headOption.getOrElse(throw new GrpcException(
              Status.InvalidArgument, "missing FlightDescriptor")))
          desc.dtype match {
            case FlightProto.DescriptorType.Path =>
              // one endpoint PER PARTITION (ticket `name#i`) — Flight's
              // parallel-consumer contract; staging happens HERE, on a
              // driver-side dispatch thread, so DoGet never nests a
              // Spark job under a reader fleet holding the task slots
              val name = desc.path.headOption.getOrElse(
                throw new GrpcException(Status.InvalidArgument, "empty path"))
              write(service.partitionedFlightInfo(name,
                service.require(name), location).encode)
            case FlightProto.DescriptorType.Cmd =>
              // descriptor-as-command (Producer.java:411-437): the cmd is
              // a wire-codec CypherMessage; the answer is a FlightInfo
              // whose endpoint tickets cover the new result flight
              val ticket = service.doAction(FlightProto.Action(
                "cypher.read", desc.cmd)).asString
              write(service.partitionedFlightInfo(ticket,
                service.require(ticket), location).encode)
            case t => throw new GrpcException(Status.InvalidArgument,
              s"unsupported descriptor type $t")
          }
        case "GetSchema" =>
          val desc = FlightProto.FlightDescriptor.decode(
            reqs.headOption.getOrElse(throw new GrpcException(
              Status.InvalidArgument, "missing FlightDescriptor")))
          val name = desc.path.headOption.getOrElse(
            throw new GrpcException(Status.InvalidArgument, "empty path"))
          write(FlightProto.SchemaResult(
            service.arrowSchemaBytes(service.require(name))).encode)
        case "DoGet" =>
          val ticket = new String(FlightProto.Ticket.decode(
            reqs.headOption.getOrElse(throw new GrpcException(
              Status.InvalidArgument, "missing Ticket"))).ticket, UTF_8)
          service.partitionTicketMessages(ticket) match {
            case Some((msgs, closer)) =>
              // a staged `name#i` partition STREAMED from its file: one
              // message on the heap per write, no Spark job
              try msgs.foreach { m =>
                write(FlightProto.FlightData(None, m.metadata,
                  Array.emptyByteArray, m.body).encode)
              } finally closer()
            case None =>
              val df = service.require(ticket)
              flightDataMessages(df).foreach { m =>
                write(FlightProto.FlightData(None, m.metadata,
                  Array.emptyByteArray, m.body).encode)
              }
          }
        case "DoPut" =>
          val frames = putFrames // decoded incrementally by drainPut()
          val desc = frames.headOption.flatMap(_.descriptor).getOrElse(
            throw new GrpcException(Status.InvalidArgument,
              "first FlightData must carry a descriptor"))
          desc.dtype match {
            case FlightProto.DescriptorType.Path =>
              // skip headerless frames (descriptor- or metadata-only)
              val msgs = frames.collect {
                case fd if fd.dataHeader.nonEmpty =>
                  FlightProto.IpcMessage(fd.dataHeader, fd.dataBody)
              }
              desc.path match {
                // path ["append", name]: one immutable batch onto the
                // flight's APPEND LOG (the readStream ingest surface)
                case Seq("append", name) =>
                  write(FlightProto.PutResult.of(
                    service.appendFlightData(name, msgs).toString).encode)
                case Seq(name) =>
                  write(FlightProto.PutResult.of(
                    service.ingestFlightData(name, msgs).toString).encode)
                case other => throw new GrpcException(
                  Status.InvalidArgument, s"bad put path: $other")
              }
            case FlightProto.DescriptorType.Cmd =>
              // gds.write.nodes / gds.write.relationships: CMD carries
              // the serialized write message (GdsActionHandler.java:76-150)
              write(FlightProto.PutResult.of(
                service.putGraphPart(frames).toString).encode)
            case t => throw new GrpcException(Status.InvalidArgument,
              s"unsupported descriptor type $t")
          }
        case "DoExchange" =>
          val frames = reqs.map(FlightProto.FlightData.decode)
          val result = service.exchange(frames)
          flightDataMessages(result).foreach { m =>
            write(FlightProto.FlightData(None, m.metadata,
              Array.emptyByteArray, m.body).encode)
          }
        case "DoAction" =>
          val action = FlightProto.Action.decode(reqs.headOption.getOrElse(
            throw new GrpcException(Status.InvalidArgument,
              "missing Action")))
          val res = service.doAction(action)
          // ticket-producing actions answer with a serialized Ticket
          // PROTOBUF in Result.body — the reference contract its client
          // depends on (neo4j_arrow.py:157-168 `_submit` runs
          // Ticket.deserialize on the body). The framed-TCP transport
          // keeps its raw-string contract; this wrapping is the gRPC
          // wire's fidelity layer.
          if (TicketActions(action.atype.toLowerCase))
            write(FlightProto.ActionResult(
              FlightProto.Ticket(res.body).encode).encode)
          else write(res.encode)
        case "ListActions" =>
          service.actionTypes.foreach(a => write(a.encode))
        case other =>
          throw new GrpcException(Status.Unimplemented,
            s"unimplemented method: $other")
      }
    }
  }

  // ------------------------------------------------------------- client
  final case class RpcResult(messages: Seq[Array[Byte]], status: Int,
                             statusMessage: String)

  /** Blocking Flight client over the same Netty HTTP/2 codec — one
    * connection, one HTTP/2 stream per RPC (so calls multiplex the way
    * grpc-java's do). */
  final class Client(host: String, port: Int, token: String,
                     tls: Option[Tls.ClientTls] = None) {
    private val group =
      new MultiThreadIoEventLoopGroup(1, NioIoHandler.newFactory())
    // with TLS the H2 handlers install asynchronously after ALPN; RPCs
    // must not open stream channels before the codec is in the pipeline
    private val h2Ready = new CompletableFuture[Unit]()
    private val ch: Channel = {
      val sslCtx = tls.map(Tls.clientContext)
      def installH2(p: io.netty.channel.ChannelPipeline): Unit = {
        p.addLast(Http2FrameCodecBuilder.forClient().build())
        // inbound (server-initiated) streams are not a gRPC thing;
        // the multiplex handler still needs a child handler
        p.addLast(new Http2MultiplexHandler(
          new ChannelInboundHandlerAdapter()))
        h2Ready.complete(()); ()
      }
      val b = new Bootstrap()
        .group(group)
        .channel(classOf[NioSocketChannel])
        .handler(new ChannelInitializer[SocketChannel] {
          override def initChannel(c: SocketChannel): Unit = sslCtx match {
            case None => installH2(c.pipeline())
            case Some(ssl) =>
              c.pipeline().addLast(ssl.newHandler(c.alloc(), host, port))
              c.pipeline().addLast(new ApplicationProtocolNegotiationHandler(
                  ApplicationProtocolNames.HTTP_2) {
                override def configurePipeline(ctx: ChannelHandlerContext,
                                               protocol: String): Unit = {
                  if (protocol != ApplicationProtocolNames.HTTP_2) {
                    h2Ready.completeExceptionally(new IllegalStateException(
                      s"ALPN negotiated '$protocol', need h2")); ()
                  } else installH2(ctx.pipeline())
                }
                override def handshakeFailure(ctx: ChannelHandlerContext,
                                              cause: Throwable): Unit = {
                  h2Ready.completeExceptionally(cause)
                  ctx.close(); ()
                }
              })
              ()
          }
        })
      val c = b.connect(host, port).sync().channel()
      h2Ready.get(30, TimeUnit.SECONDS) // TLS handshake + ALPN barrier
      c
    }

    /** The ALPN-negotiated application protocol ("h2") — None on
      * cleartext connections. Exposed for specs/diagnostics. */
    def negotiatedProtocol: Option[String] =
      Option(ch.pipeline().get(classOf[io.netty.handler.ssl.SslHandler]))
        .map(_.applicationProtocol())

    /** One RPC with the default bearer credential. */
    def call(method: String, reqs: Seq[Array[Byte]]): RpcResult =
      callRaw(method, reqs, Some(s"Bearer $token"))

    /** One RPC with full control of the `authorization` header value
      * (None = send no credential — the unauthenticated path). */
    def callRaw(method: String, reqs: Seq[Array[Byte]],
                authHeader: Option[String]): RpcResult = {
      val done = new CompletableFuture[RpcResult]()
      val sc: Http2StreamChannel = new Http2StreamChannelBootstrap(ch)
        .handler(new ClientStreamHandler(done))
        .open().sync().getNow
      val headers = new DefaultHttp2Headers()
        .method("POST").scheme(if (tls.isDefined) "https" else "http")
        .authority(s"$host:$port")
        .path(ServicePath + method)
      headers.set("content-type", "application/grpc+proto")
      headers.set("te", "trailers")
      authHeader.foreach(v => headers.set("authorization", v))
      sc.write(new DefaultHttp2HeadersFrame(headers, reqs.isEmpty))
      reqs.zipWithIndex.foreach { case (m, i) =>
        val buf = sc.alloc().buffer(5 + m.length)
        buf.writeByte(0); buf.writeInt(m.length); buf.writeBytes(m)
        sc.write(new DefaultHttp2DataFrame(buf, i == reqs.size - 1))
      }
      sc.flush()
      done.get(180, TimeUnit.SECONDS)
    }

    /** call() that fails loudly on a non-OK grpc-status. */
    def callOk(method: String,
               reqs: Seq[Array[Byte]]): Seq[Array[Byte]] = {
      val r = call(method, reqs)
      if (r.status != 0)
        throw new GrpcException(r.status,
          s"$method failed: grpc-status ${r.status} ${r.statusMessage}")
      r.messages
    }

    /** One RPC whose request messages stream from an iterator, each
      * write SYNCED through the event loop before the next is pulled —
      * the upload never materializes client-side and a full HTTP/2
      * window backpressures the producer instead of growing the
      * outbound buffer. Requires a non-empty iterator. */
    def callStreamingOk(method: String,
                        reqs: Iterator[Array[Byte]]): Seq[Array[Byte]] = {
      val done = new CompletableFuture[RpcResult]()
      val sc: Http2StreamChannel = new Http2StreamChannelBootstrap(ch)
        .handler(new ClientStreamHandler(done))
        .open().sync().getNow
      val headers = new DefaultHttp2Headers()
        .method("POST").scheme(if (tls.isDefined) "https" else "http")
        .authority(s"$host:$port")
        .path(ServicePath + method)
      headers.set("content-type", "application/grpc+proto")
      headers.set("te", "trailers")
      headers.set("authorization", s"Bearer $token")
      var sentBytes = 0L
      if (!reqs.hasNext) {
        // empty upload (e.g. a put of an empty DataFrame): half-close on
        // the headers and let the server answer — never reqs.next() here
        sc.writeAndFlush(new DefaultHttp2HeadersFrame(headers, true)).sync()
      } else {
        sc.write(new DefaultHttp2HeadersFrame(headers, false))
        var cur = reqs.next()
        var more = true
        while (more) {
          more = reqs.hasNext
          val buf = sc.alloc().buffer(5 + cur.length)
          buf.writeByte(0); buf.writeInt(cur.length); buf.writeBytes(cur)
          sentBytes += 5L + cur.length
          // sync(): completes only once the frame clears the flow-control
          // window — one in-flight message, backpressure for free
          sc.writeAndFlush(new DefaultHttp2DataFrame(buf, !more)).sync()
          if (more) cur = reqs.next()
        }
      }
      // The server validates a spilled put with a full decode before it
      // acks, so the wait after the last frame scales with what was
      // uploaded: a fixed cap would fail the client on exactly the
      // multi-GB uploads the spill path exists for while the server-side
      // ingest succeeds. Floor 180 s + 1 s per MiB, env-overridable.
      val ackTimeoutSec = sys.env.get("GRAFT_FLIGHT_ACK_TIMEOUT_SEC")
        .map(v => scala.util.Try(v.trim.toLong).getOrElse(
          throw new IllegalArgumentException(
            s"GRAFT_FLIGHT_ACK_TIMEOUT_SEC must be a long, got '$v'")))
        .getOrElse(180L + (sentBytes >> 20))
      val r = done.get(ackTimeoutSec, TimeUnit.SECONDS)
      if (r.status != 0)
        throw new GrpcException(r.status,
          s"$method failed: grpc-status ${r.status} ${r.statusMessage}")
      r.messages
    }

    /** Flight auth handshake; true iff the server accepted the secret. */
    def handshake(secret: String): Boolean =
      callRaw("Handshake", Seq(FlightProto.Handshake.of(secret).encode),
        authHeader = None).status == 0

    def listFlights(): Seq[FlightProto.FlightInfo] =
      callOk("ListFlights", Seq(FlightProto.Criteria.all.encode))
        .map(FlightProto.FlightInfo.decode)

    def getFlightInfo(name: String): FlightProto.FlightInfo =
      FlightProto.FlightInfo.decode(callOk("GetFlightInfo",
        Seq(FlightProto.FlightDescriptor.path(name).encode)).head)

    /** getFlightInfo by CMD descriptor: the command is a wire-codec
      * CypherMessage; returns the result flight's info. */
    def getFlightInfoCmd(
        msg: ActionMessages.CypherMessage): FlightProto.FlightInfo =
      FlightProto.FlightInfo.decode(callOk("GetFlightInfo",
        Seq(FlightProto.FlightDescriptor(
          FlightProto.DescriptorType.Cmd, msg.serialize, Nil).encode)).head)

    /** IPC-encapsulated Arrow Schema bytes for a flight. */
    def getSchema(name: String): Array[Byte] =
      FlightProto.SchemaResult.decode(callOk("GetSchema",
        Seq(FlightProto.FlightDescriptor.path(name).encode)).head).schema

    /** DoGet straight into a DataFrame: FlightData messages → schema from
      * the wire's leading Schema message → Arrow ingest. */
    def doGet(spark: SparkSession, ticket: String): DataFrame = {
      val msgs = callOk("DoGet", Seq(FlightProto.Ticket.of(ticket).encode))
        .map(FlightProto.FlightData.decode)
        .map(fd => FlightProto.IpcMessage(fd.dataHeader, fd.dataBody))
      val schema = FlightService.sparkSchemaOfStream(msgs)
      import spark.implicits._
      ArrowIpc.fromIpcStreams(
        spark.createDataset(FlightProto.groupStreams(msgs)), schema)
    }

    /** Read a whole flight the way a faithful Flight consumer does:
      * fetch EVERY endpoint in the FlightInfo and union them (endpoints
      * are partitions; the set, not any single ticket, is the table). */
    def readFlight(spark: SparkSession,
                   info: FlightProto.FlightInfo): DataFrame =
      info.endpoints.map(ep =>
          doGet(spark, new String(ep.ticket.ticket, UTF_8)))
        .reduceLeft(_.unionAll(_))

    /** DoPut a DataFrame as flight `name`; returns the server-side row
      * count (acked through PutResult.app_metadata). */
    def doPut(name: String, df: DataFrame): Long = {
      val desc = FlightProto.FlightDescriptor.path(name)
      putFrames(desc, df)
    }

    /** DoPut one immutable batch onto flight `name`'s APPEND LOG
      * (descriptor path ["append", name]) — the producer half of the
      * [[FlightStreamSource]] readStream surface. */
    def doPutAppend(name: String, df: DataFrame): Long =
      // singleStream = false: the append log is a graft extension whose
      // contract stages one file PER PRODUCER PARTITION (the streaming
      // reader plans one task per file), so partition streams keep
      // their Schema delimiters — only plain DoPut, which upstream
      // servers also serve, uses the spec's single-stream shape
      putFrames(FlightProto.FlightDescriptor(
        FlightProto.DescriptorType.Path, Array.emptyByteArray,
        Seq("append", name)), df, singleStream = false)

    /** gds.write.nodes / gds.write.relationships over DoPut: the CMD
      * descriptor carries the serialized write message. */
    def doPutGraphPart(cmd: Array[Byte], df: DataFrame): Long =
      putFrames(FlightProto.FlightDescriptor(
        FlightProto.DescriptorType.Cmd, cmd, Nil), df)

    private def putFrames(desc: FlightProto.FlightDescriptor,
                          df: DataFrame,
                          singleStream: Boolean = true): Long = {
      // one partition's IPC stream in memory at a time, streamed out
      // message-by-message — the client-side mirror of the server's
      // spill ingest (never the whole upload as a frame list). A DoPut
      // is ONE logical Arrow stream per the Flight spec, so partition
      // streams after the first drop their redundant Schema headers
      // (an upstream server rejects a mid-stream Schema; ours groups
      // streams at Schema boundaries and handles both shapes).
      val blobs = ArrowIpc.toIpcStreams(df).toLocalIterator()
      var first = true
      var sentSchema = false
      val frames: Iterator[Array[Byte]] = new Iterator[Array[Byte]] {
        private var queue: List[Array[Byte]] = Nil
        private def refill(): Unit =
          while (queue.isEmpty && blobs.hasNext) {
            queue = FlightProto.splitIpcStream(blobs.next()).flatMap { m =>
              if (singleStream && FlightProto.isSchemaMessage(m) &&
                  sentSchema) None
              else {
                if (FlightProto.isSchemaMessage(m)) sentSchema = true
                val fd = FlightProto.FlightData(
                  if (first) Some(desc) else None,
                  m.metadata, Array.emptyByteArray, m.body).encode
                first = false
                Some(fd)
              }
            }.toList
          }
        def hasNext: Boolean = { refill(); queue.nonEmpty }
        def next(): Array[Byte] = {
          refill()
          val h = queue.head; queue = queue.tail; h
        }
      }
      FlightProto.PutResult.decode(
        callStreamingOk("DoPut", frames).head).asString.toLong
    }

    /** DoExchange: stream `df` up under a CMD CypherMessage descriptor
      * (the query sees the rows as view `input`), get the result streamed
      * back in the same RPC. */
    def doExchange(spark: SparkSession, msg: ActionMessages.CypherMessage,
                   df: DataFrame): DataFrame = {
      val desc = FlightProto.FlightDescriptor(
        FlightProto.DescriptorType.Cmd, msg.serialize, Nil)
      val frames = Seq.newBuilder[Array[Byte]]
      var first = true
      var sentSchema = false
      ArrowIpc.toIpcStreams(df).toLocalIterator().forEachRemaining { blob =>
        FlightProto.splitIpcStream(blob).foreach { m =>
          if (!(FlightProto.isSchemaMessage(m) && sentSchema)) {
            if (FlightProto.isSchemaMessage(m)) sentSchema = true
            frames += FlightProto.FlightData(
              if (first) Some(desc) else None,
              m.metadata, Array.emptyByteArray, m.body).encode
            first = false
          }
        }
      }
      val msgs = callOk("DoExchange", frames.result())
        .map(FlightProto.FlightData.decode)
        .map(fd => FlightProto.IpcMessage(fd.dataHeader, fd.dataBody))
      val schema = FlightService.sparkSchemaOfStream(msgs)
      import spark.implicits._
      ArrowIpc.fromIpcStreams(
        spark.createDataset(FlightProto.groupStreams(msgs)), schema)
    }

    def doAction(atype: String, body: Array[Byte]): FlightProto.ActionResult =
      FlightProto.ActionResult.decode(callOk("DoAction",
        Seq(FlightProto.Action(atype, body).encode)).head)

    def doAction(atype: String, body: String): FlightProto.ActionResult =
      doAction(atype, body.getBytes(UTF_8))

    /** doAction for a ticket-producing job — the gRPC Result.body is a
      * serialized Ticket protobuf (the reference client's `_submit`
      * contract); returns the ticket string. */
    def submitJob(atype: String, body: Array[Byte]): String =
      FlightProto.Ticket.decode(doAction(atype, body).body).asString

    /** job.status the way the reference client polls it: the action
      * body is the SERIALIZED Ticket protobuf (neo4j_arrow.py:287-294),
      * not the raw string. */
    def jobStatus(ticket: String): String =
      doAction("job.status", FlightProto.Ticket.of(ticket).encode).asString

    def listActions(): Seq[FlightProto.ActionType] =
      callOk("ListActions", Seq(Array.emptyByteArray))
        .map(FlightProto.ActionType.decode)

    def close(): Unit = {
      ch.close().sync()
      group.shutdownGracefully(0, 200, TimeUnit.MILLISECONDS)
      ()
    }
  }

  /** Accumulates one RPC's response; completes when the trailers arrive
    * (grpc-status), including trailers-only error responses. */
  private final class ClientStreamHandler(done: CompletableFuture[RpcResult])
      extends ChannelInboundHandlerAdapter {
    private val body = new ByteArrayOutputStream()
    private var status = -1
    private var statusMessage = ""

    override def channelRead(ctx: ChannelHandlerContext,
                             msg: AnyRef): Unit = msg match {
      case h: Http2HeadersFrame =>
        Option(h.headers().get("grpc-status"))
          .foreach(s => status = s.toString.toInt)
        Option(h.headers().get("grpc-message"))
          .foreach(m => statusMessage = m.toString)
        if (h.isEndStream) complete()
      case d: Http2DataFrame =>
        val n = d.content().readableBytes()
        if (n > 0) {
          val tmp = new Array[Byte](n)
          d.content().readBytes(tmp)
          body.write(tmp)
        }
        val fc = d.initialFlowControlledBytes()
        val end = d.isEndStream
        d.release()
        if (fc > 0) { ctx.writeAndFlush(new DefaultHttp2WindowUpdateFrame(fc)); () }
        if (end) complete()
      case other =>
        io.netty.util.ReferenceCountUtil.release(other)
        ()
    }

    override def channelInactive(ctx: ChannelHandlerContext): Unit =
      if (!done.isDone) {
        done.completeExceptionally(
          new java.io.IOException("stream closed before trailers")); ()
      }

    override def exceptionCaught(ctx: ChannelHandlerContext,
                                 cause: Throwable): Unit = {
      done.completeExceptionally(cause)
      ctx.close(); ()
    }

    private def complete(): Unit = {
      val msgs =
        try parseGrpcMessages(body.toByteArray)
        catch { case NonFatal(e) => done.completeExceptionally(e); return }
      done.complete(RpcResult(msgs, status, statusMessage))
      ()
    }
  }
}
