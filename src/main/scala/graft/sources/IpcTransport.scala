package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The reference's Flight RPC surface re-expressed as a DEPENDENCY-FREE
  * framed-TCP transport (reference: Producer.java:86-510 — listFlights,
  * getFlightInfo, getStream, acceptPut; App.java wires it over
  * arrow-flight/gRPC). This environment ships no arrow-flight or grpc
  * jars and has no egress to fetch them (pre-declared every round), so
  * the gRPC WIRE format is out of reach — but the transport SEMANTICS
  * are not: the verbs, the ticketed-job lifecycle, the token auth gate,
  * and the Arrow IPC stream payloads (the same framing [[ArrowIpc]]
  * already produces and consumes, gated by `arrow_roundtrip`) carry over
  * verbatim onto a length-prefixed socket protocol.
  *
  * Frame = int32 big-endian length + payload. Control frames are UTF-8
  * JSON-ish single lines (key\tvalue pairs — no JSON library in scope,
  * and the vocabulary is 6 fixed verbs); data frames are raw Arrow IPC
  * stream bytes, one frame per partition stream, ended by a zero-length
  * frame. First frame on every connection is the auth token
  * (reference: HorizonBasicAuthValidator — a shared-secret check;
  * C5 in SURVEY.md §2.6).
  *
  * Verbs:
  *  - `LIST`                  → registered table names (one frame)
  *  - `INFO <name>`           → schema DDL + partition count
  *  - `GET <name>`            → data frames (one per partition), zero frame
  *  - `PUT <name> <ddl>`      → client streams data frames; server ingests
  *                              via [[ArrowIpc.fromIpcStreams]] and registers
  *  - `SUBMIT <name>`         → run the named table as a ticketed job
  *                              (graft.operators.Jobs); returns the ticket
  *  - `STATUS <ticket>`       → the Status as rendered by Scala
  *                              (`Pending`/`Producing`/`Complete`/
  *                              `Cancelled`/`Error(…)`); the gRPC
  *                              job.status action uppercases, this
  *                              framed verb does NOT
  *  - `CANCEL <ticket>`       → CANCELLED (this call stopped it) or
  *                              ALREADY_DONE (job reached a terminal
  *                              state first) — Job.cancel(true) analog
  *
  * Scale posture: GET streams partitions through `toLocalIterator` —
  * one partition's IPC blob in driver memory at a time, never the whole
  * dataset (the reference buffers per-partition flushers the same way,
  * Producer.java:202-330). PUT holds the received blobs on the driver
  * before parallelizing — the put-stream gate's DSv2 source
  * ([[ArrowIpcSource]]) is the executor-side path for bulk ingest; this
  * verb is the control-plane twin. */
object IpcTransport {

  private def writeFrame(out: DataOutputStream, bytes: Array[Byte]): Unit = {
    out.writeInt(bytes.length)
    out.write(bytes)
    out.flush()
  }
  private def writeStr(out: DataOutputStream, s: String): Unit =
    writeFrame(out, s.getBytes(UTF_8))
  private def readFrame(in: DataInputStream): Array[Byte] = {
    val n = in.readInt()
    require(n >= 0 && n <= (1 << 30), s"bad frame length $n")
    val buf = new Array[Byte](n)
    in.readFully(buf)
    buf
  }
  private def readStr(in: DataInputStream): String =
    new String(readFrame(in), UTF_8)

  /** Regroup a flat FlightData-message sequence into self-contained
    * per-partition IPC streams: each Schema header starts a new stream
    * (Flight's stream framing — the schema message leads every stream). */
  private def groupStreams(msgs: Seq[FlightProto.IpcMessage])
      : Seq[Array[Byte]] = FlightProto.groupStreams(msgs)

  final class Server(spark: SparkSession, token: String) {
    /** The verb implementation, factored into [[FlightService]] so the
      * SAME service instance (one catalog, one job registry) can front
      * both this framed-TCP protocol and the gRPC/HTTP/2 session layer
      * ([[FlightGrpc.Server]]) — the reference's own layering: verbs once
      * (Producer.java:86-510), transport bindings around them. */
    val service = new FlightService(spark)
    private val sock = new ServerSocket(0)
    @volatile private var closed = false

    def port: Int = sock.getLocalPort

    def register(name: String, df: DataFrame): Unit =
      service.register(name, df)

    /** Register a graph for `gds.read` requests (the reference resolves
      * GdsMessage.graph against its graph catalog,
      * GdsActionHandler.java:69-76). */
    def registerGraph(name: String, nodes: DataFrame,
                      rels: DataFrame): Unit =
      service.registerGraph(name, nodes, rels)

    def start(): this.type = {
      val t = new Thread(() => acceptLoop(), "graft-ipc-accept")
      t.setDaemon(true)
      t.start()
      this
    }

    private def acceptLoop(): Unit =
      while (!closed) {
        try {
          val s = sock.accept()
          val h = new Thread(() => handle(s), "graft-ipc-conn")
          h.setDaemon(true)
          h.start()
        } catch {
          case _: Throwable =>
            // closed mid-accept is the normal shutdown path; any OTHER
            // persistent accept() failure (fd exhaustion, interface gone)
            // must not become a tight busy-loop on the daemon thread —
            // exit if the socket is dead, otherwise back off briefly.
            if (closed || sock.isClosed) return
            Thread.sleep(50)
        }
      }

    private def handle(s: Socket): Unit = {
      val in = new DataInputStream(s.getInputStream)
      val out = new DataOutputStream(s.getOutputStream)
      try {
        // auth gate: first frame must be the shared token. Constant
        // responses, connection dropped on mismatch — the reference's
        // basic-auth validator contract. MessageDigest.isEqual is the
        // constant-time compare (a String != leaks match-prefix timing).
        if (!java.security.MessageDigest.isEqual(
            readFrame(in), token.getBytes(UTF_8))) {
          writeStr(out, "ERR unauthenticated")
          return
        }
        writeStr(out, "OK")
        var live = true
        while (live) {
          val req =
            try readStr(in)
            catch { case _: Throwable => live = false; "" }
          if (live) req.split(" ", 3).toList match {
            case "LIST" :: Nil =>
              // each flight carries its schema + partition count, the way
              // the reference's listFlights resolves a FlightInfo schema
              // per ticket (Producer.java:411-437) — one record-separated
              // entry per table: name \t schema DDL \t numPartitions.
              writeStr(out, service.list().map { case (n, df) =>
                s"$n\t${df.schema.toDDL}\t${df.rdd.getNumPartitions}"
              }.mkString("\u001e"))
            case "INFO" :: name :: Nil =>
              service.table(name) match {
                case Some(df) =>
                  writeStr(out,
                    s"OK\t${df.schema.toDDL}\t${df.rdd.getNumPartitions}")
                case None => writeStr(out, s"ERR not found: $name")
              }
            case "GET" :: name :: Nil =>
              service.table(name) match {
                case Some(df) =>
                  writeStr(out, "OK")
                  val it = ArrowIpc.toIpcStreams(df).toLocalIterator()
                  while (it.hasNext) writeFrame(out, it.next())
                  writeFrame(out, Array.emptyByteArray)
                case None => writeStr(out, s"ERR not found: $name")
              }
            case "PUT" :: name :: ddl :: Nil =>
              val blobs = Iterator.continually(readFrame(in))
                .takeWhile(_.nonEmpty).toSeq
              try writeStr(out, s"OK\t${service.ingestBlobs(name, ddl, blobs)}")
              catch { case e: Throwable =>
                writeStr(out, s"ERR ${e.getMessage}")
              }
            // ---- Flight-framed twins (r9): same verbs, but every payload
            // is a wire-exact Arrow Flight protobuf message (FlightProto)
            // — what a grpc-java Flight client would exchange over the
            // HTTP/2 session layer that FlightGrpc now carries for real.
            // FINFO ≙ getFlightInfo, FGET ≙ getStream (FlightData per IPC
            // message), FPUT ≙ acceptPut (FlightData stream in,
            // descriptor-first).
            case "FINFO" :: name :: Nil =>
              service.table(name) match {
                case Some(df) =>
                  writeStr(out, "OK")
                  writeFrame(out, service.flightInfoOf(name, df,
                    s"grpc+tcp://127.0.0.1:$port").encode)
                case None => writeStr(out, s"ERR not found: $name")
              }
            case "FGET" :: name :: Nil =>
              service.table(name) match {
                case Some(df) =>
                  writeStr(out, "OK")
                  val it = ArrowIpc.toIpcStreams(df).toLocalIterator()
                  while (it.hasNext) {
                    FlightProto.splitIpcStream(it.next()).foreach { m =>
                      writeFrame(out, FlightProto.FlightData(
                        None, m.metadata, Array.emptyByteArray, m.body).encode)
                    }
                  }
                  writeFrame(out, Array.emptyByteArray)
                case None => writeStr(out, s"ERR not found: $name")
              }
            case "FPUT" :: name :: ddl :: Nil =>
              val msgs = Iterator.continually(readFrame(in))
                .takeWhile(_.nonEmpty)
                .map(FlightProto.FlightData.decode)
                .map(fd => FlightProto.IpcMessage(fd.dataHeader, fd.dataBody))
                .toSeq
              try writeStr(out,
                s"OK\t${service.ingestFlightData(name, ddl, msgs)}")
              catch { case e: Throwable =>
                writeStr(out, s"ERR ${e.getMessage}")
              }
            // FXCHG ≙ Flight's DoExchange — the BIDIRECTIONAL verb the
            // reference never had (its Flight predates DoExchange
            // adoption; ours completes the verb set): the client streams
            // a table IN as FlightData whose first frame carries a CMD
            // descriptor with a wire-codec CypherMessage, the server
            // runs the query over the uploaded rows (visible as view
            // `input`), and streams the RESULT back as FlightData in
            // the same call — transform-in-flight, no named flight ever
            // registered.
            case "FXCHG" :: rest =>
              val ddl = rest.mkString(" ")
              val frames = Iterator.continually(readFrame(in))
                .takeWhile(_.nonEmpty)
                .map(FlightProto.FlightData.decode).toSeq
              try {
                val result = service.exchange(ddl, frames)
                writeStr(out, s"OK\t${result.schema.toDDL}")
                val it = ArrowIpc.toIpcStreams(result).toLocalIterator()
                while (it.hasNext) {
                  FlightProto.splitIpcStream(it.next()).foreach { m =>
                    writeFrame(out, FlightProto.FlightData(
                      None, m.metadata, Array.emptyByteArray, m.body).encode)
                  }
                }
                writeFrame(out, Array.emptyByteArray)
              } catch { case e: Throwable =>
                writeStr(out, s"ERR ${e.getMessage}")
              }
            // FPUTG ≙ the reference's write-action + doPut pair
            // (GdsActionHandler.java:76-150: gds.write.nodes /
            // gds.write.relationships resolve a GdsWriteNodeMessage /
            // GdsWriteRelsMessage, then the data arrives as a put
            // stream): the FIRST FlightData's descriptor is CMD carrying
            // the serialized write message — Flight's
            // descriptor-as-command convention (the same one
            // getFlightInfo-by-command uses, Producer.java:411-437).
            case "FPUTG" :: rest =>
              val ddl = rest.mkString(" ")
              val frames = Iterator.continually(readFrame(in))
                .takeWhile(_.nonEmpty)
                .map(FlightProto.FlightData.decode).toSeq
              try writeStr(out, s"OK\t${service.putGraphPart(ddl, frames)}")
              catch { case e: Throwable =>
                writeStr(out, s"ERR ${e.getMessage}")
              }
            // FACTIONS ≙ listActions: one ActionType frame per supported
            // action, zero frame ends (Producer.java:543-550).
            case "FACTIONS" :: Nil =>
              writeStr(out, "OK")
              service.actionTypes.foreach(a => writeFrame(out, a.encode))
              writeFrame(out, Array.emptyByteArray)
            // FACTION ≙ doAction: one Action frame in, one Result frame
            // out — dispatch on type like the reference's handler map
            // (Producer.java:513-541), shared with the gRPC transport via
            // FlightService.doAction.
            case "FACTION" :: Nil =>
              val action = FlightProto.Action.decode(readFrame(in))
              try {
                val res = service.doAction(action)
                writeStr(out, "OK")
                writeFrame(out, res.encode)
              } catch { case e: Throwable =>
                writeStr(out, s"ERR ${e.getMessage}")
              }
            case "SUBMIT" :: name :: Nil =>
              try writeStr(out, s"OK\t${service.submit(name)}")
              catch { case e: Throwable =>
                writeStr(out, s"ERR ${e.getMessage}")
              }
            case "STATUS" :: ticket :: Nil =>
              try writeStr(out, s"OK\t${service.status(ticket)}")
              catch { case _: Throwable =>
                writeStr(out, "ERR unknown ticket")
              }
            case "CANCEL" :: ticket :: Nil =>
              // unlike STATUS, cancel does side-effecting work that can
              // fail for reasons OTHER than a bad ticket — report those
              // honestly instead of a bogus not-found diagnosis
              try writeStr(out, s"OK\t${service.cancel(ticket)}")
              catch {
                case _: NoSuchElementException =>
                  writeStr(out, "ERR unknown ticket")
                case t: Throwable =>
                  writeStr(out, s"ERR cancel failed: ${t.getMessage}")
              }
            case "QUIT" :: Nil => live = false
            case other => writeStr(out, s"ERR bad verb: ${other.mkString(" ")}")
          }
        }
      } catch { case _: Throwable => () } // peer dropped: connection-local
      finally s.close()
    }

    def close(): Unit = { closed = true; sock.close() }
  }

  /** Typed client for the verbs above — what a consumer (or the spec)
    * uses instead of raw frames. One connection, sequential requests. */
  final class Client(host: String, port: Int, token: String) {
    private val s = new Socket(host, port)
    private val in = new DataInputStream(s.getInputStream)
    private val out = new DataOutputStream(s.getOutputStream)
    writeStr(out, token)
    private val hello = readStr(in)
    require(hello == "OK", s"auth failed: $hello")

    private def expectOk(resp: String): Array[String] = {
      require(resp.startsWith("OK"), resp)
      resp.split("\t").drop(1)
    }

    def listTables(): Seq[String] = listFlights().map(_._1)

    /** Full catalog listing: (name, schema DDL, partition count) per
      * flight — the C4 listFlights surface with schema fidelity. */
    def listFlights(): Seq[(String, String, Int)] = {
      writeStr(out, "LIST")
      readStr(in).split("\u001e").toSeq.filter(_.nonEmpty).map { rec =>
        val f = rec.split("\t")
        (f(0), f(1), f(2).toInt)
      }
    }

    /** (schema DDL, partition count). */
    def info(name: String): (String, Int) = {
      writeStr(out, s"INFO $name")
      val parts = expectOk(readStr(in))
      (parts(0), parts(1).toInt)
    }

    /** Fetch a table as its per-partition Arrow IPC stream blobs. */
    def getBlobs(name: String): Seq[Array[Byte]] = {
      writeStr(out, s"GET $name")
      val r = readStr(in)
      require(r == "OK", r)
      Iterator.continually(readFrame(in)).takeWhile(_.nonEmpty).toSeq
    }

    /** Fetch a table straight into a DataFrame (blobs → fromIpcStreams). */
    def get(spark: SparkSession, name: String): DataFrame = {
      val (ddl, _) = info(name)
      import spark.implicits._
      ArrowIpc.fromIpcStreams(spark.createDataset(getBlobs(name)),
        StructType.fromDDL(ddl))
    }

    /** Upload a DataFrame; returns the server-side row count. */
    def put(name: String, df: DataFrame): Long = {
      writeStr(out, s"PUT $name ${df.schema.toDDL}")
      ArrowIpc.toIpcStreams(df).toLocalIterator()
        .forEachRemaining(b => writeFrame(out, b))
      writeFrame(out, Array.emptyByteArray)
      expectOk(readStr(in))(0).toLong
    }

    /** getFlightInfo over the wire: a decoded FlightInfo protobuf. */
    def getFlightInfo(name: String): FlightProto.FlightInfo = {
      writeStr(out, s"FINFO $name")
      val r = readStr(in)
      require(r == "OK", r)
      FlightProto.FlightInfo.decode(readFrame(in))
    }

    /** getStream over the wire: raw FlightData frames (one per Arrow IPC
      * message), exactly as a Flight server would emit them. */
    def getFlightData(name: String): Seq[FlightProto.FlightData] = {
      writeStr(out, s"FGET $name")
      val r = readStr(in)
      require(r == "OK", r)
      Iterator.continually(readFrame(in)).takeWhile(_.nonEmpty)
        .map(FlightProto.FlightData.decode).toSeq
    }

    /** Fetch a table through the Flight-framed path: FlightData frames →
      * partition IPC streams (Schema headers delimit) → DataFrame. */
    def getFlight(spark: SparkSession, name: String): DataFrame = {
      val info = getFlightInfo(name)
      require(info.descriptor.path == Seq(name), "descriptor mismatch")
      val (ddl, _) = this.info(name)
      val msgs = getFlightData(name)
        .map(fd => FlightProto.IpcMessage(fd.dataHeader, fd.dataBody))
      import spark.implicits._
      ArrowIpc.fromIpcStreams(spark.createDataset(groupStreams(msgs)),
        StructType.fromDDL(ddl))
    }

    /** gds.write.nodes through the wire: CMD descriptor carries the
      * serialized write message, the node table streams as FlightData;
      * returns the server-side row count. */
    def putGraphNodes(msg: ActionMessages.GdsWriteNodeMessage,
                      df: DataFrame): Long = putGraphPart(msg.serialize, df)

    /** gds.write.relationships — same framing with a rels message. */
    def putGraphRels(msg: ActionMessages.GdsWriteRelsMessage,
                     df: DataFrame): Long = putGraphPart(msg.serialize, df)

    /** DoExchange: stream `df` up with a wire-codec CypherMessage (the
      * query sees the uploaded rows as view `input`), get the query's
      * result streamed back in the same call. */
    def exchange(spark: SparkSession, msg: ActionMessages.CypherMessage,
                 df: DataFrame): DataFrame = {
      writeStr(out, s"FXCHG ${df.schema.toDDL}")
      val desc = FlightProto.FlightDescriptor(
        FlightProto.DescriptorType.Cmd, msg.serialize, Nil)
      var first = true
      ArrowIpc.toIpcStreams(df).toLocalIterator().forEachRemaining { blob =>
        FlightProto.splitIpcStream(blob).foreach { m =>
          writeFrame(out, FlightProto.FlightData(
            if (first) Some(desc) else None,
            m.metadata, Array.emptyByteArray, m.body).encode)
          first = false
        }
      }
      writeFrame(out, Array.emptyByteArray)
      val resultDdl = expectOk(readStr(in))(0)
      val msgs = Iterator.continually(readFrame(in)).takeWhile(_.nonEmpty)
        .map(FlightProto.FlightData.decode)
        .map(fd => FlightProto.IpcMessage(fd.dataHeader, fd.dataBody))
        .toSeq
      import spark.implicits._
      ArrowIpc.fromIpcStreams(spark.createDataset(groupStreams(msgs)),
        StructType.fromDDL(resultDdl))
    }

    private def putGraphPart(cmd: Array[Byte], df: DataFrame): Long = {
      writeStr(out, s"FPUTG ${df.schema.toDDL}")
      val desc = FlightProto.FlightDescriptor(
        FlightProto.DescriptorType.Cmd, cmd, Nil)
      var first = true
      ArrowIpc.toIpcStreams(df).toLocalIterator().forEachRemaining { blob =>
        FlightProto.splitIpcStream(blob).foreach { m =>
          writeFrame(out, FlightProto.FlightData(
            if (first) Some(desc) else None,
            m.metadata, Array.emptyByteArray, m.body).encode)
          first = false
        }
      }
      writeFrame(out, Array.emptyByteArray)
      expectOk(readStr(in))(0).toLong
    }

    /** Upload through the Flight-framed path (acceptPut shape: the first
      * FlightData of each stream carries the descriptor + Schema header);
      * returns the server-side row count. */
    def putFlight(name: String, df: DataFrame): Long = {
      writeStr(out, s"FPUT $name ${df.schema.toDDL}")
      val desc = FlightProto.FlightDescriptor.path(name)
      ArrowIpc.toIpcStreams(df).toLocalIterator().forEachRemaining { blob =>
        FlightProto.splitIpcStream(blob).zipWithIndex.foreach { case (m, i) =>
          writeFrame(out, FlightProto.FlightData(
            if (i == 0) Some(desc) else None,
            m.metadata, Array.emptyByteArray, m.body).encode)
        }
      }
      writeFrame(out, Array.emptyByteArray)
      expectOk(readStr(in))(0).toLong
    }

    /** listActions over the wire: decoded ActionType protos. */
    def listActions(): Seq[FlightProto.ActionType] = {
      writeStr(out, "FACTIONS")
      val r = readStr(in)
      require(r == "OK", r)
      Iterator.continually(readFrame(in)).takeWhile(_.nonEmpty)
        .map(FlightProto.ActionType.decode).toSeq
    }

    /** doAction over the wire: Action proto in, Result proto out. */
    def doAction(atype: String, body: String = ""): FlightProto.ActionResult =
      doActionRaw(atype, body.getBytes(UTF_8))

    /** doAction with a binary body (a serialized wire-codec message). */
    def doActionRaw(atype: String,
                    body: Array[Byte]): FlightProto.ActionResult = {
      writeStr(out, "FACTION")
      writeFrame(out, FlightProto.Action(atype, body).encode)
      val r = readStr(in)
      require(r == "OK", r)
      FlightProto.ActionResult.decode(readFrame(in))
    }

    /** Submit a query through the cypher.read action (wire-codec
      * CypherMessage body); returns the result's flight ticket. */
    def cypherRead(msg: ActionMessages.CypherMessage): String =
      doActionRaw("cypher.read", msg.serialize).asString

    /** Submit a graph read through the gds.read action (wire-codec
      * GdsMessage body); returns the result's flight ticket. */
    def gdsRead(msg: ActionMessages.GdsMessage): String =
      doActionRaw("gds.read", msg.serialize).asString

    def submit(name: String): String = {
      writeStr(out, s"SUBMIT $name")
      expectOk(readStr(in))(0)
    }

    def status(ticket: String): String = {
      writeStr(out, s"STATUS $ticket")
      expectOk(readStr(in))(0)
    }

    def cancel(ticket: String): String = {
      writeStr(out, s"CANCEL $ticket")
      expectOk(readStr(in))(0)
    }

    def close(): Unit = {
      try { writeStr(out, "QUIT") } catch { case _: Throwable => () }
      s.close()
    }
  }
}
