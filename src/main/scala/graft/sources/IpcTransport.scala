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
  *  - `STATUS <ticket>`       → PENDING / PRODUCING / COMPLETE / ERROR
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

  final class Server(spark: SparkSession, token: String) {
    private val tables = TrieMap.empty[String, DataFrame]
    private val sock = new ServerSocket(0)
    @volatile private var closed = false

    def port: Int = sock.getLocalPort

    def register(name: String, df: DataFrame): Unit = tables.put(name, df)

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
        } catch { case _: Throwable => () } // closed mid-accept
      }

    private def handle(s: Socket): Unit = {
      val in = new DataInputStream(s.getInputStream)
      val out = new DataOutputStream(s.getOutputStream)
      try {
        // auth gate: first frame must be the shared token. Constant
        // responses, connection dropped on mismatch — the reference's
        // basic-auth validator contract.
        if (readStr(in) != token) {
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
              writeStr(out, tables.keys.toSeq.sorted.mkString(","))
            case "INFO" :: name :: Nil =>
              tables.get(name) match {
                case Some(df) =>
                  writeStr(out,
                    s"OK\t${df.schema.toDDL}\t${df.rdd.getNumPartitions}")
                case None => writeStr(out, s"ERR not found: $name")
              }
            case "GET" :: name :: Nil =>
              tables.get(name) match {
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
              try {
                val schema = StructType.fromDDL(ddl)
                import spark.implicits._
                val ds = spark.createDataset(blobs)
                // materialize NOW: ingest must fail on this request (bad
                // schema, ragged batch), not on a later reader's action
                val df = ArrowIpc.fromIpcStreams(ds, schema)
                  .localCheckpoint(true)
                tables.put(name, df)
                writeStr(out, s"OK\t${df.count()}")
              } catch { case e: Throwable =>
                writeStr(out, s"ERR ${e.getMessage}")
              }
            case "SUBMIT" :: name :: Nil =>
              tables.get(name) match {
                case Some(df) =>
                  import scala.concurrent.ExecutionContext.Implicits.global
                  val h = graft.operators.Jobs.submit(df)
                  writeStr(out, s"OK\t${h.ticket}")
                case None => writeStr(out, s"ERR not found: $name")
              }
            case "STATUS" :: ticket :: Nil =>
              graft.operators.Jobs.status(ticket) match {
                case Some(st) => writeStr(out, s"OK\t$st")
                case None => writeStr(out, s"ERR unknown ticket")
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

    def listTables(): Seq[String] = {
      writeStr(out, "LIST")
      readStr(in).split(",").toSeq.filter(_.nonEmpty)
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

    def submit(name: String): String = {
      writeStr(out, s"SUBMIT $name")
      expectOk(readStr(in))(0)
    }

    def status(ticket: String): String = {
      writeStr(out, s"STATUS $ticket")
      expectOk(readStr(in))(0)
    }

    def close(): Unit = {
      try { writeStr(out, "QUIT") } catch { case _: Throwable => () }
      s.close()
    }
  }
}
