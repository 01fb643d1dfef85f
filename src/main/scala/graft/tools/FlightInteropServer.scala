package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.sources.{FlightGrpc, TpchGraph}

/** Interop fixture: serve the hand-rolled gRPC/HTTP/2 Flight stack to an
  * UPSTREAM Arrow Flight client (`pyarrow.flight`, driven by
  * tools/flight_interop.py). This is the proof the loopback specs cannot
  * give — FlightGrpcSpec validates our server against our client, so a
  * mirrored misreading of the gRPC convention would pass; a stock
  * pyarrow FlightClient has its own independent implementation of the
  * HTTP/2 session, gRPC framing, Flight protobufs and auth flows, and
  * mirrors the reference's own client stack (python/neo4j_arrow.py uses
  * pyarrow.flight against the reference server).
  *
  * Serves TWO listeners over ONE FlightService (shared catalog/jobs):
  * cleartext h2c and TLS+ALPN (PKCS12 keystore via plain keytool; the
  * cert is exported as PEM for the Python side to pin).
  *
  * Control protocol: args = sfDir controlDir. When up, writes
  * `controlDir/ready.json` with ports/token/cert path + expected row
  * counts; then waits until `controlDir/stop` exists.
  */
object FlightInteropServer {
  def main(args: Array[String]): Unit = {
    val (sfDir, ctlDir) = (args(0), args(1))
    Files.createDirectories(Paths.get(ctlDir))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val token = "interop-secret"
    val pass = "changeit"

    // -- key material: PKCS12 keystore + PEM cert (JDK keytool only)
    val ks = Paths.get(ctlDir, "server.p12")
    val certPem = Paths.get(ctlDir, "server.pem")
    def keytool(kargs: String*): Unit = {
      val p = new ProcessBuilder((Seq("keytool") ++ kargs): _*)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes())
      require(p.waitFor() == 0, s"keytool failed:\n$out")
    }
    keytool("-genkeypair", "-alias", "flight", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "1", "-storetype", "PKCS12",
      "-keystore", ks.toString, "-storepass", pass,
      "-dname", "CN=127.0.0.1", "-ext", "san=ip:127.0.0.1")
    keytool("-exportcert", "-rfc", "-alias", "flight", "-keystore",
      ks.toString, "-storepass", pass, "-file", certPem.toString)

    // -- the flights under test: a small dimension table and a
    // float-typed fact slice (type-envelope coverage: int64, float64,
    // utf8 on the wire)
    val nation = TpchGraph.table(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_regionkey"), col("n_name"))
      .repartition(2)
    val orders = TpchGraph.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
      .repartition(3)

    val plain = new FlightGrpc.Server(spark, token).start()
    val secure = new FlightGrpc.Server(spark, token,
      sharedService = Some(plain.service),
      tls = Some(FlightGrpc.Tls.ServerTls(ks.toString, pass))).start()
    plain.register("nation", nation)
    plain.register("orders", orders)
    // a LONG flight (~2M rows, thousands of ≤1024-row IPC messages on the
    // wire) for the soak battery: cancel-mid-stream needs a DoGet that is
    // still producing when the client sends RST_STREAM, and the
    // concurrent soak needs real streaming volume per reader
    import org.apache.spark.sql.functions.{concat, lit, lpad}
    plain.register("bulk", spark.range(2000000L)
      .select(col("id"),
        concat(lit("pad-"), lpad(col("id").cast("string"), 60, "0"))
          .as("pad"))
      .repartition(2))

    // optional 3rd arg "bench": also serve the reference's headline
    // egress workload (speed/26-aug-2021/README.md:92-112 — 1,892,751
    // rows of (long, float[256])) so tools/flight_egress_bench.py can
    // measure DoGet throughput with the STOCK pyarrow client, the same
    // client stack the reference's own measurement used. Partition
    // staging happens at GetFlightInfo (before the clock), mirroring
    // the reference's data-ready-in-GDS-memory methodology.
    if (args.length > 2 && args(2) == "bench") {
      import org.apache.spark.sql.functions.{lit, sequence, transform}
      val rows = 1892751L
      val dim = 256
      plain.register("bench_embeddings", spark.range(rows)
        .select(col("id"),
          transform(sequence(lit(0), lit(dim - 1)),
            i => ((col("id") + i) % 997).cast("float") / 997.0f)
            .as("embedding")))
    }

    val ready =
      s"""{"port":${plain.port},"tlsPort":${secure.port},""" +
        s""""token":"$token","certPem":"${certPem.toString}",""" +
        s""""nationRows":${nation.count()},"ordersRows":${orders.count()}}"""
    // write-then-rename so the Python side never reads a partial file
    val tmp = Paths.get(ctlDir, ".ready.tmp")
    Files.writeString(tmp, ready + "\n")
    Files.move(tmp, Paths.get(ctlDir, "ready.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    val stop = Paths.get(ctlDir, "stop")
    val deadline = System.nanoTime() + 30L * 60 * 1000 * 1000 * 1000
    // stat protocol for the soak battery: the Python side writes a seq
    // number into `stat_req`; we answer in `stat.json` (same seq echoed,
    // so the reader never trusts a stale answer) with the observable
    // evidence the cancel/abandon paths fired: aborted-response count and
    // live put-spill directory count under java.io.tmpdir.
    val statReq = Paths.get(ctlDir, "stat_req")
    val tmpRoot = Paths.get(System.getProperty("java.io.tmpdir"))
    def spillDirCount: Int = {
      val s = Files.list(tmpRoot)
      try s.filter(p =>
        p.getFileName.toString.startsWith("graft_put_spill_")).count().toInt
      finally s.close()
    }
    while (!Files.exists(stop) && System.nanoTime() < deadline) {
      if (Files.exists(statReq)) {
        val seq = Files.readString(statReq).trim
        Files.delete(statReq)
        val stat =
          s"""{"seq":"$seq","aborted":${plain.abortedResponses.get() +
            secure.abortedResponses.get()},"spillDirs":$spillDirCount}"""
        val st = Paths.get(ctlDir, ".stat.tmp")
        Files.writeString(st, stat + "\n")
        Files.move(st, Paths.get(ctlDir, "stat.json"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      Thread.sleep(200)
    }
    secure.close()
    plain.close()
    spark.stop()
  }
}
