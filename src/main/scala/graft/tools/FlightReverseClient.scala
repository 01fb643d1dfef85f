package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, sum}

import graft.sources.FlightGrpc

/** The REVERSE interop half: graft's hand-rolled gRPC Flight CLIENT and
  * the [[graft.sources.FlightSource]] DSv2 reader driven against an
  * UPSTREAM `pyarrow.flight` SERVER (started by
  * tools/flight_reverse_interop.py). tools/flight_interop.py proves the
  * server side against a stock client; this proves the client side
  * against a stock server — after both, no graft wire component has
  * only ever talked to code written in this repo.
  *
  * args: host port expectedRows expectedIdSum
  * Prints one JSON line per step; exits non-zero on any failure.
  */
object FlightReverseClient {
  def main(args: Array[String]): Unit = {
    val (host, port) = (args(0), args(1).toInt)
    val expectedRows = args(2).toLong
    val expectedIdSum = args(3).toLong
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the upstream server ignores credentials; ours always offers one
    val cli = new FlightGrpc.Client(host, port, "reverse-token")
    var failures = 0
    def step(name: String)(f: => Unit): Unit =
      try { f; println(s"""{"step":"$name","ok":true}""") }
      catch {
        case e: Throwable =>
          failures += 1
          println(s"""{"step":"$name","ok":false,"err":${ujson(e)}}""")
      }
    def ujson(e: Throwable): String =
      "\"" + String.valueOf(e.getMessage).replaceAll("[\"\\\\\\n\\r]", "?")
        .take(300) + "\""

    step("list_flights") {
      val infos = cli.listFlights()
      require(infos.exists(_.descriptor.path == Seq("t")),
        s"flight 't' not listed: ${infos.map(_.descriptor.path)}")
    }
    step("get_flight_info") {
      val fi = cli.getFlightInfo("t")
      require(fi.endpoints.size == 2,
        s"expected the server's 2 endpoints, got ${fi.endpoints.size}")
      require(fi.totalRecords == expectedRows,
        s"total_records ${fi.totalRecords} != $expectedRows")
    }
    step("do_get_all_endpoints") {
      val fi = cli.getFlightInfo("t")
      val df = cli.readFlight(spark, fi)
      val (n, s) = df.agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)), sum(col("id")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).head
      require(n == expectedRows && s == expectedIdSum,
        s"do_get drift: n=$n sum=$s")
    }
    step("dsv2_reader") {
      val df = spark.read.format("graft.sources.FlightSource")
        .option("host", host).option("port", port.toString)
        .option("token", "reverse-token").option("flight", "t")
        .load()
      require(df.rdd.getNumPartitions == 2,
        s"expected 2 input partitions, got ${df.rdd.getNumPartitions}")
      val s = df.agg(sum(col("id"))).collect().head.getLong(0)
      require(s == expectedIdSum, s"dsv2 sum drift: $s")
    }
    step("do_put") {
      import spark.implicits._
      val up = (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
      val acked = cli.doPut("uploaded", up.repartition(2))
      require(acked == 1000L, s"put ack $acked != 1000")
    }
    step("do_action") {
      val st = cli.doAction("job.status", "any").asString
      require(st == "COMPLETE", s"action answered '$st'")
    }
    step("do_exchange") {
      // bidi verb against the stock server (an echo handler): the graft
      // client streams 500 rows up under a CMD descriptor and must read
      // the identical rows back in the same RPC
      import spark.implicits._
      val up = (0L until 500L).map(i => (i, i * 2)).toDF("a", "b")
      val echoed = cli.doExchange(spark,
        graft.sources.ActionMessages.CypherMessage("db", "RETURN input"), up)
      val (n, s) = echoed.agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)), sum(col("a")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).head
      require(n == 500L && s == 500L * 499L / 2,
        s"do_exchange echo drift: n=$n sum=$s")
    }
    // args 4/5 (optional): a TLS port of the same stock server + a PKCS12
    // truststore holding its cert — proves the graft client's TLS+ALPN
    // stack against an upstream TLS listener, not just our own
    if (args.length > 5) {
      val (tlsPort, trustStore) = (args(4).toInt, args(5))
      step("tls_do_get") {
        val tcli = new FlightGrpc.Client(host, tlsPort, "reverse-token",
          tls = Some(FlightGrpc.Tls.ClientTls(trustStore, "changeit")))
        try {
          require(tcli.negotiatedProtocol.contains("h2"),
            s"ALPN negotiated ${tcli.negotiatedProtocol}, need h2")
          val fi = tcli.getFlightInfo("t")
          val df = tcli.readFlight(spark, fi)
          val s = df.agg(sum(col("id"))).collect().head.getLong(0)
          require(s == expectedIdSum, s"tls do_get sum drift: $s")
        } finally tcli.close()
      }
    }
    cli.close()
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
