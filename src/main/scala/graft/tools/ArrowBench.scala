package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.ArrowIpc

/** Throughput benchmark mirroring the reference's headline workload
  * (speed/26-aug-2021/README.md:92-112): stream 1,892,751 rows of
  * (long nodeId, float[256] embedding) — their PaySim+FastRP shape — as
  * Arrow record batches. The reference measured 1,031,461 rows/s
  * (avg best-3) over Flight between two GCP VMs; here the same payload is
  * serialized to Arrow IPC per partition on local[32]. The synthetic
  * payload replicates their synthetic benchmark (deterministic, not part
  * of the oracle gate). Prints one JSON line per run; the second line is
  * the same payload frozen as FixedSizeList(256) — the reference's actual
  * embedding envelope (GdsActionHandler.java:193-220).
  */
object ArrowBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = 1892751L
    val dim = 256
    // cache the payload: the reference's measurement is transport-only
    // (data pre-materialized in GDS memory) — without the cache, the
    // interpreted array generation dominates and hides serialization
    val df = spark.range(rows).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => ((col("id") + i) % 997).cast("float") / 997.0f).as("embedding"))
      .persist()
    df.count()

    // warm-up then best-of-3, the reference's methodology
    // (speed/26-aug-2021/README.md:44-71)
    def run(fixed: Boolean): (Double, Long) = {
      val t0 = System.nanoTime()
      val nStreams = ArrowIpc.toIpcStreams(df, fixedSizeArrays = fixed).count()
      ((System.nanoTime() - t0) / 1e9, nStreams)
    }
    for (fixed <- Seq(false, true)) {
      run(fixed)
      val runs = (1 to 3).map(_ => run(fixed))
      val best = runs.map(_._1).min
      val env = if (fixed) "fixedsizelist" else "list"
      println(f"""{"metric":"arrow-egress","envelope":"$env","rows":$rows,""" +
        f""""dim":$dim,"best_sec":$best%.2f,""" +
        f""""rows_per_sec":${(rows / best).toLong},""" +
        f""""runs_sec":[${runs.map(r => f"${r._1}%.2f").mkString(",")}]}""")
    }

    // Third line: the SAME payload through the genuine gRPC/HTTP/2
    // Flight path (FlightGrpc DoGet over the loopback) — the closest
    // apples-to-apples to the reference's 1,031,461 rows/s, which was
    // Flight-between-VMs with data pre-materialized in GDS memory. Here
    // the server has the partitions pre-staged (GetFlightInfo runs the
    // one staging job before the clock starts, mirroring "data ready in
    // memory"), and the timed section is pure transport: 8 consumer
    // threads DoGet the per-partition tickets over HTTP/2 and load the
    // record batches into Arrow vectors (counting rows from the roots).
    val server = new graft.sources.FlightGrpc.Server(spark, "bench").start()
    try {
      server.register("bench", df)
      val cli0 = new graft.sources.FlightGrpc.Client(
        "127.0.0.1", server.port, "bench")
      val tickets =
        try cli0.getFlightInfo("bench").endpoints.map(ep =>
          new String(ep.ticket.ticket, java.nio.charset.StandardCharsets.UTF_8))
        finally cli0.close()
      def runGrpc(): Double = {
        val queue = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        tickets.foreach(queue.add)
        val total = new java.util.concurrent.atomic.AtomicLong(0L)
        val t0 = System.nanoTime()
        val threads = (1 to 8).map { _ =>
          val t = new Thread(() => {
            val c = new graft.sources.FlightGrpc.Client(
              "127.0.0.1", server.port, "bench")
            try {
              var tk = queue.poll()
              while (tk != null) {
                val msgs = c.callOk("DoGet",
                    Seq(graft.sources.FlightProto.Ticket.of(tk).encode))
                  .map(graft.sources.FlightProto.FlightData.decode)
                  .map(fd => graft.sources.FlightProto.IpcMessage(
                    fd.dataHeader, fd.dataBody))
                val blob = graft.sources.FlightProto.joinIpcStream(msgs)
                val alloc =
                  new org.apache.arrow.memory.RootAllocator(Long.MaxValue)
                val rdr = new org.apache.arrow.vector.ipc.ArrowStreamReader(
                  new java.io.ByteArrayInputStream(blob), alloc)
                try {
                  val root = rdr.getVectorSchemaRoot
                  while (rdr.loadNextBatch())
                    total.addAndGet(root.getRowCount.toLong)
                } finally { rdr.close(); alloc.close() }
                tk = queue.poll()
              }
            } finally c.close()
          })
          t.start(); t
        }
        threads.foreach(_.join())
        require(total.get() == rows, s"row count drift: ${total.get()}")
        (System.nanoTime() - t0) / 1e9
      }
      runGrpc() // warm-up
      val runs = (1 to 3).map(_ => runGrpc())
      val best = runs.min
      println(f"""{"metric":"arrow-egress","envelope":"grpc-flight",""" +
        f""""rows":$rows,"dim":$dim,"best_sec":$best%.2f,""" +
        f""""rows_per_sec":${(rows / best).toLong},""" +
        f""""runs_sec":[${runs.map(r => f"$r%.2f").mkString(",")}]}""")
    } finally server.close()
    spark.stop()
  }
}
