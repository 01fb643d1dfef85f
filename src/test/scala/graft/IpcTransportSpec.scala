package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.IpcTransport

/** End-to-end exercise of the framed-TCP transport that stands in for the
  * reference's Flight RPC (Producer.java:86-510): auth gate, catalog
  * verbs, Arrow IPC get/put round trips, and the ticketed-job lifecycle —
  * all over real sockets on the loopback. */
class IpcTransportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample = (0L until 500L)
    .map(i => (i, s"name_$i", Array.tabulate(4)(j => (i + j).toDouble)))
    .toDF("id", "name", "vec")

  private def withServer(f: IpcTransport.Server => Unit): Unit = {
    val srv = new IpcTransport.Server(spark, token = "sekrit").start()
    try f(srv) finally srv.close()
  }

  test("wrong token is rejected and the connection is closed") {
    withServer { srv =>
      val s = new Socket("127.0.0.1", srv.port)
      val out = new DataOutputStream(s.getOutputStream)
      val in = new DataInputStream(s.getInputStream)
      val bad = "wrong".getBytes(UTF_8)
      out.writeInt(bad.length); out.write(bad); out.flush()
      val n = in.readInt()
      val buf = new Array[Byte](n); in.readFully(buf)
      assert(new String(buf, UTF_8) == "ERR unauthenticated")
      // server closed its side: next read hits EOF
      assert(in.read() == -1)
      s.close()
    }
  }

  test("list + info reflect the registry; unknown names are NOT_FOUND") {
    withServer { srv =>
      srv.register("people", sample)
      val c = new IpcTransport.Client("127.0.0.1", srv.port, "sekrit")
      try {
        assert(c.listTables() == Seq("people"))
        val (ddl, nParts) = c.info("people")
        assert(ddl.contains("id BIGINT") && ddl.contains("vec ARRAY<DOUBLE>"))
        assert(nParts >= 1)
        val e = intercept[IllegalArgumentException](c.info("nope"))
        assert(e.getMessage.contains("not found"))
      } finally c.close()
    }
  }

  test("listFlights carries per-flight schema + partitions (C4 fidelity)") {
    // reference: Producer.java:411-437 — listFlights resolves each
    // FlightInfo's schema the same way getFlightInfo does. Our LIST
    // mirrors that: every entry is (name, schema DDL, numPartitions),
    // byte-identical to what INFO reports for the same flight.
    withServer { srv =>
      srv.register("people", sample)
      val dims = (0L until 7L).map(i => (i, s"d$i")).toDF("k", "label")
      srv.register("dims", dims.repartition(3))
      val c = new IpcTransport.Client("127.0.0.1", srv.port, "sekrit")
      try {
        val flights = c.listFlights()
        assert(flights.map(_._1) == Seq("dims", "people")) // sorted
        val byName = flights.map(f => f._1 -> f).toMap
        assert(byName("people")._2 == sample.schema.toDDL)
        assert(byName("dims")._2 == dims.schema.toDDL)
        assert(byName("dims")._3 == 3)
        // LIST and INFO agree per flight
        flights.foreach { case (n, ddl, nParts) =>
          assert(c.info(n) == (ddl, nParts))
        }
      } finally c.close()
    }
  }

  test("getStream round-trips rows and types through Arrow IPC frames") {
    withServer { srv =>
      srv.register("people", sample)
      val c = new IpcTransport.Client("127.0.0.1", srv.port, "sekrit")
      try {
        val got = c.get(spark, "people")
          .select(col("id"), col("name"), col("vec"))
          .as[(Long, String, Seq[Double])].collect().toSet
        val want = sample.as[(Long, String, Seq[Double])].collect().toSet
        assert(got == want)
      } finally c.close()
    }
  }

  test("putStream ingests, materializes eagerly, and serves back") {
    withServer { srv =>
      val c = new IpcTransport.Client("127.0.0.1", srv.port, "sekrit")
      try {
        val n = c.put("uploaded", sample.repartition(3))
        assert(n == 500L)
        assert(c.listTables() == Seq("uploaded"))
        val got = c.get(spark, "uploaded")
          .as[(Long, String, Seq[Double])].collect().toSet
        assert(got == sample.as[(Long, String, Seq[Double])].collect().toSet)
      } finally c.close()
    }
  }

  test("ticketed job lifecycle over the wire: submit -> status terminal") {
    withServer { srv =>
      srv.register("people", sample)
      val c = new IpcTransport.Client("127.0.0.1", srv.port, "sekrit")
      try {
        val ticket = c.submit("people")
        assert(ticket.nonEmpty)
        // poll to a terminal state (Complete for this tiny count job)
        var st = c.status(ticket)
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (st != "Complete" && System.nanoTime() < deadline) {
          Thread.sleep(50)
          st = c.status(ticket)
        }
        assert(st == "Complete")
        val e = intercept[IllegalArgumentException](c.status("no-such"))
        assert(e.getMessage.contains("unknown ticket"))
        // CANCEL verb: a job already at a terminal state loses the race
        assert(c.cancel(ticket) == "ALREADY_DONE")
        assert(c.status(ticket) == "Complete") // cancel did NOT clobber it
        val e2 = intercept[IllegalArgumentException](c.cancel("no-such"))
        assert(e2.getMessage.contains("unknown ticket"))
      } finally c.close()
    }
  }

  test("two concurrent clients are served independently") {
    withServer { srv =>
      srv.register("people", sample)
      val c1 = new IpcTransport.Client("127.0.0.1", srv.port, "sekrit")
      val c2 = new IpcTransport.Client("127.0.0.1", srv.port, "sekrit")
      try {
        assert(c1.listTables() == Seq("people"))
        assert(c2.info("people")._2 >= 1)
        assert(c1.getBlobs("people").nonEmpty)
        assert(c2.getBlobs("people").nonEmpty)
      } finally { c1.close(); c2.close() }
    }
  }
}
