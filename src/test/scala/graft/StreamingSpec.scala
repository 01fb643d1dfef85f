package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

case class StreamEv(event_id: Long, ts: Timestamp, user_id: Long,
                    event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L -
    (1700000000000L % 3600000L) + min * 60000L)  // aligned to an hour start

  test("stream-static enrich joins each micro-batch against the dimension") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[StreamEv]
    val dim = Seq((1L, "S1"), (2L, "S2")).toDF("user_id", "segment")
    val q = EventStreams.enrich(in.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      in.addData(
        StreamEv(1, ts(0), 1, "click", 1.0),
        StreamEv(2, ts(1), 2, "view", 2.0),
        StreamEv(3, ts(2), 9, "click", 3.0))   // no dimension row → dropped
      q.processAllAvailable()
      in.addData(StreamEv(4, ts(3), 1, "view", 4.0)) // second micro-batch
      q.processAllAvailable()
      val out = spark.table("enrich_out")
        .select("event_id", "segment").as[(Long, String)].collect().toSet
      assert(out == Set((1L, "S1"), (2L, "S2"), (4L, "S1")))
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[StreamEv]
    val q = EventStreams.dedup(in.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData(
        StreamEv(1, ts(0), 1, "click", 1.0),
        StreamEv(1, ts(0), 1, "click", 1.0),   // exact duplicate
        StreamEv(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      in.addData(StreamEv(1, ts(2), 1, "click", 1.0))  // dup, later ts
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("hourly windows emit after the watermark passes") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[StreamEv]
    val q = EventStreams.hourlyCounts(in.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("append").start()
    try {
      in.addData(
        StreamEv(1, ts(5), 1, "click", 1.5),
        StreamEv(2, ts(10), 2, "click", 2.5),
        StreamEv(3, ts(20), 1, "view", 1.0))
      q.processAllAvailable()
      // advance event time far enough to close the first hour's window
      in.addData(StreamEv(9, ts(200), 1, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_out")
        .select("event_type", "n", "total")
        .as[(String, Long, Double)].collect().toSet
      assert(rows.contains(("click", 2L, 4.0)))
      assert(rows.contains(("view", 1L, 1.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessions: in-stream gap split + timeout flush") {
    import graft.streaming.{StatefulSessions, UserEvent}
    implicit val sql = spark.sqlContext
    val in = MemoryStream[UserEvent]
    val q = StatefulSessions.sessions(in.toDS(), gapMs = 30 * 60000L,
        watermark = "1 hour")
      .writeStream.format("memory").queryName("state_sessions")
      .outputMode("append").start()
    try {
      in.addData(UserEvent(1, ts(0)), UserEvent(1, ts(10)))
      q.processAllAvailable()
      // gap of 50min inside the stream -> first session emitted eagerly
      in.addData(UserEvent(1, ts(60)))
      q.processAllAvailable()
      val eager = spark.table("state_sessions")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
      assert(eager.toSeq == Seq((1L, ts(0), ts(10), 2L)))
      // advance the watermark far past last+gap -> dangling session
      // flushed by event-time timeout
      in.addData(UserEvent(2, ts(600)))
      q.processAllAvailable()
      in.addData(UserEvent(2, ts(601)))
      q.processAllAvailable()
      val all = spark.table("state_sessions")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
        .collect().toSet
      assert(all.contains((1L, ts(60), ts(60), 1L)))
    } finally q.stop()
  }

  test("transformWithState sessions: gap split + event-time timer flush") {
    import graft.streaming.{StatefulSessionsTws, UserEvent}
    implicit val sql = spark.sqlContext
    // transformWithState needs multi-column-family state → RocksDB provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[UserEvent]
    val q = StatefulSessionsTws.sessions(in.toDS(), gapMs = 30 * 60000L,
        watermark = "1 hour")
      .writeStream.format("memory").queryName("tws_sessions")
      .outputMode("append").start()
    try {
      in.addData(UserEvent(1, ts(0)), UserEvent(1, ts(10)))
      q.processAllAvailable()
      // gap of 50min inside the stream -> first session emitted eagerly
      in.addData(UserEvent(1, ts(60)))
      q.processAllAvailable()
      val eager = spark.table("tws_sessions")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
      assert(eager.toSeq == Seq((1L, ts(0), ts(10), 2L)))
      // watermark far past last+gap -> dangling session flushed by TIMER
      in.addData(UserEvent(2, ts(600)))
      q.processAllAvailable()
      in.addData(UserEvent(2, ts(601)))
      q.processAllAvailable()
      val all = spark.table("tws_sessions")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
        .collect().toSet
      assert(all.contains((1L, ts(60), ts(60), 1L)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stream-stream join attributes purchases within the horizon") {
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[StreamEv]
    val purchases = MemoryStream[StreamEv]
    val q = EventStreams.purchaseAttribution(
        clicks.toDF(), purchases.toDF(), horizon = "1 hour")
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      clicks.addData(StreamEv(1, ts(0), 1, "click", 0),
        StreamEv(2, ts(10), 2, "click", 0))
      purchases.addData(
        StreamEv(10, ts(30), 1, "purchase", 9.99),   // within 1h of click 1
        StreamEv(11, ts(30), 3, "purchase", 1.0),    // other user
        StreamEv(12, ts(200), 2, "purchase", 2.0))   // past the horizon
      q.processAllAvailable()
      val got = spark.table("attr_out")
        .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L)))
    } finally q.stop()
  }

  test("foreachBatch ingest appends micro-batches to the bulk store") {
    import java.nio.file.Files
    implicit val sql = spark.sqlContext
    val db = Files.createTempDirectory("graft_bulk").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val in = MemoryStream[StreamEv]
    val q = EventStreams.ingestToBulkStore(in.toDF(), db, ckpt)
    try {
      in.addData(StreamEv(1, ts(0), 1, "click", 1.0),
        StreamEv(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      in.addData(StreamEv(3, ts(2), 2, "click", 3.0))
      q.processAllAvailable()
      val back = spark.read.parquet(db)
      assert(back.count() == 3)
      assert(back.select("batch_id").distinct().count() == 2)  // two commits
      // type partitioning on disk -> partition pruning on read
      val dirs = new java.io.File(db).listFiles().map(_.getName)
        .filter(_.startsWith("event_type=")).toSet
      assert(dirs == Set("event_type=click", "event_type=view"))
    } finally q.stop()
  }

  test("incremental changelog: tombstones defeat late older records") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("graft_cdc").toString
    // file 1: key 1 up@10; key 2 up@11 then DELETED @30
    // file 2: key 2 LATE OLDER up@20 (must stay deleted); key 1 up@40
    Seq((1L, 10L, "up", 1.0), (2L, 11L, "up", 2.0), (2L, 30L, "del", 0.0))
      .toDF("k", "seq", "op", "v")
      .coalesce(1).write.mode("append").parquet(s"$base/src")
    Seq((2L, 20L, "up", 9.9), (1L, 40L, "up", 7.0))
      .toDF("k", "seq", "op", "v")
      .coalesce(1).write.mode("append").parquet(s"$base/src")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$base/src").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/src")
    val q = EventStreams.materializeChangelog(stream, s"$base/state",
      s"$base/ckpt", key = "k", seq = "seq", isDelete = col("op") === "del")
    q.awaitTermination()
    val v = EventStreams.latestVersion(s"$base/state").get
    val state = spark.read.parquet(s"$base/state/v$v")
    // the tombstone row for key 2 is IN the state (seq 30 beat late 20)…
    assert(state.count() === 2)
    assert(state.where(col("k") === 2L).select("_is_delete")
      .as[Boolean].collect() === Array(true))
    // …and the reader view hides it; key 1 shows its newest payload
    val view = state.where(!col("_is_delete"))
      .select("k", "seq", "v").as[(Long, Long, Double)].collect()
    assert(view.toSeq === Seq((1L, 40L, 7.0)))
  }

  test("streaming 2-hop over a staged changelog equals the batch golden") {
    // the KHOP.md sample graph replayed as a 2-batch edge changelog: the
    // incremental stream-stream join must reconstruct exactly the batch
    // 2-hop edge sets (KHopSpec's golden), proving Δ-maintenance — later
    // batches' edges pair with earlier batches' join state
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (1L, 2L),
      (1L, 3L), (4L, 1L), (5L, 4L)).toDF("src", "dst")
    val base = s"/tmp/graft_stream_khop_spec_${System.nanoTime()}"
    val src = graft.streaming.GraphStreams
      .stageEdgeChangelog(edges, base, nSlices = 2)
    val got = graft.streaming.GraphStreams
      .twoHopOverChangelog(spark, src, "spec")
      .as[(Long, Long, Long)].collect().toSet
    val want = graft.operators.KHop.twoHopEdges(
        edges.toDF("START_ID", "END_ID")
          .withColumn("TYPE",
            org.apache.spark.sql.functions.lit("E")))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    def rm(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(rm)); p.delete()
    }
    rm(new java.io.File(base))
  }

  test("ccMergeBatch maintains the batch-CC invariant after every batch " +
      "(cross-batch merges, new nodes, self-loops)") {
    import graft.streaming.GraphStreams
    // three batches engineered so components MERGE on arrival: batch 2
    // bridges batch 1's two components; batch 3 extends both live
    // components and adds a self-loop singleton
    val batches = Seq(
      Seq((1L, 2L), (5L, 6L)),
      Seq((2L, 5L), (10L, 11L)),
      Seq((6L, 3L), (11L, 12L), (20L, 20L)))
    var state: Option[org.apache.spark.sql.DataFrame] = None
    var seen = Seq.empty[(Long, Long)]
    for (b <- batches) {
      seen ++= b
      state = Some(GraphStreams.ccMergeBatch(state,
        b.toDF("src", "dst")).localCheckpoint(true))
      val got = state.get.as[(Long, Long)].collect().toSet
      val want = graft.operators.Dedup.clusters(
          seen.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toSet
      assert(got == want, s"after ${seen.size} edges: $got vs $want")
    }
    // final shape: {1,2,3,5,6}→1, {10,11,12}→10, {20}→20
    val fin = state.get.as[(Long, Long)].collect().toMap
    assert(fin == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 6L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("ccMergeBatch is idempotent under foreachBatch retries: " +
      "re-merging an already-applied batch is a fixed point") {
    // a failed micro-batch re-runs against the last committed state —
    // latestVersionBefore(batchId) selects v<b-1 even when an orphan
    // v<b> survived the failed commit (r7 ADVICE: reading v<b> while
    // overwrite-writing v<b> is rejected by Spark). Re-applying an
    // already-applied batch must also not move any rep: contracted
    // edges all map rep→rep (dropped) and every node already exists
    import graft.streaming.GraphStreams
    val b1 = Seq((1L, 2L), (5L, 6L)).toDF("src", "dst")
    val b2 = Seq((2L, 5L), (10L, 11L)).toDF("src", "dst")
    val s1 = GraphStreams.ccMergeBatch(None, b1).localCheckpoint(true)
    val s2 = GraphStreams.ccMergeBatch(Some(s1), b2).localCheckpoint(true)
    val s2Retry = GraphStreams.ccMergeBatch(Some(s2), b2)
      .localCheckpoint(true)
    assert(s2Retry.as[(Long, Long)].collect().toSet ==
      s2.as[(Long, Long)].collect().toSet)
    // and a retry of the FIRST batch against later state is also inert
    val s2RetryB1 = GraphStreams.ccMergeBatch(Some(s2), b1)
    assert(s2RetryB1.as[(Long, Long)].collect().toSet ==
      s2.as[(Long, Long)].collect().toSet)
  }

  test("latestVersionBefore skips an orphan same-batch version dir") {
    // the retry scenario itself: v0 committed, v1 written but its
    // checkpoint commit lost — the re-run of batch 1 must read v0
    val base = java.nio.file.Files
      .createTempDirectory("graft_lvb_").toString
    try {
      new java.io.File(s"$base/v0").mkdirs()
      new java.io.File(s"$base/v1").mkdirs()
      assert(EventStreams.latestVersion(base).contains(1L))
      assert(EventStreams.latestVersionBefore(base, 1L).contains(0L))
      assert(EventStreams.latestVersionBefore(base, 0L).isEmpty)
    } finally {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(); ()
      }
      rm(new java.io.File(base))
    }
  }

  test("incremental CC over a staged changelog equals batch clusters") {
    import graft.streaming.GraphStreams
    // the gate's deterministic graph shape at toy scale: 7-block stars
    // plus mod-21 bridges, sliced by src mod 3 so block members arrive
    // across different micro-batches
    val ids = (0L until 100L)
    val edges = (ids.map(i => (i, i - i % 7)) ++
      ids.filter(_ % 21 == 6).map(i => (i, i + 1))).toDF("src", "dst")
    val base = s"/tmp/graft_stream_cc_spec_${System.nanoTime()}"
    try {
      val src = GraphStreams.stageEdgeChangelog(edges, base, nSlices = 3)
      val stream = spark.readStream.schema("src BIGINT, dst BIGINT")
        .option("maxFilesPerTrigger", 1).parquet(src)
      val q = GraphStreams.incrementalConnectedComponents(
        stream, s"$base/state", s"$base/ckpt")
      q.awaitTermination()
      val v = EventStreams.latestVersion(s"$base/state").get
      val got = spark.read.parquet(s"$base/state/v$v")
        .as[(Long, Long)].collect().toSet
      val want = graft.operators.Dedup.clusters(
          edges.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toSet
      assert(got == want)
    } finally {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(); ()
      }
      rm(new java.io.File(base))
    }
  }

  test("kHopOverChangelog generalizes: k=4 over a staged changelog " +
      "equals batch kHopEdges") {
    import graft.streaming.GraphStreams
    val ids = (0L until 48L)
    val edges = (ids.dropRight(1).map(i => (i, i + 1)) ++
      ids.filter(_ % 8 == 0).map(i => (i, (i + 16) % 48)))
      .toDF("src", "dst")
    val base = s"/tmp/graft_stream_khop4_spec_${System.nanoTime()}"
    try {
      val src = GraphStreams.stageEdgeChangelog(edges, base, nSlices = 3)
      val got = GraphStreams
        .kHopOverChangelog(spark, src, "spec", k = 4, 10L, 20L)
        .as[(Long, Long, Long)].collect().toSet
      val want = graft.operators.KHop.kHopEdges(
          edges.select($"src".as("START_ID"), $"dst".as("END_ID")),
          k = 4,
          originPred = Some(org.apache.spark.sql.functions.col("origin")
            .between(10L, 20L)))
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want && got.nonEmpty)
    } finally {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(); ()
      }
      rm(new java.io.File(base))
    }
  }

  test("ccMergeBatch double-failure replay: losing the checkpoint commit " +
      "AND the state write for the last batch, then restarting, converges " +
      "to the same mapping") {
    import graft.streaming.GraphStreams
    // VERDICT r8 #5 — the one retry window left open after the r8
    // latestVersionBefore fix: batch b ran, but BOTH its checkpoint
    // commit and its v<b> state write are lost. The restarted query must
    // re-merge batch b from v<b-1> (idempotent min-label merge) and land
    // on the identical component mapping.
    val ids = (0L until 60L)
    val edges = (ids.map(i => (i, i - i % 5)) ++
      ids.filter(_ % 15 == 4).map(i => (i, i + 1))).toDF("src", "dst")
    val base = s"/tmp/graft_stream_cc_dfail_${System.nanoTime()}"
    try {
      val src = GraphStreams.stageEdgeChangelog(edges, base, nSlices = 3)
      def run(): Unit = {
        val stream = spark.readStream.schema("src BIGINT, dst BIGINT")
          .option("maxFilesPerTrigger", 1).parquet(src)
        GraphStreams.incrementalConnectedComponents(
          stream, s"$base/state", s"$base/ckpt").awaitTermination()
      }
      run()
      val last = EventStreams.latestVersion(s"$base/state").get
      assert(last >= 2L)  // the 3 slices really arrived as separate batches
      val want = spark.read.parquet(s"$base/state/v$last")
        .as[(Long, Long)].collect().toSet
      // the double failure: commit log entry for the last batch gone,
      // state write for the last batch gone (offsets/<last> survives, so
      // the restart replays exactly batch <last>)
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(); ()
      }
      val commit = new java.io.File(s"$base/ckpt/commits/$last")
      assert(commit.exists)
      commit.delete()
      // ChecksumFs keeps a .crc sidecar per commit file — left behind it
      // blocks the re-committed batch's rename with FileAlreadyExists
      new java.io.File(s"$base/ckpt/commits/.$last.crc").delete()
      rm(new java.io.File(s"$base/state/v$last"))
      run()  // replays batch <last> from v<last-1>
      val got = spark.read.parquet(s"$base/state/v$last")
        .as[(Long, Long)].collect().toSet
      assert(got == want)
      // and the replayed mapping still equals the batch-CC contract
      val batchCC = graft.operators.Dedup.clusters(
          edges.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toSet
      assert(got == batchCC)
    } finally {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(); ()
      }
      rm(new java.io.File(base))
    }
  }

  test("file-stream hourly counts on real events match the batch twin") {
    import java.nio.file.{Files, Paths}
    val src = Files.createTempDirectory("graft_stream_src")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      src.resolve("events.parquet"))
    val batch = graft.sources.TpchGraph.table(spark,
      "/root/testdata/sf0.001", "events")
    val raw = spark.read.parquet(src.toString)   // ts encoding varies by drop
    val stream = graft.sources.TpchGraph.normalizeTimestamps(
      spark.readStream.schema(raw.schema).parquet(src.toString))
    val q = EventStreams.hourlyCounts(stream)
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_hourly")
        .select("hour", "event_type", "n", "total")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      val want = batch
        .groupBy(org.apache.spark.sql.functions
          .window($"ts", "1 hour").as("w"), $"event_type")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.round(
            org.apache.spark.sql.functions.sum($"value"), 2).as("total"))
        .select($"w.start", $"event_type", $"n", $"total")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("session windows close on the inactivity gap") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[StreamEv]
    val q = EventStreams.sessions(in.toDF(), gap = "30 minutes",
        watermark = "1 hour")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      in.addData(
        StreamEv(1, ts(0), 1, "click", 1.0),
        StreamEv(2, ts(10), 1, "view", 1.0),   // same session (gap 10m)
        StreamEv(3, ts(60), 1, "click", 1.0))  // new session (gap 50m)
      q.processAllAvailable()
      in.addData(StreamEv(9, ts(400), 2, "click", 0.0))  // advance watermark
      q.processAllAvailable()
      val sessions = spark.table("sessions_out")
        .where($"user_id" === 1).select("n_events")
        .as[Long].collect().sorted
      assert(sessions.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("StatefulFunnel: per-user stage advances across micro-batches " +
      "with strict-order semantics and O(1) state") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[graft.streaming.FunnelEvent]
    val q = graft.streaming.StatefulFunnel.progress(in.toDS(),
        Seq("view", "click", "purchase"))
      .toDF().writeStream.format("memory").queryName("funnel_out")
      .outputMode("update").start()
    try {
      import graft.streaming.FunnelEvent
      // batch 1: u1 view@0; u2 view@2 and click@2 (same ts: click must
      // NOT count — strictly-later required); u3 click@1 (no view: 0)
      in.addData(
        FunnelEvent(1L, ts(0), "view"),
        FunnelEvent(2L, ts(2), "view"),
        FunnelEvent(2L, ts(2), "click"),
        FunnelEvent(3L, ts(1), "click"))
      q.processAllAvailable()
      // batch 2: u1 click@2 — state carried from batch 1 advances to 2
      in.addData(FunnelEvent(1L, ts(2), "click"))
      q.processAllAvailable()
      // batch 3: u1 purchase@3 -> 3; u2 purchase@5 (needs click first: 1)
      in.addData(FunnelEvent(1L, ts(3), "purchase"),
        FunnelEvent(2L, ts(5), "purchase"))
      q.processAllAvailable()
      val fin = spark.table("funnel_out").groupBy($"user_id")
        .agg(org.apache.spark.sql.functions.max($"stage").as("stage"))
        .as[(Long, Long)].collect().toMap
      assert(fin === Map(1L -> 3L, 2L -> 1L, 3L -> 0L))
    } finally q.stop()
  }
}
