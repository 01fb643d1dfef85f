package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Continuous k-hop maintenance over a relationship CHANGELOG — the
  * streaming analog of the reference's long-running ticketed k-hop export
  * streams (Producer.java keeps a ticket open and streams chunks as the
  * job progresses; here the "job" never ends and the 2-hop edge set stays
  * current as edges arrive).
  *
  * Design: the reference's 2-hop edge set (KHOP.md:105-124) is
  * `result(o) = edges incident to any neighbor of o`. That is a JOIN of
  * two derivations of the edge stream — origin→neighbor pairs against
  * neighbor→incident-edge triples — so its incremental maintenance is
  * exactly Spark's stream-stream inner join: each side's join STATE is
  * the adjacency/incidence store, and a new edge arriving on either side
  * automatically pairs with all matching OLD state rows (the Δ⋈E ∪ E⋈Δ
  * maintenance terms), with no hand-rolled state operator at all. This is
  * the Spark-first shape: `transformWithState` keys cannot look up other
  * keys' state (origin o's update needs neighbor n's incident edges), but
  * a join's distributed state does precisely that.
  *
  * Scale (100 TB): join state is partitioned by the equality key (the
  * mid node n), so hot hubs shard across partitions only by key — the
  * same supernode caveat as the batch path; mitigate upstream with the
  * degree split of [[graft.operators.KHop.twoHopEdgesSkew]]. Edges are
  * facts (never late, never retracted here), so no watermark bounds the
  * state: retention IS the product — the operator maintains the full
  * 2-hop view for as long as it runs, like any materialized view. Output
  * is append-only pairs; exact dedup/aggregation happens on the sink
  * table (a downstream reader's `DISTINCT`), keeping the streaming
  * topology single-stateful-operator. */
object GraphStreams {

  /** The 2-hop incidence join as a pure plan over (src, dst) edge
    * DataFrames — batch or streaming. `reach` and `incid` must be two
    * INDEPENDENT derivations of the same edge feed (for streaming: two
    * separate `readStream`s over the same file source), or Spark will
    * refuse the self-join. Output (origin, src, dst) is a MULTISET —
    * one row per (origin, mid-node, edge) witness; readers dedup. */
  def twoHopEdgesPlan(reach: DataFrame, incid: DataFrame): DataFrame = {
    val nb = reach.select(col("src").as("o"), col("dst").as("n"))
      .unionByName(reach.select(col("dst").as("o"), col("src").as("n")))
    val inc = incid.select(col("src").as("m"), col("src"), col("dst"))
      .unionByName(incid.select(col("dst").as("m"), col("src"), col("dst")))
    nb.join(inc, col("n") === col("m"))
      .select(col("o").as("origin"), col("src"), col("dst"))
  }

  /** Stage an edge table as `nSlices` mtime-ordered parquet files under
    * `base/src` (slice = src mod nSlices — deterministic), so a
    * `maxFilesPerTrigger = 1` file source replays the table as an
    * nSlices-batch CHANGELOG: later batches' edges must pair with
    * earlier batches' join state, exercising genuine incremental
    * maintenance rather than a one-shot batch join. */
  def stageEdgeChangelog(edges: DataFrame, base: String,
                         nSlices: Int): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val src = s"$base/src"
    Files.createDirectories(Paths.get(src))
    for (i <- 0 until nSlices) {
      val tmp = s"$base/stage$i"
      edges.where(pmod(col("src"), lit(nSlices.toLong)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Paths.get(tmp).toFile.listFiles
        .find(_.getName.endsWith(".parquet")).get.toPath
      val dest = Paths.get(src, f"$i%02d.parquet")
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(1000000L * (i + 1)))
    }
    src
  }

  /** Run the continuous 2-hop view over a staged edge changelog to a
    * memory sink (AvailableNow — drains every staged batch through the
    * incremental join, then stops) and return the DEDUPED per-origin
    * edge sets as (origin, src, dst). `schema` must match the staged
    * files. */
  def twoHopOverChangelog(s: SparkSession, srcDir: String,
                          tag: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("src", LongType),
      StructField("dst", LongType)))
    def feed = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val joined = twoHopEdgesPlan(feed, feed)
    val qname = s"graft_stream_khop_${tag}_${System.nanoTime()}"
    // state stores open per shuffle partition per micro-batch; 8 keeps
    // the fixed cost proportionate (same rationale as the stream-join
    // gates) while still exercising distributed state
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, "8")
    try {
      val q = joined.writeStream.format("memory").queryName(qname)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally s.conf.set(key, prev)
    s.table(qname).distinct()
  }
}
