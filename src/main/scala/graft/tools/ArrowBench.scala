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
    spark.stop()
  }
}
