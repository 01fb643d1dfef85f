package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway plan-dissection harness — edit freely while profiling; see
  * ArrowBench for the recorded Arrow-egress benchmark. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rels = graft.SparkEntry.graph(spark, dir).rels
      .where(col("TYPE").isin("CONTAINS", "SUPPLIED_BY"))
      .localCheckpoint(true)
    def time[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val pred = Some(col("origin").between(2000000000L, 2999999999L) &&
      col("origin") % 50 === 0)
    time("ktruss_gate") {
      println("[probe] rows=" +
        graft.SparkEntry.queries("ktruss")(spark, dir).count())
    }
    spark.stop()
  }
}
