package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway plan-dissection harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    spark.range(1000000).selectExpr("sum(id)").collect()
    val rels = graft.SparkEntry.graph(spark, dir).rels
      .where(col("TYPE").isin("FROM_NATION", "IN_REGION"))
    // interleave to cancel machine drift
    for (round <- 1 to 2) {
      time(s"joins plan r$round")(graft.operators.KHop.twoHopEdges(rels).count())
      time(s"csr plan r$round")(graft.operators.KHop.twoHopEdgesCsr(rels).count())
    }
    spark.stop()
  }
}
