package graft.tools

import org.apache.spark.sql.SparkSession

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
    val g = graft.SparkEntry.graph(spark, dir)
    val edges = g.khop(types = Seq("FROM_NATION", "IN_REGION"))
    time("twoHopEdges count")(edges.count())
    time("khop_2 agg")(graft.SparkEntry.queries("khop_2")(spark, dir).count())
    time("chunk declarative")(
      graft.operators.KHop.chunk(edges, 100).count())
    time("chunk native")(
      graft.operators.KHop.chunkNative(edges, 100).count())
    spark.stop()
  }
}
