package graft.tools

import org.apache.spark.sql.SparkSession

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
    println(graft.SparkEntry.entry(spark).count())
    spark.stop()
  }
}
