package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway plan-dissection harness — edit freely while profiling; see
  * ArrowBench for the recorded Arrow-egress benchmark. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // does a hash-repartitioned + localCheckpointed table keep its
    // partitioning through a subsequent equi-join (one Exchange on the
    // other side only)?
    val e = spark.range(3000000)
      .select(col("id").as("src"), (col("id") * 7 % 100).as("dst"))
      .repartition(8, col("src")).localCheckpoint(true)
    val lvl = spark.range(3000000).select(col("id").as("src"), lit(0L).as("lvl"))
    val j = e.join(lvl, "src")
    j.write.format("noop").mode("overwrite").save()
    val plan = j.queryExecution.executedPlan.toString
    val n = "Exchange".r.findAllIn(plan).length
    println(s"[probe] exchanges_in_plan=$n")
    plan.linesIterator.filter(l => l.contains("Exchange") ||
      l.contains("Scan ExistingRDD")).foreach(l => println("[probe] " + l.trim.take(120)))
    spark.stop()
  }
}
