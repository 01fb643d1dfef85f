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
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq("sql_q2")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val bad = Seq("CartesianProduct", "BroadcastNestedLoop")
        .filter(plan.contains)
      println(s"[scratch] $n joins=" +
        plan.linesIterator.filter(_.contains("Join")).map(_.trim.takeWhile(_ != '(')).mkString("|") +
        s" BAD=${bad.mkString(",")}")
    }
    spark.stop()
  }
}
