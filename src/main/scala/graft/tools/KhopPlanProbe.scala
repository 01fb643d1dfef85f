package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dumps the OPERATOR-LEVEL formatted plan for the khop_3_dense gate
  * (the declared query materializes inside a checkpoint bracket, so its
  * own explain is just a scan of the checkpoint): the un-bracketed
  * edges+aggregate plan (suffix arg "before") or the stats-pushdown plan
  * ("after"), persist=false so the full tree is visible.
  *
  * Usage: runMain graft.tools.KhopPlanProbe <before|after>
  */
object KhopPlanProbe {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rels = graft.SparkEntry.graph(spark, sfDir).rels
      .where(col("TYPE").isin("CONTAINS", "SUPPLIED_BY"))
    val pred = Some(col("origin").between(2000000000L, 2999999999L) &&
      col("origin") % 500 < 20)
    val f = (src: org.apache.spark.sql.Column,
             dst: org.apache.spark.sql.Column) =>
      (src % 100003L) * 100003L + (dst % 100003L)
    val df =
      if (suffix == "before")
        graft.operators.KHop.kHopEdgesSkew(rels, k = 3, hotThreshold = 256,
            originPred = pred, persist = false)
          .groupBy(col("origin"))
          .agg(count(lit(1)).as("n_edges"),
            sum(f(col("src"), col("dst"))).as("checksum"))
      else
        graft.operators.KHop.kHopStatsSkew(rels, k = 3, hotThreshold = 256,
          originPred = pred, f = f, persist = false)
    Files.createDirectories(Paths.get("plans/r11"))
    Files.writeString(Paths.get(s"plans/r11/khop_3_dense_$suffix.txt"),
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    println(s"[plandump] wrote plans/r11/khop_3_dense_$suffix.txt")
    spark.stop()
  }
}
