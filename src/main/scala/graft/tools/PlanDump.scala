package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-11 plan capture: writes `.explain("formatted")` for named
  * SparkEntry queries to plans/r11/<query>_<suffix>.txt so the
  * optimization evidence (Exchange counts, join strategies, pushed
  * filters) is committed alongside the code.
  *
  * Usage: runMain graft.tools.PlanDump <suffix> <q1,q2,...>
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  *
  * Note: queries that materialize eagerly (localCheckpoint brackets,
  * streaming replays) surface only their final aggregate-over-checkpoint
  * here; for those the operator-level plan is captured separately in the
  * OPTIMIZATION_r11.md notes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get("plans/r11"))
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r11/${n}_$suffix.txt"), plan)
      println(s"[plandump] wrote plans/r11/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
