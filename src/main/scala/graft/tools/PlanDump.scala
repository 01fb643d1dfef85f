package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan capture (rounds 11/12): writes `.explain("formatted")` for named
  * SparkEntry queries to plans/<round>/<query>_<suffix>.txt so the
  * optimization evidence (Exchange counts, join strategies, pushed
  * filters) is committed alongside the code.
  *
  * Usage: runMain graft.tools.PlanDump <suffix> <q1,q2,...>
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_PLANS_DIR (default plans/r12).
  *
  * Note: queries that materialize eagerly (localCheckpoint brackets,
  * streaming replays) surface only their final aggregate-over-checkpoint
  * here; for the iterative loop operators the per-iteration loop-body
  * plan is captured by [[LoopPlan]] (enabled via the same runs — see
  * LoopPlanDump).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(",").toSeq
    val plansDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r12")
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
    Files.createDirectories(Paths.get(plansDir))
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$plansDir/${n}_$suffix.txt"), plan)
      println(s"[plandump] wrote $plansDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
