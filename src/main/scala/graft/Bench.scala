package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query at the given SF and
  * prints ONE bare JSON line for the harness tail-capture.
  *
  * Two constraints shape the output:
  *  - the harness keeps only the LAST ~2000 chars of stdout and the sbt
  *    "[success] Total time …" line lands after ours, so the JSON line must
  *    stay under ~1800 chars. The full per-query map no longer fits; the
  *    line carries the slowest queries (the ones compared against
  *    BASELINE.md) and the complete map goes to bench_full.json in the
  *    repo root, which the end-of-round snapshot commits.
  *  - this host's CPU throughput swings ~4× between runs (BASELINE.md), so
  *    queries ≥2 s get a second run (bounded by a global re-run budget) and
  *    report min-of-2 — single-run numbers on the heavy queries are noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // r12 (scaling evidence, VERDICT r11 #1): shuffle partitions default to
    // the core count (unchanged driver behavior), but the scaling runs
    // need them DECOUPLED — tying partitions to cores gives the low-core
    // run fewer/larger tasks and masks core-count sensitivity. The driver
    // never sets this env, so its bench is byte-identical to before.
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (task scheduling, codegen compiler, JIT) so the
    // first measured query isn't charged the cold-start cost
    spark.range(1000000).selectExpr("sum(id)").collect()

    // r12 (VERDICT r11 "what's wrong" #2): a query that crashes mid-action
    // must not silently record a bogus small time — record the failure and
    // surface it in the JSON (additions-only: existing keys unchanged, so
    // cross-round comparisons stay valid; the separate Verify/oracle run
    // remains the correctness authority).
    val failed = scala.collection.mutable.Map.empty[String, String]
    def time(name: String,
             fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case t: Throwable =>
          failed(name) = (t.getClass.getSimpleName + ": " +
            Option(t.getMessage).getOrElse("")).take(120)
      }
      (System.nanoTime() - t0) / 1e9
    }

    // local-iteration filters (the driver sets neither): BENCH_ONLY
    // restricts to a comma-separated query list; BENCH_RUNS forces
    // min-of-N on every selected query (default: the adaptive min-of-2)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet)
    val forcedRuns = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt)
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val first = qs.map { case (name, fn) => name -> time(name, fn) }
    val times = scala.collection.mutable.Map(first: _*)
    // min-of-2 for the heavy queries, slowest first, until the re-run
    // budget is spent — stabilizes exactly the numbers that dominate the
    // total and the baseline comparison
    forcedRuns match {
      case Some(n) =>
        for ((name, t1) <- first; _ <- 2 to n)
          times(name) = math.min(times(name),
            time(name, SparkEntry.queries(name)))
      case None =>
        var rerunBudget = 300.0
        for ((name, t1) <- first.sortBy(-_._2)
             if t1 >= 2.0 && t1 <= rerunBudget) {
          val t2 = time(name, SparkEntry.queries(name))
          rerunBudget -= t2
          times(name) = math.min(t1, t2)
        }
    }

    // Locale.ROOT: the default-locale formatter writes "1,234" under
    // comma-decimal locales, which would corrupt the JSON line
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val total = times.values.sum
    val entries = times.toSeq.sortBy { case (_, v) => -v }
      .map { case (k, v) => s"\"" + k + "\":" + f3(v) }

    // full map → repo file (sorted by name for stable diffs)
    val fullQs = times.toSeq.sortBy(_._1)
      .map { case (k, v) => s"  \"" + k + "\":" + f3(v) }
      .mkString("{\n", ",\n", "\n}")
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val failedJson = failed.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val full = s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir","n_queries":${times.size},"rerun_min2_threshold_sec":2.0,"n_failed":${failed.size},"queries_failed":$failedJson,"queries":$fullQs}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_full.json"), full + "\n")

    // stdout line: greedy slowest-first fill under the tail-window budget
    val overheadFmt = (q: String) =>
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$q,"queries_omitted":%d,"full":"bench_full.json","sf":"$sfDir","n_queries":${times.size},"n_failed":${failed.size},"total_sec":${f3(total)}}"""
    val maxLine = 1750
    val kept = new StringBuilder("{")
    var nKept = 0
    for (e <- entries) {
      val add = (if (nKept == 0) "" else ",") + e
      if (overheadFmt("").length + kept.length + add.length + 1 <= maxLine) {
        kept.append(add); nKept += 1
      }
    }
    kept.append("}")
    // stop FIRST: the tail-capture must end with our line, and shutdown
    // log chatter after it would push the line's head out of the window
    spark.stop()
    println(overheadFmt(kept.toString).format(times.size - nKept))
  }
}
