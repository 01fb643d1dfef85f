package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (tests fork a single JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // local[4, 4]: 4 threads, maxFailures=4 — task retries ENABLED so
      // RetryDeterminismSpec can inject first-attempt failures; behavior
      // is identical to local[4] unless a task actually fails (and a
      // deterministic failure still propagates, after 4 attempts).
      .master("local[4, 4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
