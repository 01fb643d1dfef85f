package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

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
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val sh = docs
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), shingles(col("ws"), 3).as("sh"))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    time("shingle explode")(ex.count())
    val d = graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.3)
    time("ngramJaccard run1")(d.count())
    time("ngramJaccard run2")(d.count())
    spark.stop()
  }
}
