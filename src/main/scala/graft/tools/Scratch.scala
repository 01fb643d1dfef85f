package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Dedup

/** Throwaway plan-dissection harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.codegen.fallback", "false")   // fail loud, no fallback
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $n")
    }

    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val v = e.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
    val pairs = v.as("a").join(v.as("b"),
      col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))

    time("warmup")(pairs.count())
    time("pairwise cosine HOF")(pairs
      .select(VectorFunctions.cosine(col("a.v"), col("b.v")).as("s"))
      .agg(sum(col("s"))).collect()(0))
    time("pairwise cosine fused")(pairs
      .select(VectorFunctions.cosineFast(col("a.v"), col("b.v")).as("s"))
      .agg(sum(col("s"))).collect()(0))
    time("nearDup end-to-end")(Dedup.embeddingNearDup(e, 0.4).count())
    spark.stop()
  }
}
