package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-window range join (§2.7 gap): for each left row, aggregate the
  * right rows with the same key whose timestamp falls in
  * `[l.ts - window, l.ts)`.
  *
  * The naive formulation — `l JOIN r ON key AND r.ts < l.ts AND r.ts >=
  * l.ts - w` — is an inequality join Spark executes as a per-key nested
  * loop. Instead both sides are bucketed by `window`-sized time bins and
  * joined on (key, bucket) ∈ {b, b−1}: any right row within the window is
  * in the left row's bucket or the one before, so the equi-join + residual
  * filter is exact while touching only O(density per 2 buckets) candidate
  * pairs — the standard interval-bucketing range join, AQE-compatible. */
object RangeJoin {

  /** Count right rows per left row within the trailing window.
    * Output: left's `leftId` column + `n` (0 when none). */
  def countPriorWithin(left: DataFrame, right: DataFrame, key: String,
                       ts: String, leftId: String,
                       windowMicros: Long): DataFrame = {
    val l = left.select(col(leftId).as("_lid"), col(key).as("_k"),
        unix_micros(col(ts)).as("_lt"))
      .withColumn("_b", explode(array(
        floor(col("_lt") / windowMicros),
        floor(col("_lt") / windowMicros) - 1)))
    val r = right.select(col(key).as("_k"), unix_micros(col(ts)).as("_rt"))
      .withColumn("_b", floor(col("_rt") / windowMicros))
    l.join(r, Seq("_k", "_b"), "left_outer")
      .withColumn("_hit",
        col("_rt").isNotNull && col("_rt") < col("_lt") &&
          col("_rt") >= col("_lt") - windowMicros)
      .groupBy(col("_lid").as(leftId))
      .agg(sum(when(col("_hit"), 1L).otherwise(0L)).as("n"))
  }
}
