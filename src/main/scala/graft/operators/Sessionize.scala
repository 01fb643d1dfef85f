package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (batch twin of Structured Streaming session
  * windows — §2.7 streaming coverage). Assigns a session index per key:
  * a new session starts when the gap to the previous event exceeds
  * `gapMicros`. One shuffle on the key, two streaming window passes
  * (lag + running sum) over the same partitioning — Catalyst plans a
  * single exchange + sort. */
object Sessionize {

  def sessionize(events: DataFrame, key: String, ts: String,
                 tiebreak: String, gapMicros: Long): DataFrame = {
    val withGap = events
      .withColumn("_tus", unix_micros(col(ts)))
      .withColumn("_prev", lag(col("_tus"), 1).over(
        Window.partitionBy(col(key)).orderBy(col("_tus"), col(tiebreak))))
      .withColumn("_new",
        when(col("_prev").isNull ||
          col("_tus") - col("_prev") > gapMicros, 1L).otherwise(0L))
    withGap
      .withColumn("session_id", sum(col("_new")).over(
        Window.partitionBy(col(key)).orderBy(col("_tus"), col(tiebreak))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_tus", "_prev", "_new")
  }
}
