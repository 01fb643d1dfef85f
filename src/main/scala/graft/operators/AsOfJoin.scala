package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — a §2.7 gap in the reference, required
  * for event-stream enrichment at scale.
  *
  * Implemented as the scalable union-merge formulation rather than an
  * inequality join: tag both sides, union, and take the last right-side row
  * strictly preceding each left row in (ts, tag, tiebreak) order within the
  * key partition. This is one shuffle on the key + a single window pass —
  * O(n log n) per key — whereas a naive `l JOIN r ON l.key = r.key AND
  * r.ts < l.ts` explodes to O(n·m) pairs before the filter. At 100 TB the
  * shuffle partitions by key; the window streams within each partition with
  * a constant-size frame state (last non-null), so no per-key buffering.
  */
object AsOfJoin {

  /** For each row of `left`, attach the columns of the latest `right` row
    * with the same `key` and strictly smaller `ts` (ties within `right`
    * broken by largest `tiebreak`). Left rows with no prior match keep null
    * right columns (left-outer semantics).
    *
    * @param rightCols right-side columns to carry, as (source → output name)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           tiebreak: String, rightCols: Map[String, String]): DataFrame = {
    val rightStruct = struct(rightCols.toSeq.sortBy(_._1).map {
      case (src, dst) => col(src).as(dst)
    }: _*)
    val rType = right.select(rightStruct.as("_r")).schema("_r").dataType
    val lType = left.select(struct(col("*")).as("_l")).schema("_l").dataType
    // tag 0 = left, 1 = right: at equal ts the right row sorts AFTER the
    // left row, so "rows preceding" realizes the strict r.ts < l.ts bound.
    val l = left.select(col(key).as("_k"), col(ts).as("_ts"),
      col(tiebreak).as("_tb"), lit(0).as("_tag"),
      lit(null).cast(rType).as("_r"), struct(col("*")).as("_l"))
    val r = right.select(col(key).as("_k"), col(ts).as("_ts"),
      col(tiebreak).as("_tb"), lit(1).as("_tag"), rightStruct.as("_r"),
      lit(null).cast(lType).as("_l"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_tag"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val matched = l.unionByName(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_tag") === 0)
    val leftOut = left.columns.map(c => col(s"_l.$c").as(c))
    val rightOut = rightCols.values.toSeq.sorted
      .map(c => col(s"_match.$c").as(c))
    matched.select(leftOut.toSeq ++ rightOut: _*)
  }

  /** FORWARD as-of: for each `left` row, the EARLIEST `right` row with
    * the same `key` and strictly larger `ts` (ties within `right` broken
    * by smallest `tiebreak`) — the event-to-next-outcome join (error →
    * next click, impression → next conversion), the time-reversed twin
    * of [[asOf]]. Same union-merge shape and cost: one shuffle on the
    * key, one window pass with a constant-size frame state (first
    * non-null over the following frame), never an O(n·m) inequality
    * join. At equal ts the right row sorts BEFORE the left row, so the
    * following frame realizes the strict r.ts > l.ts bound. */
  def asOfForward(left: DataFrame, right: DataFrame, key: String,
                  ts: String, tiebreak: String,
                  rightCols: Map[String, String]): DataFrame = {
    val rightStruct = struct(rightCols.toSeq.sortBy(_._1).map {
      case (src, dst) => col(src).as(dst)
    }: _*)
    val rType = right.select(rightStruct.as("_r")).schema("_r").dataType
    val lType = left.select(struct(col("*")).as("_l")).schema("_l").dataType
    val l = left.select(col(key).as("_k"), col(ts).as("_ts"),
      col(tiebreak).as("_tb"), lit(1).as("_tag"),
      lit(null).cast(rType).as("_r"), struct(col("*")).as("_l"))
    val r = right.select(col(key).as("_k"), col(ts).as("_ts"),
      col(tiebreak).as("_tb"), lit(0).as("_tag"), rightStruct.as("_r"),
      lit(null).cast(lType).as("_l"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_tag"), col("_tb"))
      .rowsBetween(1, Window.unboundedFollowing)
    val matched = l.unionByName(r)
      .withColumn("_match", first(col("_r"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)
    val leftOut = left.columns.map(c => col(s"_l.$c").as(c))
    val rightOut = rightCols.values.toSeq.sorted
      .map(c => col(s"_match.$c").as(c))
    matched.select(leftOut.toSeq ++ rightOut: _*)
  }
}
