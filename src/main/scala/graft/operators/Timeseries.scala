package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization — turning an irregular event stream into
  * the fixed-grid per-entity series a sequence model trains on. */
object Timeseries {

  /** Gaps-and-islands: merge overlapping-or-touching [start, end]
    * intervals per key into maximal islands — the classic
    * coverage/availability analytics (uptime spans, sensor coverage,
    * validity-range consolidation). An island opens where an interval's
    * start strictly exceeds the running max of all prior ends; island id
    * = running count of opens. Integer ordinates only (days, µs) —
    * exact in any engine.
    *
    * Scale: both windows partition BY KEY and order by (start, end) —
    * state is bounded by one key's interval count, the semantics'
    * inherent serial section (same bound as SCD2's history window).
    * Exact-duplicate intervals are RANGE-frame peers, so both engines
    * assign them the same island. Returns (key, isl, island_start,
    * island_end, n_intervals). */
  def mergeIntervals(df: DataFrame, key: String, start: String,
                     end: String): DataFrame = {
    val wPrev = Window.partitionBy(col(key))
      .orderBy(col(start), col(end))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col(key)).orderBy(col(start), col(end))
    df.select(col(key), col(start).as("s"), col(end).as("e"))
      .withColumn("pmax", max(col("e")).over(wPrev))
      .withColumn("isl",
        sum(when(col("pmax").isNull || col("s") > col("pmax"), 1L)
          .otherwise(0L)).over(wRun))
      .groupBy(col(key), col("isl"))
      .agg(min(col("s")).as("island_start"),
        max(col("e")).as("island_end"),
        count(lit(1)).as("n_intervals"))
  }

  /** Resample to a fixed period and forward-fill gaps: bucket events by
    * `bucketUs` microseconds of event time, keep each (entity, bucket)'s
    * latest observation (recency = the unique `seq` id, the changelog
    * convention — no float arithmetic touches the value, so it stays
    * bit-exact), densify each entity's grid from its first to its last
    * observed bucket with a `sequence` generator (never a driver loop),
    * and carry the last observation across empty buckets.
    *
    * Scale: one hash aggregate (map-side combined) + a generator + one
    * per-entity window ORDERED BY BUCKET — the window's partition is the
    * entity's GRID length (time span / period, a constant chosen by the
    * caller), not its event count, so a hot entity with a billion events
    * costs the same window state as a cold one. Leading buckets are
    * always observed by construction (the grid starts at the entity's
    * first observation), so `v_filled` is never null.
    *
    * Returns (entity, bucket, n_events, v_filled). */
  def resampleFfill(events: DataFrame, entity: String, ts: String,
                    seq: String, value: String, bucketUs: Long): DataFrame = {
    val agg = events
      .select(col(entity).as("e"),
        expr(s"unix_micros($ts) div ${bucketUs}L").as("b"),
        col(seq).as("s"), col(value).as("v"))
      .groupBy(col("e"), col("b"))
      .agg(max(struct(col("s"), col("v"))).as("m"),
        count(lit(1)).as("n_events"))
      .select(col("e"), col("b"), col("m.v").as("v_obs"), col("n_events"))
    val grid = agg.groupBy(col("e"))
      .agg(min(col("b")).as("b0"), max(col("b")).as("b1"))
      .select(col("e"), explode(sequence(col("b0"), col("b1"))).as("b"))
    val w = Window.partitionBy(col("e")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("e", "b"), "left")
      .select(col("e").as(entity), col("b").as("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("v_obs"), ignoreNulls = true).over(w).as("v_filled"))
  }

  /** Lag + rolling-window features over a regular per-entity grid (the
    * output shape of [[resampleFfill]]) — the feature-engineering step a
    * forecasting/training pipeline runs after regularization. The value
    * is quantized to int64 cents FIRST, so every lag and the rolling sum
    * are exact integers: a rolling sum of raw doubles depends on the
    * engine's accumulation order in the frame, cents do not.
    *
    * Same bounded-window economics as [[resampleFfill]]: partitions are
    * grid-sized. Leading rows where a lag reaches before the grid hold
    * NULL (the model masks them), the rolling sum shrinks its frame.
    * Returns (entity, bucket, v_cents, lag_<k>… , roll<rollK>_sum). */
  /** Day-of-week seasonal profile — the seasonal-naive baseline an
    * anomaly detector compares against: bucket events to days, then for
    * each (key, day mod 7) report observed day count, total events, and
    * the exact integer mean (⌊1000·total/n_days⌋). Two hash aggregates,
    * the second over the key×7 profile — nothing data-sized crosses a
    * shuffle twice. Returns (key, dow, n_days, total, mean_milli). */
  def seasonalProfile(events: DataFrame, key: String,
                      ts: String): DataFrame = {
    val daily = events
      .groupBy(col(key),
        expr(s"unix_micros($ts) div 86400000000L").as("day"))
      .agg(count(lit(1)).as("cnt"))
    daily.groupBy(col(key), (col("day") % 7).as("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("cnt")).as("total"))
      .select(col(key), col("dow"), col("n_days"), col("total"),
        expr("total * 1000 div n_days").as("mean_milli"))
  }

  /** Daily-count anomaly detection by median absolute deviation — the
    * robust outlier flag for volume monitoring (a mean/stddev z-score is
    * dragged toward the very spikes it hunts; medians are not). All
    * arithmetic is int64-exact: lower medians by the exact rank test
    * (value at row_number (n+1) div 2 under a deterministic order), flag
    * days where |cnt − med| > k·MAD strictly — so MAD = 0 still flags
    * every deviating day of an otherwise-constant series.
    *
    * Scale: the corpus-sized input collapses in the FIRST aggregate to
    * one row per (key, day); both median windows run over that profile,
    * bounded by keys × days, never by event volume. Returns flagged
    * (key, day, cnt, med, mad, dev). */
  def anomalyMad(events: DataFrame, key: String, ts: String,
                 k: Long = 3L): DataFrame = {
    val daily = events
      .groupBy(col(key),
        expr(s"unix_micros($ts) div 86400000000L").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val wKey = Window.partitionBy(col(key))
    def lowerMedian(df: DataFrame, v: String, out: String): DataFrame = {
      val ranked = df.withColumn("rn",
          row_number().over(wKey.orderBy(col(v), col("day"))))
        .withColumn("n", count(lit(1)).over(wKey))
      ranked
        .withColumn(out,
          max(when(col("rn") === expr("(n + 1) div 2"), col(v)))
            .over(wKey))
        .drop("rn", "n")
    }
    val withMed = lowerMedian(daily, "cnt", "med")
      .withColumn("dev", abs(col("cnt") - col("med")))
    lowerMedian(withMed, "dev", "mad")
      .where(col("dev") > lit(k) * col("mad"))
      .select(col(key), col("day"), col("cnt"), col("med"), col("mad"),
        col("dev"))
  }

  /** CUSUM changepoint detection over daily counts: per key, the day
    * maximizing |Σ_{i≤t} (cnt_i·1000 − mean_milli)| — the cumulative-sum
    * statistic peaks where the series' level shifts (Page 1954). All
    * int64: counts milli-scaled against the exact integer mean so the
    * running sum never sees a fraction; ties broken to the earliest day.
    *
    * Scale: same shape as [[anomalyMad]] — events collapse to the
    * (key, day) profile first; the running-sum window and the argmax
    * aggregate run over that profile only. Returns one row per key:
    * (key, cp_day, cusum_at_cp, n_days). */
  def changepointCusum(events: DataFrame, key: String, ts: String)
      : DataFrame = {
    val daily = events
      .groupBy(col(key),
        expr(s"unix_micros($ts) div 86400000000L").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val wKey = Window.partitionBy(col(key))
    val wRun = wKey.orderBy(col("day"))
    val withMean = daily
      .withColumn("total", sum(col("cnt")).over(wKey))
      .withColumn("n_days", count(lit(1)).over(wKey))
      .withColumn("mean_milli", expr("total * 1000 div n_days"))
    val cusum = withMean.withColumn("cusum",
      sum(col("cnt") * 1000L - col("mean_milli")).over(wRun))
    cusum.groupBy(col(key))
      .agg(max(struct(abs(col("cusum")).as("a"), (-col("day")).as("nd"),
          col("cusum").as("c"))).as("best"),
        max(col("n_days")).as("n_days"))
      .select(col(key), (-col("best.nd")).as("cp_day"),
        col("best.c").as("cusum_at_cp"), col("n_days"))
  }

  def lagFeatures(series: DataFrame, entity: String, bucket: String,
                  value: String, lags: Seq[Int], rollK: Int): DataFrame = {
    require(lags.nonEmpty && rollK >= 1, "need lags and rollK >= 1")
    val w = Window.partitionBy(col(entity)).orderBy(col(bucket))
    val wRoll = w.rowsBetween(-(rollK - 1L), Window.currentRow)
    val base = series.select(col(entity), col(bucket),
      floor(col(value) * 100 + 0.5).cast("long").as("v_cents"))
    base.select(
      Seq(col(entity), col(bucket), col("v_cents")) ++
        lags.map(l => lag(col("v_cents"), l).over(w).as(s"lag_$l")) :+
        sum(col("v_cents")).over(wRoll).as(s"roll${rollK}_sum"): _*)
  }
}
