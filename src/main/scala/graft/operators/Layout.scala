package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multidimensional data layout — Z-order (Morton) clustering keys, the
  * lakehouse technique (Delta OPTIMIZE ZORDER, Hudi/Iceberg clustering)
  * for making ONE sort order serve range predicates on SEVERAL columns.
  * A table range-partitioned by `mortonKey(x, y)` keeps rows that are
  * close in BOTH dimensions inside the same files, so min/max file
  * statistics prune scans for filters on x, on y, or on both — where a
  * lexicographic (x, y) sort prunes only x. At 100 TB this is the
  * difference between reading one file group and reading the table.
  *
  * The interleave is the branch-free shift-mask spread; every op is
  * int64 `&`/`|`/`<<` on constants < 2^32, so the key is engine-exact
  * and usable as a bucketing/sort expression anywhere. */
object Layout {

  /** Spread the low 16 bits of `c` to even bit positions (0, 2, …, 30). */
  def spread16(c: Column): Column = {
    val m = c.bitwiseAND(lit(0xFFFFL))
    val a = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key interleaving two 16-bit dimensions: bit i of x
    * lands at position 2i, bit i of y at 2i+1. */
  def mortonKey(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Hilbert-curve key for two 16-bit dimensions (order-16 curve over
    * the 65536×65536 grid) — the step beyond [[mortonKey]]: the Hilbert
    * curve has NO long diagonal jumps (consecutive keys are always grid
    * neighbors), so blocks of consecutive keys cover more compact 2-D
    * regions and a box query touches fewer blocks than under Z-order —
    * the locality argument behind Hilbert clustering in lakehouse
    * engines. Standard xy→d bit transform (public domain, e.g. the
    * Wikipedia "Hilbert curve" reference implementation): walk levels
    * s = 2^15 … 1, accumulate the quadrant offset s²·((3·rx) xor ry),
    * then rotate/reflect the frame. The per-row fold is a single
    * `aggregate` higher-order expression with a (x, y, d, s) struct
    * accumulator — linear expression size, exact int64 ops, narrow. The
    * DuckDB twin replays the identical fold as a 16-step recursive CTE. */
  def hilbertKey(x: Column, y: Column): Column = {
    val init = struct(
      x.cast("long").bitwiseAND(lit(0xFFFFL)).as("x"),
      y.cast("long").bitwiseAND(lit(0xFFFFL)).as("y"),
      lit(0L).as("d"), lit(32768L).as("s"))
    aggregate(
      sequence(lit(1), lit(16)), init,
      (acc, _) => {
        val ax = acc.getField("x"); val ay = acc.getField("y")
        val ad = acc.getField("d"); val s = acc.getField("s")
        val rx = when(ax.bitwiseAND(s) =!= 0L, lit(1L)).otherwise(lit(0L))
        val ry = when(ay.bitwiseAND(s) =!= 0L, lit(1L)).otherwise(lit(0L))
        val d2 = ad + s * s * (rx * 3L).bitwiseXOR(ry)
        val fx = when(rx === 1L, lit(65535L) - ax).otherwise(ax)
        val fy = when(rx === 1L, lit(65535L) - ay).otherwise(ay)
        struct(
          when(ry === 0L, fy).otherwise(ax).as("x"),
          when(ry === 0L, fx).otherwise(ay).as("y"),
          d2.as("d"), shiftright(s, 1).as("s"))
      },
      _.getField("d"))
  }

  /** 2-D BOX-query audit of a candidate physical order — the question a
    * box predicate (`x BETWEEN … AND y BETWEEN …`) asks of every
    * clustering choice: under this row order, how many `blockRows`-row
    * blocks does a min/max-stats reader scan, and how many rows do they
    * hold vs the rows that actually match? Run once per candidate
    * (lexicographic / Morton / Hilbert) and compare `blocks_scanned` —
    * the measurable form of the curve-locality argument, computed from
    * the data before paying for a 100 TB rewrite. Global block ranks
    * use the DISTRIBUTED prefix-sum rank (ScaleOps.globalRank), never a
    * single-partition window. One row out:
    * (layout, n_rows, n_blocks, blocks_scanned, rows_scanned,
    * rows_matched). */
  def boxQueryAudit(df: DataFrame, layoutName: String,
                    orderKeyOf: (Column, Column) => Column,
                    tiebreak: Column, x: Column, y: Column,
                    xLo: Long, xHi: Long, yLo: Long, yHi: Long,
                    blockRows: Long): DataFrame = {
    // r11 opt: the curve key (for Hilbert, a 16-round interpreted fold
    // per row) used to be computed inside the scan stage — one task on a
    // single-split input — and then AGAIN when globalRank's
    // repartitionByRange sampled its child. Project the two coordinates
    // narrowly, spread them across the cores (explicit N: exempt from
    // AQE's input-size-based coalescing), compute the key once there,
    // and pin it with a checkpoint so the range sampler reads memory
    // instead of re-evaluating the fold. At scale the scan has ≥ cores
    // splits and the repartition is a parallelism floor, not a reorg.
    val dp = df.sparkSession.sparkContext.defaultParallelism
    val base = df
      .select(x.cast("long").as("_x"), y.cast("long").as("_y"),
        tiebreak.cast("long").as("_t"))
      .repartition(dp, col("_t"))
      .withColumn("_k", orderKeyOf(col("_x"), col("_y")).cast("long"))
      .localCheckpoint(true)
    val ranked = ScaleOps.globalRank(base, Seq(col("_k"), col("_t")))
    val inBox = col("_x").between(xLo, xHi) && col("_y").between(yLo, yHi)
    val blocks = ranked
      .withColumn("_blk", expr(s"(_rank - 1) div ${blockRows}L"))
      .groupBy(col("_blk"))
      .agg(min(col("_x")).as("xmn"), max(col("_x")).as("xmx"),
        min(col("_y")).as("ymn"), max(col("_y")).as("ymx"),
        count(lit(1)).as("n"),
        sum(when(inBox, 1L).otherwise(0L)).as("hit"))
    val scanned = col("xmn") <= xHi && col("xmx") >= xLo &&
      col("ymn") <= yHi && col("ymx") >= yLo
    blocks.agg(
      sum(col("n")).as("n_rows"),
      count(lit(1)).as("n_blocks"),
      sum(when(scanned, 1L).otherwise(0L)).as("blocks_scanned"),
      sum(when(scanned, col("n")).otherwise(0L)).as("rows_scanned"),
      sum(col("hit")).as("rows_matched"))
      .select(lit(layoutName).as("layout"), col("n_rows"),
        col("n_blocks"), col("blocks_scanned"), col("rows_scanned"),
        col("rows_matched"))
  }

  /** Layout audit for a prospective two-dimensional clustering: assign
    * each row its Morton key, group into `2^(32-bitsPerBlock)`-key blocks
    * (≈ target file groups), and report per-block row counts and per-
    * dimension min/max — exactly the file statistics a reader would prune
    * on. Tight per-block ranges in BOTH dimensions are the clustering
    * win; the audit makes it measurable (and oracle-checkable) before
    * rewriting a 100 TB table. */
  def zorderAudit(df: DataFrame, x: Column, y: Column,
                  bitsPerBlock: Int): DataFrame =
    df.select(x.cast("long").as("x"), y.cast("long").as("y"))
      .select(col("x"), col("y"),
        shiftright(mortonKey(col("x"), col("y")), bitsPerBlock).as("block"))
      .groupBy(col("block"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))

  /** Compaction planning — the small-files problem at table scale:
    * given a file inventory (partition, file id, size), assign each file
    * to a merge group so groups approach `target` bytes, scanning files
    * in id order within a partition (the deterministic order a compactor
    * would rewrite them). group_id = (bytes before this file) div target
    * — the standard cumulative-fill plan: every group except a
    * partition's last reaches `target` once the file that crosses the
    * boundary lands in it.
    *
    * Scale: the window is per table-partition over FILE METADATA (one
    * row per file, never data rows) — ≤ a partition's file count,
    * exactly what a metastore listing returns; planning a million-file
    * table is a million-row job. Returns (partition, file_id, size,
    * group_id). */
  /** Range-partition split planner — the exact-integer version of the
    * boundary sampling Spark's RangePartitioner does: the i-th boundary
    * (i = 1..splits−1) is the SMALLEST value v with
    * count(rows ≤ v)·splits ≥ i·N, so each of the `splits` ranges holds
    * ~N/splits rows. The same rank test as the quantile gates — no
    * floats, any engine agrees. Returns (split_i, boundary).
    *
    * Scale: one hash aggregate to the VALUE DISTRIBUTION (bounded by
    * distinct values, not rows), a cumsum window over that distribution,
    * and a broadcast join against the splits-1 rank thresholds. */
  def rangeSplitPlan(df: DataFrame, value: Column,
                     splits: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dist = df.select(value.as("v")).groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
    val cum = dist
      .withColumn("n_le", sum(col("cnt")).over(w))
      .join(broadcast(dist.agg(sum(col("cnt")).as("n"))), lit(true))
    val ranks = (1 until splits).map(_.toLong).toDF("split_i")
    cum.join(broadcast(ranks),
        col("n_le") * splits >= col("split_i") * col("n"))
      .groupBy(col("split_i"))
      .agg(min(col("v")).as("boundary"))
  }

  /** Column-encoding advisor — the write-path statistic a lakehouse
    * writer consults before choosing parquet encodings: per column,
    * exact row count, distinct count, RUN count (value changes within
    * each row group, in write order), and total string length; the
    * suggestion is dictionary when distinct·20 ≤ n, RLE when runs·4 ≤ n,
    * plain otherwise — integer thresholds, no estimates. Non-null
    * columns only (TPC-H columns are). Returns (col_name, n,
    * n_distinct, n_runs, total_len, suggestion), one row per column.
    *
    * Scale: run counting windows WITHIN row groups (bounded partitions,
    * the writer's actual memory unit), never a global sort; each column
    * is one aggregate; k columns union k one-row results. */
  def encodingAdvisor(df: DataFrame, order: Column, rowGroup: Column,
                      cols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("rg")).orderBy(col("ord"))
    val parts = cols.map { c =>
      df.select(rowGroup.as("rg"), order.as("ord"),
          col(c).cast("string").as("v"))
        .withColumn("chg",
          when(lag(col("v"), 1).over(w).isNull ||
            lag(col("v"), 1).over(w) =!= col("v"), 1L).otherwise(0L))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("v")).as("n_distinct"),
          sum(col("chg")).as("n_runs"),
          sum(length(col("v"))).as("total_len"))
        .select(lit(c).as("col_name"), col("n"), col("n_distinct"),
          col("n_runs"), col("total_len"))
    }
    parts.reduce(_ unionByName _)
      .withColumn("suggestion",
        when(col("n_distinct") * 20 <= col("n"), "dict")
          .when(col("n_runs") * 4 <= col("n"), "rle")
          .otherwise("plain"))
  }

  def compactionPlan(files: DataFrame, part: String, fileId: String,
                     size: String, target: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(part)).orderBy(col(fileId))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files.select(col(part), col(fileId), col(size).cast("long").as(size))
      .withColumn("cum", sum(col(size)).over(w))
      .selectExpr(part, fileId, size,
        s"(cum - $size) div ${target}L AS group_id")
  }
}
