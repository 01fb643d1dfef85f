package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Storage-layout and maintenance operators for the 100 TB regime — the
  * patterns that decide whether a petabyte job reads a petabyte or a few
  * terabytes: zone-map (min/max block statistics) file skipping, global
  * physical ordering without a single-partition sort, and incremental
  * aggregate maintenance that folds a day's delta into yesterday's
  * partials instead of rescanning the base. These generalize the
  * reference's write-side layout concerns (its GDS store keeps nodes and
  * adjacency on one dense-id layout, `GdsWriteJob.java:448-537`) to the
  * durable, file-backed form a Spark lake uses. */
object ScaleOps {

  /** Exact global 1-based rank of every row under `order` — WITHOUT a
    * global window. A bare `row_number() OVER (ORDER BY ...)` moves the
    * whole table through ONE task; here the plan is: range-repartition on
    * the order key (so partitions tile the sort order), a per-partition
    * running count, and each partition's base offset = sum of prior
    * partitions' row counts — a #partitions-row table, broadcast back.
    * Same distributed-prefix-sum shape as `GraphRef.csrOffsets`.
    *
    * `order` must be a total order (tie-free) for the rank to be
    * deterministic; pass a unique tie-breaker as the last column.
    * Output: input columns + `_rank`. Range boundaries come from
    * sampling and vary run to run; the OUTPUT is partition-invariant
    * because the global rank is. */
  def globalRank(df: DataFrame, order: Seq[Column]): DataFrame = {
    // localCheckpoint pins the sampled range boundaries: the row stream
    // and the per-partition totals below must see ONE pid assignment
    val part = df.repartitionByRange(order: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val withLocal = part.withColumn("_local_rn",
      row_number().over(
        Window.partitionBy(col("_pid")).orderBy(order: _*)))
    val bases = part.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_ptotal"))
      .withColumn("_base",
        coalesce(sum(col("_ptotal")).over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_base"))
    withLocal.join(broadcast(bases), "_pid")
      .withColumn("_rank", col("_base") + col("_local_rn"))
      .drop("_pid", "_local_rn", "_base")
  }

  /** Zone-map (min/max block statistics) audit: how many row-blocks of
    * `blockRows` rows would a reader skip for the predicate
    * `value BETWEEN lo AND hi`, if the table were physically ordered by
    * `order`? This is the question behind EVERY clustering decision at
    * 100 TB — parquet row-group pruning, Delta/Iceberg data skipping,
    * Z-ordering — answered from the data itself before paying for a
    * rewrite. Run it once per candidate sort order and compare
    * `rows_scanned` (see the `file_skipping` gate: date-clustered vs
    * key-clustered layouts on the same predicate).
    *
    * Blocks are exact: global rank under `order` (distributed, see
    * [[globalRank]]), block i = ranks [i·blockRows, (i+1)·blockRows); a
    * block is scanned iff its [min,max] value interval intersects
    * [lo,hi] — precisely the zone-map test. One row out:
    * (layout, n_rows, n_blocks, blocks_scanned, rows_scanned,
    * rows_matched) — all int64. */
  def zoneMapAudit(df: DataFrame, layout: String, order: Seq[Column],
                   value: Column, lo: Long, hi: Long,
                   blockRows: Long): DataFrame = {
    val r = globalRank(df.withColumn("_v", value.cast("long")), order)
      // div, not /: Column./ on longs is double division
      .withColumn("_block", expr(s"(_rank - 1) div ${blockRows}L"))
    val blocks = r.groupBy(col("_block"))
      .agg(min(col("_v")).as("_mn"), max(col("_v")).as("_mx"),
        count(lit(1)).as("_n"),
        sum(when(col("_v").between(lo, hi), 1L).otherwise(0L)).as("_hit"))
    blocks.agg(
      sum(col("_n")).as("n_rows"),
      count(lit(1)).as("n_blocks"),
      sum(when(col("_mn") <= hi && col("_mx") >= lo, 1L).otherwise(0L))
        .as("blocks_scanned"),
      sum(when(col("_mn") <= hi && col("_mx") >= lo, col("_n"))
        .otherwise(0L)).as("rows_scanned"),
      sum(col("_hit")).as("rows_matched"))
      .select(lit(layout).as("layout"), col("n_rows"), col("n_blocks"),
        col("blocks_scanned"), col("rows_scanned"), col("rows_matched"))
  }

  /** Per-block Bloom-filter skipping audit — the point-lookup companion
    * of [[zoneMapAudit]]: min/max zones are useless for an equality
    * probe on a column UNCORRELATED with the sort order (every block's
    * range covers the probe), but a small per-block Bloom filter skips
    * almost everything. This is the data-skipping index design question
    * (Parquet bloom filters, Delta/Iceberg point-lookup stats) answered
    * from the data: for each probe key, how many blocks does each
    * mechanism scan?
    *
    * The filter is exact integer arithmetic, replayable cross-engine:
    * per value two hash bits h ∈ {v mod 2520, (31v+7) mod 2520} set in a
    * 40-word × 63-bit block bitmap (~10 bits/key at the default 256-row
    * block); a block passes a probe iff both probe bits are set.
    * PRECONDITION: values must be NON-NEGATIVE — the engine side uses
    * pmod (always ≥ 0) while the DuckDB oracle's % preserves the
    * dividend's sign, so a negative value would hash to DIFFERENT bits
    * in the two engines (they agree only on v ≥ 0, where pmod ≡ %).
    *
    * Scale: the ranked table materializes once (localCheckpoint) and
    * feeds the bitmap build and the block stats; both are hash
    * aggregates keyed by block. The bitmap table IS the persistent
    * skipping index: n/blockRows × ≤40 words, ~0.03% of an int64
    * column's size. One row per probe:
    * (probe, n_blocks, blocks_bloom, blocks_zonemap, rows_matched). */
  def bloomSkippingAudit(df: DataFrame, order: Seq[Column],
                         value: Column, probes: Seq[Long],
                         blockRows: Long = 256L): DataFrame = {
    val ranked = globalRank(df.withColumn("_v", value.cast("long")), order)
      .withColumn("_block", expr(s"(_rank - 1) div ${blockRows}L"))
      .select(col("_block"), col("_v"))
      .localCheckpoint(true)
    val bits = ranked
      .select(col("_block"), explode(array(
        pmod(col("_v"), lit(2520L)),
        pmod(col("_v") * 31L + 7L, lit(2520L)))).as("_h"))
      .select(col("_block"), expr("_h div 63").as("_w"),
        expr("shiftleft(1L, CAST(_h % 63 AS INT))").as("_b"))
      .groupBy(col("_block"), col("_w"))
      .agg(expr("bit_or(_b)").as("bits"))
      .localCheckpoint(true)
    val stats = ranked.groupBy(col("_block"))
      .agg(min(col("_v")).as("mn"), max(col("_v")).as("mx"),
        count(lit(1)).as("n"))
      .localCheckpoint(true)
    probes.map { p =>
      val h1 = p % 2520L
      val h2 = (p * 31L + 7L) % 2520L
      def pass(h: Long) = bits
        .where(col("_w") === h / 63L &&
          (col("bits").bitwiseAND(lit(1L << (h % 63L).toInt)) =!= 0L))
        .select(col("_block"))
      val bloomOk = pass(h1).intersect(pass(h2))
        .agg(count(lit(1)).as("blocks_bloom"))
      val zone = stats.agg(count(lit(1)).as("n_blocks"),
        sum(when(col("mn") <= p && col("mx") >= p, 1L).otherwise(0L))
          .as("blocks_zonemap"))
      val matched = ranked.agg(
        sum(when(col("_v") === p, 1L).otherwise(0L)).as("rows_matched"))
      zone.join(bloomOk, lit(true)).join(matched, lit(true))
        .select(lit(p).as("probe"), col("n_blocks"), col("blocks_bloom"),
          col("blocks_zonemap"), col("rows_matched"))
    }.reduce(_.unionByName(_))
  }

  /** The deterministic ring/key hash shared by [[shardRebalanceAudit]]
    * and its oracle: the same quadratic chain as the sketch hashes,
    * range [0, 1e9+7). */
  def rebalanceHash(x: Long): Long = {
    val p = 1000000007L
    val a = x % p
    val y = (a * a + a * 31 + 7) % p
    (y * y + y * 37 + 11) % p
  }

  /** Consistent-hashing rebalance audit: when a shard is added, what
    * fraction of keys MOVE under (a) naive mod-hash placement vs (b) a
    * consistent-hash ring with `vnodes` virtual nodes per shard?
    * Mod-hash reshuffles ~everything (owner = h mod n changes for
    * ~(1 − 1/lcm) of keys — the full-cluster rebalance storm);
    * the ring moves ~1/(n+1) (only keys whose successor arc the new
    * shard splits). This is the data-placement decision behind every
    * shuffle service / object-store partitioner at fleet scale,
    * quantified from the actual key distribution.
    *
    * Everything is exact integer: ring positions come from
    * [[rebalanceHash]] over (shard·100003 + vnode·7919), owners are
    * argmin of the clockwise distance (pos − h) mod p with (d, shard)
    * tie-break, and the per-key owner lookup is a NARROW map over a
    * ring literal (shards·vnodes structs baked into the plan — nothing
    * joins, nothing shuffles except the final 2-row count). Returns
    * (scheme, n_keys, n_moved, moved_ppm).
    *
    * Per-row cost bound (r6 verdict): the `transform` + `array_min`
    * evaluates all shards·vnodes ring entries per key per ring — O(128
    * to 144 structs) at the gate's 8–9×16 configuration, ~50× more
    * per-row work than a binary search over a sorted position array.
    * Acceptable for an AUDIT (one pass, narrow, no shuffle); a
    * production router at billions of keys/s would pre-sort the ring
    * and binary-search (driver-side ring, broadcast lookup), which
    * changes no output value — the argmin over clockwise distances is
    * exactly the sorted-ring successor. */
  def shardRebalanceAudit(df: DataFrame, key: Column, shardsBefore: Int,
                          shardsAfter: Int, vnodes: Int): DataFrame = {
    val p = 1000000007L
    def ringSql(shards: Int): String =
      (0 until shards).flatMap { s =>
        (0 until vnodes).map { t =>
          val pos = rebalanceHash(s.toLong * 100003L + t.toLong * 7919L)
          s"named_struct('pos', ${pos}L, 'shard', ${s}L)"
        }
      }.mkString("array(", ", ", ")")
    def ownerSql(shards: Int): String =
      s"array_min(transform(${ringSql(shards)}, r -> " +
        s"named_struct('d', (r.pos - _h + ${p}L) % ${p}L, " +
        s"'shard', r.shard))).shard"
    val keyed = df.select(key.cast("long").as("_k"))
      .withColumn("_h", {
        val a = pmod(col("_k"), lit(p))
        val y = (a * a + a * 31L + 7L) % p
        ((y * y + y * 37L + 11L) % p)
      })
    val owners = keyed.select(col("_h"),
      pmod(col("_h"), lit(shardsBefore.toLong)).as("mod_before"),
      pmod(col("_h"), lit(shardsAfter.toLong)).as("mod_after"),
      expr(ownerSql(shardsBefore)).as("ring_before"),
      expr(ownerSql(shardsAfter)).as("ring_after"))
    def scheme(tag: String, before: String, after: String): DataFrame =
      owners.agg(count(lit(1)).as("n_keys"),
        sum(when(col(before) =!= col(after), 1L).otherwise(0L))
          .as("n_moved"))
        .select(lit(tag).as("scheme"), col("n_keys"), col("n_moved"),
          expr("n_moved * 1000000 div n_keys").as("moved_ppm"))
    scheme("mod_hash", "mod_before", "mod_after")
      .unionByName(scheme("consistent_ring", "ring_before", "ring_after"))
  }

  /** Incremental aggregate maintenance: merge pre-aggregated PARTIALS
    * (per-key `n` / `sum_v` / `min_v` / `max_v`) from any number of
    * increments into the combined aggregate — the materialized-view
    * pattern where yesterday's 100 TB base is never rescanned: today's
    * delta is aggregated alone (tiny) and FOLDED in. count/sum/min/max
    * are commutative monoids, so union + ONE hash aggregate (map-side
    * partial combine, single shuffle on the key) is both the correct and
    * the minimal plan; avg = sum_v/n at read time. */
  def mergePartialAggs(parts: Seq[DataFrame], key: String): DataFrame = {
    require(parts.nonEmpty, "mergePartialAggs needs at least one partial")
    parts.reduce(_.unionByName(_))
      .groupBy(col(key))
      .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
  }

  /** The per-increment partial for [[mergePartialAggs]]: per-key
    * (n, sum_v, min_v, max_v) over `value`. */
  def partialAgg(df: DataFrame, key: String, value: Column): DataFrame =
    df.groupBy(col(key)).agg(
      count(lit(1)).as("n"), sum(value).as("sum_v"),
      min(value).as("min_v"), max(value).as("max_v"))
}
