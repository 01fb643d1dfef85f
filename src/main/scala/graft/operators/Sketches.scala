package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Sketch operators — fixed-size summaries that replace unbounded
  * aggregations at scale. Everything here is integer arithmetic over
  * seedless hashes, so unlike the usual float/RNG sketch implementations
  * these replay bit-for-bit in any engine (and carry exact oracles).
  *
  * Scale rationale: a corpus-wide `groupBy(term)` materializes one row
  * per DISTINCT term — at 100 TB that is billions of rows shuffled to
  * measure even a handful of hot terms. A Count-Min sketch is a d×w cell
  * grid (constant size, chosen up front): the heavy scan aggregates into
  * ≤ d·w cells with full map-side combining, and the shuffle carries at
  * most d·w rows per partition regardless of corpus size. Estimates are
  * biased UP (collisions only add), with the classic ε = e/w, δ = e^−d
  * guarantee — exactly the right trade for heavy-hitter screening before
  * an exact pass over the few survivors. */
object Sketches {

  /** Pairwise-independent-style row hashes over the polynomial word
    * hash: h_i(t) = ((polyHash(t)·a_i + b_i) mod p) mod w, p = 1e9+7.
    * Constants are small primes; polyHash ≤ p−1 keeps every intermediate
    * well under 2^63. */
  private val RowA = Seq(31L, 37L, 41L)
  private val RowB = Seq(7L, 11L, 13L)

  private def cell(h: Column, row: Int, width: Int): Column =
    (h * RowA(row) + RowB(row)) % 1000000007L % width

  /** Build the d×3 Count-Min grid over whitespace tokens of `text`:
    * returns (row, cell, cnt) — at most 3·width rows total. */
  def countMinBuild(docs: DataFrame, text: String, width: Int): DataFrame = {
    val toks = docs.select(explode(words(col(text))).as("word"))
      .where(col("word") =!= "")
      .select(polyHash(col("word")).as("h"))
    toks
      .select(explode(array((0 until RowA.length).map { r =>
        struct(lit(r.toLong).as("row"), cell(col("h"), r, width).as("cell"))
      }: _*)).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Bloom filter over an int64 key column — the join-pruning primitive
    * (Spark's own runtime filters and every lakehouse data-skipping index
    * are this shape): build once over the small side's keys, then screen
    * the huge side with zero shuffle before the real join. False
    * positives only — a `might_contain = false` row is PROVABLY absent.
    *
    * Bits live in 63-bit words (bit index < 63, so no set bit ever
    * reaches the int64 sign bit — engines disagree on signed-overflow
    * shifts, 2^62 they agree on). Three row hashes over the mixed key;
    * the filter itself is ≤ ⌈m/63⌉ (word, bits) rows built with one
    * explode + bit_or aggregate. */
  def bloomBuild(keys: DataFrame, key: String, mBits: Long): DataFrame = {
    val pos = (0 until RowA.length).map { r =>
      (pmod(col(key), lit(1000000007L)) * RowA(r) + RowB(r)) %
        1000000007L % mBits
    }
    keys.select(col(key)).distinct()
      .select(explode(array(pos: _*)).as("pos"))
      .select(expr("pos div 63").as("word_idx"),
        expr("shiftleft(1L, cast(pos % 63 as int))").as("bit"))
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(bit)").as("bits"))
  }

  /** Screen probe keys against a built filter: `might_contain` is true
    * iff all three hash bits are set. The filter broadcasts (≤ ⌈m/63⌉
    * rows by construction) — the probe side, the 100 TB side, never
    * shuffles. Returns (key, might_contain). */
  def bloomMightContain(bloom: DataFrame, probes: DataFrame, key: String,
                        mBits: Long): DataFrame = {
    val pos = (0 until RowA.length).map { r =>
      (pmod(col(key), lit(1000000007L)) * RowA(r) + RowB(r)) %
        1000000007L % mBits
    }
    probes.select(col(key)).distinct()
      .select(col(key), explode(array(pos: _*)).as("pos"))
      .select(col(key), expr("pos div 63").as("word_idx"),
        expr("shiftleft(1L, cast(pos % 63 as int))").as("bit"))
      .join(broadcast(bloom), Seq("word_idx"), "left")
      .groupBy(col(key))
      .agg(min(when(coalesce(expr("bits & bit"), lit(0L)) =!= 0L, 1L)
        .otherwise(0L)).as("all_set"))
      .select(col(key), (col("all_set") === 1L).as("might_contain"))
  }

  /** HyperLogLog register build over an int64 key column — the constant-
    * size distinct-count sketch (Flajolet et al. 2007). An exact
    * `count(DISTINCT key)` shuffles one row per distinct key — billions at
    * 100 TB; HLL reduces the whole scan to m registers (m rows here), each
    * the max over a partition-local max, so map-side combining bounds the
    * shuffle at m rows per partition and register tables from disjoint
    * corpus shards merge by the same `max` — the sketch is a monoid.
    *
    * Portability: the affine family the other sketches use is too LINEAR
    * for HLL — an arithmetic-progression key set keeps its regular
    * trailing-zero structure through any affine map (composition of
    * affine maps is affine), skewing registers 3–4×. Rank and bucket here
    * come from a chain of QUADRATIC maps mod p = 1e9+7 (x² + ax + b —
    * nonlinear over ℤ, and x < p keeps x² < 2^60, no int64 overflow),
    * measured at 3–5% error on adversarially regular key sets. The rank
    * is trailing-zeros+1 — `bit_count((h & -h) - 1) + 1` — capped at 40;
    * every op is int64-exact in any engine. Returns (bucket, register),
    * ≤ m rows. */
  def hllBuild(keys: DataFrame, key: String, m: Int): DataFrame =
    hllBuildGrouped(keys, Nil, key, m)

  /** Per-group HLL registers — the `GROUP BY g, approx_count_distinct(k)`
    * shape: registers keyed (group…, bucket), ≤ m rows per group. The
    * register table is itself a mergeable aggregation state: union two
    * periods' tables and re-max to sketch their union. */
  def hllBuildGrouped(df: DataFrame, groupCols: Seq[String], key: String,
                      m: Int): DataFrame =
    df
      .withColumn("_x", pmod(col(key), lit(1000000007L)))
      .withColumn("_y",
        (col("_x") * col("_x") + col("_x") * 31L + 7L) % 1000000007L)
      .withColumn("_z",
        (col("_y") * col("_y") + col("_y") * 37L + 11L) % 1000000007L)
      .withColumn("_h2",
        (col("_z") * col("_z") + col("_z") * 41L + 13L) % 1000000007L)
      .withColumn("_rho",
        when(col("_h2") === 0L, lit(40L))
          .otherwise(least(
            expr("cast(bit_count((_h2 & -_h2) - 1) as bigint)") + 1L,
            lit(40L))))
      .groupBy(groupCols.map(col) :+ (col("_z") % m).as("bucket"): _*)
      .agg(max(col("_rho")).as("register"))

  /** Collapse HLL registers to the cardinality estimate. The harmonic sum
    * Σ 2^-register is kept EXACT in int64 by scaling to 2^40 units (every
    * term is a power of two ≤ 2^40; ≤ m terms, so ≤ m·2^40 < 2^63 —
    * no float accumulation-order dependence). The final estimate
    * α_m·m²/Σ is two IEEE divisions off that exact integer, floored to
    * ×1000 — deterministic cross-engine given the same α_m literal
    * (exposed as [[hllAlphaNumerator]] for oracle replay).
    * Returns one row (n_present, sum_term, est_x1000). */
  def hllEstimate(registers: DataFrame, m: Int): DataFrame =
    hllEstimateGrouped(registers, Nil, m)

  /** Per-group estimates from [[hllBuildGrouped]] registers: one row per
    * group (group…, n_present, sum_term, est_x1000). */
  def hllEstimateGrouped(registers: DataFrame, groupCols: Seq[String],
                         m: Int): DataFrame =
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_present"),
        sum(expr("shiftleft(1L, cast(40 - register as int))"))
          .as("sum_present"))
      .select(groupCols.map(col) ++ Seq(col("n_present"),
        (col("sum_present") +
          (lit(m.toLong) - col("n_present")) * lit(1L << 40))
          .as("sum_term")): _*)
      .select(groupCols.map(col) ++ Seq(col("n_present"), col("sum_term"),
        floor(lit(hllAlphaNumerator(m)) / col("sum_term") * 1000.0)
          .cast("long").as("est_x1000")): _*)

  /** Shared SQL text for the HyperBall per-node estimate: HLL raw
    * formula when all m registers are occupied, else LINEAR COUNTING
    * m·ln(m/V)·1000 via a precomputed integer lookup on V = m −
    * n_present (V ≤ m−1 values, tabulated HERE once so both engines
    * evaluate literally identical CASE arms — no cross-engine ln()
    * drift can exist). Expects columns n_present, sum_term. */
  def ballEstimateCaseSql(m: Int): String = {
    val alpha = String.format(java.util.Locale.ROOT, "%.17e",
      Double.box(hllAlphaNumerator(m)))
    val arms = (1 until m).map { v =>
      val lc = math.floor(m * math.log(m.toDouble / v) * 1000.0).toLong
      s"WHEN $v THEN $lc"
    }.mkString(" ")
    s"CASE WHEN n_present = $m " +
      s"THEN CAST(floor(CAST($alpha AS DOUBLE) / sum_term * 1000.0) " +
      "AS BIGINT) " +
      s"ELSE CAST(CASE ($m - n_present) $arms END AS BIGINT) END"
  }

  /** Fixed-bin histogram quantiles — the percentile path that scales.
    * Exact percentiles globally sort the data (or materialize every group
    * in memory — `agg_percentiles` covers that exact form); a fixed-bin
    * histogram needs ONE count aggregate that map-side-combines to ≤
    * #bins cells per partition, then quantiles read off the cumulative
    * histogram with error bounded by the bin width. Histograms from
    * disjoint shards merge by adding cells (a monoid, like the other
    * sketches here).
    *
    * Everything is integer: the rank test `n_le·100 ≥ q·N` needs no
    * ceil() and no division, so any engine replays it exactly. The
    * cumulative window runs over #bins rows — a constant chosen up
    * front, never data-sized. Returns (q_pct, bin, bin_lo) per requested
    * percentile. */
  def histogramQuantiles(df: DataFrame, value: Column, binWidth: Long,
                         qPcts: Seq[Long]): DataFrame = {
    import df.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val bins = df.select(value.cast("long").as("v"))
      .selectExpr(s"v div $binWidth AS bin")
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins.withColumn("n_le", sum(col("n")).over(w))
    val total = bins.agg(sum(col("n")).as("total"))
    cum.join(broadcast(total), lit(true))
      .join(broadcast(qPcts.toDF("q_pct")), lit(true))
      .where(col("n_le") * 100 >= col("q_pct") * col("total"))
      .groupBy(col("q_pct"))
      .agg(min(col("bin")).as("bin"))
      .select(col("q_pct"), col("bin"),
        (col("bin") * binWidth).as("bin_lo"))
  }

  /** Quantile BINNING through the histogram cut points — feature
    * discretization (and the bucket scheme drift monitors compare): each
    * row is assigned bin_id = how many of the requested quantile cuts
    * its histogram bin has reached (bin_id ∈ 0..|qPcts|), then bins
    * aggregate to (bin_id, n, v_min, v_max). Cut points come from
    * [[histogramQuantiles]] — deterministic at histogram resolution, so
    * the assignment replays exactly in any engine; no global sort of the
    * data ever happens (the textbook ntile() formulation is one).
    *
    * Scale: the cut table is ≤ |qPcts| rows, folded to ONE array row and
    * broadcast — assignment is a narrow codegen'd projection over the
    * data, and the final profile is one hash aggregate to ≤ |qPcts|+1
    * rows. */
  def quantileBins(df: DataFrame, value: Column, binWidth: Long,
                   qPcts: Seq[Long]): DataFrame = {
    val cuts = histogramQuantiles(df, value, binWidth, qPcts)
      .agg(sort_array(collect_list(col("bin"))).as("cuts"))
    df.select(value.cast("long").as("v"))
      .selectExpr("v", s"v div $binWidth AS hv")
      .crossJoin(broadcast(cuts))
      .select(col("v"), size(filter(col("cuts"),
        c => col("hv") >= c)).cast("long").as("bin_id"))
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("v_min"),
        max(col("v")).as("v_max"))
  }

  /** Per-group twin of [[histogramQuantiles]] — `GROUP BY g,
    * percentile(v, q)` at histogram cost: cells are (group, bin), the
    * cumulative window partitions by group (still ≤ #bins rows per
    * group), and the per-group total joins on the group key. */
  def histogramQuantilesGrouped(df: DataFrame, group: String, value: Column,
                                binWidth: Long, qPcts: Seq[Long])
      : DataFrame = {
    import df.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val bins = df.select(col(group), value.cast("long").as("v"))
      .selectExpr(group, s"v div $binWidth AS bin")
      .groupBy(col(group), col("bin")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(group)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins.withColumn("n_le", sum(col("n")).over(w))
    val total = bins.groupBy(col(group)).agg(sum(col("n")).as("total"))
    cum.join(total, group)
      .join(broadcast(qPcts.toDF("q_pct")), lit(true))
      .where(col("n_le") * 100 >= col("q_pct") * col("total"))
      .groupBy(col(group), col("q_pct"))
      .agg(min(col("bin")).as("bin"))
      .select(col(group), col("q_pct"), col("bin"),
        (col("bin") * binWidth).as("bin_lo"))
  }

  /** α_m·m²·2^40 as one Scala-computed double: the single float constant
    * both the Spark plan and the SQL oracle must share (17 significant
    * digits round-trip a double exactly). */
  def hllAlphaNumerator(m: Int): Double = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    alpha * m * m * math.pow(2.0, 40)
  }

  /** Point-estimate the frequency of each probe term: est = min over the
    * d rows of that term's cell count (never an underestimate). `probes`
    * must have a string column `word`; the sketch side is ≤ d·w rows, so
    * it broadcasts. Returns (word, est). */
  /** Count-Min grid over an int64 KEY column with multiplicity (the
    * frequency-vector sketch, vs [[countMinBuild]]'s token variant).
    * ≤ 3·width rows out, full map-side combining. */
  def countMinKeyBuild(df: DataFrame, key: String, width: Int): DataFrame = {
    val h = pmod(col(key), lit(1000000007L))
    df.select(explode(array((0 until RowA.length).map { r =>
        struct(lit(r.toLong).as("row"),
          ((h * RowA(r) + RowB(r)) % 1000000007L % width).as("cell"))
      }: _*)).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Join-cardinality estimate from two Count-Min sketches — the
    * pre-flight |A ⋈ B| sizing a planner wants before committing a
    * 100 TB shuffle (Cormode–Muthukrishnan's CM inner product):
    * |A ⋈_k B| = Σ_k fA(k)·fB(k), estimated per sketch row as
    * Σ_cell cntA·cntB and MIN'd across the 3 rows — collisions only
    * add, so every row overestimates and the min is the tightest bound.
    *
    * Cost: two constant-size sketch scans + a ≤ 3·width-cell join,
    * never a per-key join of the real sides. Exact when width exceeds
    * key cardinality (no collisions — spec-pinned). Returns one row
    * (est_pairs). */
  def countMinJoinSize(a: DataFrame, aKey: String, b: DataFrame,
                       bKey: String, width: Int): DataFrame = {
    val ga = countMinKeyBuild(a, aKey, width).withColumnRenamed("cnt", "ca")
    val gb = countMinKeyBuild(b, bKey, width).withColumnRenamed("cnt", "cb")
    ga.join(gb, Seq("row", "cell"))
      .groupBy(col("row")).agg(sum(col("ca") * col("cb")).as("rowsum"))
      .agg(min(col("rowsum")).as("est_pairs"))
  }

  def countMinEstimate(sketch: DataFrame, probes: DataFrame,
                       width: Int): DataFrame = {
    val probeCells = probes.select(col("word")).distinct()
      .select(col("word"), polyHash(col("word")).as("h"))
      .select(col("word"), explode(array((0 until RowA.length).map { r =>
        struct(lit(r.toLong).as("row"), cell(col("h"), r, width).as("cell"))
      }: _*)).as("rc"))
      .select(col("word"), col("rc.row").as("row"), col("rc.cell").as("cell"))
    probeCells
      .join(broadcast(sketch), Seq("row", "cell"), "left")
      .groupBy(col("word"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Sketch-accuracy evaluation for [[histogramQuantiles]]: the exact
    * percentile (integer rank test over the exact value distribution)
    * against the histogram's bin floor — err = exact − bin_lo, bounded
    * by the bin width, measured not assumed. The exact side costs one
    * aggregate to the value DISTRIBUTION plus a cumsum window over it
    * (distinct-value-bounded); the histogram side is the sketch under
    * eval. Returns (q_pct, exact_v, bin_lo, err). */
  def histQuantileError(df: DataFrame, value: Column, binWidth: Long,
                        qPcts: Seq[Long]): DataFrame = {
    import df.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val dist = df.select(value.cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val cum = dist.withColumn("n_le",
      sum(col("cnt")).over(Window.orderBy(col("v"))))
    val total = dist.agg(sum(col("cnt")).as("total"))
    val exact = cum.join(broadcast(total), lit(true))
      .join(broadcast(qPcts.toDF("q_pct")), lit(true))
      .where(col("n_le") * 100 >= col("q_pct") * col("total"))
      .groupBy(col("q_pct")).agg(min(col("v")).as("exact_v"))
    val approx = histogramQuantiles(df, value, binWidth, qPcts)
      .select(col("q_pct"), col("bin_lo"))
    exact.join(approx, "q_pct")
      .select(col("q_pct"), col("exact_v"), col("bin_lo"),
        (col("exact_v") - col("bin_lo")).as("err"))
  }

  // ------------------------------------------------------- KMV / theta

  /** KMV ("k minimum values") / theta sketch build over an int64 key
    * column — the distinct-count sketch that, unlike HLL, supports SET
    * OPERATIONS (Beyer et al. 2007; the Apache DataSketches theta
    * family): the k smallest DISTINCT hash values of a key set both
    * estimate its cardinality (the k-th minimum sits ≈ k/n of the way
    * into the hash space) and — because two sides' min-k sets are
    * comparable below a common threshold — estimate the cardinality of
    * INTERSECTIONS, which HLL registers structurally cannot (max-merge
    * gives unions only). Hash: the same 3-round quadratic chain as
    * [[hllBuild]] (nonlinear mod p = 1e9+7, affine-resistant), so every
    * value is int64-exact in any engine. Returns ≤ k rows (h),
    * ascending-unique — a mergeable summary: union two sketches' rows,
    * re-distinct, re-cut to k.
    *
    * Scale: the distinct aggregate combines map-side (shuffle ≤
    * per-partition distinct hashes) and the k-minimum cut is a bounded
    * TakeOrdered (k rows per partition cross the final exchange). For
    * REPEATED sketching of a growing corpus — the monitoring shape this
    * sketch exists for — pass `prefilter` = the previous epoch's theta:
    * only hashes below it can enter the new k-set, so ~(1 − k/n) of
    * rows drop in the scan BEFORE the distinct shuffle and the
    * aggregate moves O(k) rows per partition at any corpus size. */
  def kmvBuild(keys: DataFrame, key: String, k: Int,
               prefilter: Option[Long] = None): DataFrame = {
    val p = 1000000007L
    // pmod, not %: a negative int64 key would otherwise hash negative,
    // breaking the k-minimum ordering and theta semantics
    val hashed = keys
      .withColumn("_x", pmod(col(key), lit(p)))
      .withColumn("_y", (col("_x") * col("_x") + col("_x") * 31L + 7L) % p)
      .withColumn("_z", (col("_y") * col("_y") + col("_y") * 37L + 11L) % p)
      .select(((col("_z") * col("_z") + col("_z") * 41L + 13L) % p).as("h"))
    val pre = prefilter.fold(hashed)(t => hashed.where(col("h") < t))
    pre.distinct().orderBy(col("h")).limit(k)
  }

  /** Collapse one [[kmvBuild]] k-set to its distinct-count estimate. A
    * FULL sketch (k values) uses the unbiased KMV estimator
    * (k−1)·M div θ with θ = the k-th minimum; a sketch with fewer
    * values kept every distinct hash, so its count IS the cardinality
    * (hash collisions at these densities are negligible and would only
    * undercount by the collision count). One row:
    * (n_vals, theta, est_distinct) — exact integer arithmetic. */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame = {
    // k = 1 degenerates the (k−1)·M estimator to 0; k ≤ 0 is meaningless
    require(k >= 2, s"kmvEstimate needs k >= 2, got $k")
    sketch.agg(count(lit(1)).as("n_vals"),
        coalesce(max(col("h")), lit(0L)).as("theta"))
      .select(col("n_vals"), col("theta"),
        when(col("n_vals") >= k,
          expr(s"(${k - 1} * 1000000007L) div theta"))
          .otherwise(col("n_vals")).as("est_distinct"))
  }

  /** Theta-sketch set operations over two [[kmvBuild]] k-sets:
    * θ = min of the two sides' thresholds (a side with < k values is
    * exact — its threshold is the full hash space M), both k-sets are
    * cut to h < θ, and every retained hash witnesses M/θ keys:
    * est = cnt · M div θ for each of A, B, A∩B and A∪B. Note the
    * smaller-θ side's own k-th value is excluded by the strict cut, so
    * a full sketch's side estimate is exactly the unbiased
    * (k−1)·M div θ. One row: (theta, n_a_est, n_b_est,
    * n_intersect_est, n_union_est); all int64-exact (cnt ≤ 2k, so
    * cnt·M < 2^63 for any practical k). Both inputs are ≤ k rows —
    * every join below broadcasts. */
  def kmvSetOps(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val M = 1000000007L
    def thresh(s: DataFrame, as: String) = s.agg(
      when(count(lit(1)) >= k, max(col("h"))).otherwise(lit(M)).as(as))
    val theta = thresh(a, "ta").join(thresh(b, "tb"), lit(true))
      .select(least(col("ta"), col("tb")).as("theta"))
    a.select(col("h"), lit(1L).as("ia"), lit(0L).as("ib"))
      .unionByName(b.select(col("h"), lit(0L).as("ia"), lit(1L).as("ib")))
      .join(broadcast(theta), lit(true))
      .where(col("h") < col("theta"))
      .groupBy(col("h"), col("theta"))
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
      .groupBy(col("theta"))
      .agg(sum(col("ia")).as("ca"), sum(col("ib")).as("cb"),
        sum(col("ia") * col("ib")).as("ci"), count(lit(1)).as("cu"))
      .select(col("theta"),
        expr(s"ca * ${M}L div theta").as("n_a_est"),
        expr(s"cb * ${M}L div theta").as("n_b_est"),
        expr(s"ci * ${M}L div theta").as("n_intersect_est"),
        expr(s"cu * ${M}L div theta").as("n_union_est"))
  }
}
