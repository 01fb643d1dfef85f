package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed statistics — regression and correlation as ONE aggregate
  * of int64 moment sums plus a final double expression. The sums are
  * exact in any engine; the closing division/sqrt chain is written
  * identically on both sides (every step IEEE-correctly-rounded:
  * +, −, ×, /, √ — never pow/ln), so results replay bit-for-bit.
  *
  * Scale: each statistic is a single map-side-combined hash aggregate
  * over the data — no window, no second pass, no collect. Moment sums
  * are kept small by quantizing inputs to the coarsest unit that holds
  * the signal (dollars/basis points, x shifted to a zero-based index):
  * Σx² at 10⁹ rows of 10⁵-unit values stays well under 2⁶³, while the
  * n·Σx² cross-terms that WOULD overflow are evaluated in double after
  * exact int64 accumulation. */
object Stats {

  /** Per-group ordinary least squares y = slope·x + intercept from the
    * five moment sums (n, Σx, Σy, Σxy, Σx²):
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²-bar), intercept =
    * (Σy − slope·Σx) / n — the per-entity trend fit a feature pipeline
    * runs at full table scale. x and y must already be int64.
    * Returns (group, n, sx, sy, sxy, sxx, slope, intercept). */
  def groupedOls(df: DataFrame, group: String, x: String,
                 y: String): DataFrame =
    df.groupBy(col(group))
      .agg(count(lit(1)).as("n"), sum(col(x)).as("sx"),
        sum(col(y)).as("sy"), sum(col(x) * col(y)).as("sxy"),
        sum(col(x) * col(x)).as("sxx"))
      .select(col(group), col("n"), col("sx"), col("sy"), col("sxy"),
        col("sxx"),
        ((col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")))
          .as("slope"))
      .select(col(group), col("n"), col("sx"), col("sy"), col("sxy"),
        col("sxx"), col("slope"),
        ((col("sy").cast("double") - col("slope") * col("sx").cast("double"))
          / col("n").cast("double")).as("intercept"))

  /** Pairwise Pearson correlations of pre-quantized int64 columns,
    * long-form (col_a, col_b, n, r) for every a < b pair. ONE aggregate
    * computes every moment; the r expressions are pure double algebra
    * over the exact sums. The column list is caller-bounded (k columns
    * → k(k−1)/2 outputs from a 1-row aggregate). */
  def corrPairs(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => sum(col(c)).as(s"s_$c")) ++
      cols.map(c => sum(col(c) * col(c)).as(s"q_$c")) ++
      (for (i <- cols.indices; j <- cols.indices if i < j)
        yield sum(col(cols(i)) * col(cols(j)))
          .as(s"p_${cols(i)}_${cols(j)}"))
    val m = df.agg(count(lit(1)).as("n"), aggs: _*)
    def d(c: String): Column = col(c).cast("double")
    val rows = for (i <- cols.indices; j <- cols.indices if i < j) yield {
      val (a, b) = (cols(i), cols(j))
      m.select(lit(a).as("col_a"), lit(b).as("col_b"), col("n"),
        ((d("n") * d(s"p_${a}_$b") - d(s"s_$a") * d(s"s_$b"))
          / (sqrt(d("n") * d(s"q_$a") - d(s"s_$a") * d(s"s_$a"))
            * sqrt(d("n") * d(s"q_$b") - d(s"s_$b") * d(s"s_$b"))))
          .as("r"))
    }
    rows.reduce(_ unionByName _)
  }

  /** Chi-square test of independence between two categorical columns —
    * the feature-selection / drift-detection statistic — computed
    * EXACTLY as one scaled int64. The textbook per-cell term
    * (O − E)²/E with E = rowTot·colTot/N rewrites to integers:
    * (O·N − rowTot·colTot)² / (rowTot·colTot·N); each cell's
    * scale-multiplied quotient is taken in int64 long division
    * (quotient·scale + remainder·scale div denominator — exact, no
    * doubles anywhere), so the cross-cell sum is order-independent and
    * bit-identical in any engine. Overflow headroom: the squared
    * numerator is ≤ N⁴ (fits int64 to N ≈ 50k per… the contingency
    * CELL domain, not the row count — O/rowTot/colTot are cell counts)
    * and remainder·scale ≤ N³·scale.
    *
    * Scale: counts aggregate map-side to ≤ |A|·|B| cells; row/col
    * totals re-aggregate those cells (never the data), and the grand
    * total joins back as a broadcast scalar. One data pass total.
    *
    * Returns 1 row: (n, n_r, n_c, dof, chi2_scaled) with
    * chi2_scaled = ⌊χ²·scale⌋-per-cell summed. */
  def chiSquare(df: DataFrame, a: String, b: String,
                scale: Long = 1000000L): DataFrame = {
    val cells = df.groupBy(col(a).as("ka"), col(b).as("kb"))
      .agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy(col("ka")).agg(sum(col("o")).as("ra"))
    val colT = cells.groupBy(col("kb")).agg(sum(col("o")).as("cb"))
    val tot = cells.agg(sum(col("o")).as("n"))
    val nr = rowT.agg(count(lit(1)).as("n_r"))
    val nc = colT.agg(count(lit(1)).as("n_c"))
    val contrib = cells.join(rowT, "ka").join(colT, "kb")
      .crossJoin(broadcast(tot))
      .select((col("o") * col("n") - col("ra") * col("cb")).as("diff"),
        (col("ra") * col("cb") * col("n")).as("den"))
      .selectExpr(s"(diff * diff) div den * $scale" +
        s" + ((diff * diff) % den) * $scale div den AS cell_scaled")
    contrib.agg(sum(col("cell_scaled")).as("chi2_scaled"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(nr))
      .crossJoin(broadcast(nc))
      .select(col("n"), col("n_r"), col("n_c"),
        ((col("n_r") - 1) * (col("n_c") - 1)).as("dof"),
        col("chi2_scaled"))
  }

  /** 2-D Pareto front (skyline): the rows no other row beats on BOTH
    * axes — maximize `maxCol`, minimize `minCol`, domination requiring
    * at least one strict inequality (the classic Börzsönyi et al. 2001
    * skyline operator). Integer ordinates only.
    *
    * Scale: the table first collapses to its DISTINCT (max, min) value
    * pairs with a count — bounded by the value domain, not the row
    * count — and the single ordered window runs over that distribution.
    * Sorted by (p desc, d asc), a pair is on the front iff its d is
    * strictly below every preceding d: preceding rows have higher p (or
    * equal p with smaller d), exactly the dominators. Returns frontier
    * (p, d, n_rows). */
  def paretoFront(df: DataFrame, maxCol: Column, minCol: Column)
      : DataFrame = {
    val pairs = df.select(maxCol.cast("long").as("p"),
        minCol.cast("long").as("d"))
      .groupBy(col("p"), col("d")).agg(count(lit(1)).as("n_rows"))
    val wPrev = org.apache.spark.sql.expressions.Window
      .orderBy(col("p").desc, col("d").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    pairs.withColumn("d_prev_min", min(col("d")).over(wPrev))
      .where(col("d_prev_min").isNull || col("d") < col("d_prev_min"))
      .select(col("p"), col("d"), col("n_rows"))
  }
}
