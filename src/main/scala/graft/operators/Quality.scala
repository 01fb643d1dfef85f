package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality audits a pipeline runs before training on (or serving
  * from) a freshly landed table set. */
object Quality {

  /** Referential-integrity audit: for each (name, child, fk, parent, pk)
    * check, count the child rows whose foreign key has no parent — the
    * dangling rows a later inner join would silently drop. One row per
    * check: (relation, n_rows, n_dangling); n_dangling = 0 is the pass.
    *
    * Each check is a LEFT ANTI hash join on the key (Catalyst broadcasts
    * the deduped parent side when it fits, shuffles otherwise) plus two
    * 1-row aggregates — no row ever leaves the executor except the
    * counts, so the audit runs at full scan bandwidth on any table size.
    */
  def referentialAudit(
      checks: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    checks.map { case (name, child, fk, parent, pk) =>
      val dangling = child.select(col(fk).as("k"))
        .join(parent.select(col(pk).as("k")).distinct(), Seq("k"),
          "left_anti")
      child.agg(count(lit(1)).as("n_rows"))
        .join(dangling.agg(count(lit(1)).as("n_dangling")), lit(true))
        .select(lit(name).as("relation"), col("n_rows"), col("n_dangling"))
    }.reduce(_ unionByName _)
  }

  /** k-anonymity / l-diversity audit — the privacy screen a pipeline
    * runs before releasing or training on person-adjacent tables:
    * group rows by the quasi-identifier columns (the combination an
    * attacker can look up) and flag equivalence classes smaller than
    * `k` (re-identifiable) or with fewer than `l` distinct values of
    * the sensitive column (attribute-disclosing even when k holds —
    * Machanavajjhala et al. 2007). One summary row:
    * (n_groups, n_groups_below_k, n_rows_below_k, min_group_size,
    * n_groups_below_l, min_l_diversity).
    *
    * Scale: one hash aggregate to the equivalence-class table (bounded
    * by distinct QI combinations, with map-side combine; the
    * countDistinct expands to one Expand×2 two-phase aggregate) and a
    * 1-row fold over it — nothing scales with row count beyond the
    * scan. */
  def anonymityAudit(df: DataFrame, qi: Seq[String], sensitive: String,
                     k: Long, l: Long): DataFrame =
    df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitive)).as("ndist"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_groups_below_k"),
        sum(when(col("n") < k, col("n")).otherwise(0L))
          .as("n_rows_below_k"),
        min(col("n")).as("min_group_size"),
        sum(when(col("ndist") < l, 1L).otherwise(0L))
          .as("n_groups_below_l"),
        min(col("ndist")).as("min_l_diversity"))

  /** Functional-dependency audit: does X → Y hold in the data?
    * violations = |distinct (X, Y)| − |distinct X| — zero iff every X
    * value maps to exactly one Y (the schema-discovery / data-contract
    * check run before trusting a join key or denormalizing a column).
    *
    * Null semantics, EXPLICIT (r6 ADVICE — the naive
    * countDistinct(x, y) drops rows where EITHER side is null while a
    * struct-based distinct keeps them, so engines diverge and
    * violations can go negative): rows with NULL X carry no dependency
    * evidence and are excluded from BOTH counts; a NULL Y under a
    * non-null X is a real (distinct) mapping and DOES count — X→Y
    * fails when x maps to both 'a' and NULL. Implemented by counting
    * distinct structs gated on x IS NOT NULL, mirrored verbatim in the
    * oracle SQL, so violations ≥ 0 by construction on ANY data.
    *
    * One two-phase distinct aggregate per candidate (map-side partial;
    * nothing scales with row count beyond the scan); candidates audit
    * independently so the whole batch is one union of 1-row folds.
    * Returns (fd, n_x, n_xy, violations, holds). */
  def fdAudit(df: DataFrame,
              candidates: Seq[(String, String)]): DataFrame =
    candidates.map { case (x, y) =>
      df.agg(countDistinct(col(x)).as("n_x"),
          countDistinct(when(col(x).isNotNull,
            struct(col(x), col(y)))).as("n_xy"))
        .select(lit(s"$x->$y").as("fd"), col("n_x"), col("n_xy"),
          (col("n_xy") - col("n_x")).as("violations"),
          (col("n_xy") === col("n_x")).as("holds"))
    }.reduce(_.unionByName(_))

  /** Cohen's kappa — chance-corrected agreement between two categorical
    * labelings of the same rows (annotator-vs-annotator, or
    * metadata-vs-classifier drift monitoring). With n rows, `agree`
    * matching rows, and pe_num = Σ_c rowmarginal_c · colmarginal_c:
    *
    *   κ = (agree·n − pe_num) / (n² − pe_num)
    *
    * reported as exact ppm. κ can be negative, and Spark's `div`
    * truncates toward zero while DuckDB's `//` floors — so the signed
    * floor is computed branch-wise over NON-negative operands only
    * (floor(a/b) = −ceil(|a|/b) for a<0), making the two engines
    * bit-identical; the oracle carries the same CASE. Degenerate
    * denominator (all mass in one class → n² = pe_num) reports κ = 0.
    *
    * Scale: one hash aggregate to the confusion matrix (bounded by the
    * label-vocabulary square), then 1-row folds and broadcast-sized
    * marginal joins — nothing after the scan touches row count.
    * Overflow: exact while n < ~3.0·10^6 (10^6·n² < 2^63); a larger
    * corpus first scales the confusion counts by a common factor
    * (κ is invariant to it, like every count-ratio statistic).
    * Returns one row: (n, agree, pe_num, kappa_ppm). */
  def cohenKappa(pairs: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val m = pairs
      .select(col(aCol).as("la"), col(bCol).as("lb"))
      .groupBy(col("la"), col("lb")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val totals = m.agg(sum(col("cnt")).as("n"),
      sum(when(col("la") === col("lb"), col("cnt")).otherwise(0L))
        .as("agree"))
    val pe = m.groupBy(col("la").as("cls")).agg(sum(col("cnt")).as("na"))
      .join(m.groupBy(col("lb").as("cls")).agg(sum(col("cnt")).as("nb")),
        Seq("cls"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("pe_num"))
    totals.join(pe, lit(true))
      .select(col("n"), col("agree"), col("pe_num"),
        expr("""CASE
               |  WHEN n * n - pe_num <= 0 THEN 0
               |  WHEN agree * n - pe_num >= 0
               |    THEN ((agree * n - pe_num) * 1000000)
               |         div (n * n - pe_num)
               |  ELSE -(((pe_num - agree * n) * 1000000
               |          + (n * n - pe_num) - 1)
               |         div (n * n - pe_num))
               |END""".stripMargin).as("kappa_ppm"))
  }
}
