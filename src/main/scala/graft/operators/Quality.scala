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
}
