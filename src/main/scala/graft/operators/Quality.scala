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
}
