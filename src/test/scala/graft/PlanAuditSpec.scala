package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audits for the scan layer: filters must reach the parquet
  * scans (PushedFilters) and projections must prune the read schema —
  * the "100 TB posture" claims in README.md proven against the actual
  * executed plans, so a regression that silently widens a scan or drops
  * a pushdown fails CI, not a cluster bill. */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("label-filtered node scan constant-folds to exactly ONE parquet scan") {
    // TpchGraph.nodes is a 6-branch union with literal label columns; a
    // label filter must prune 5 branches at plan time, not at runtime
    val plan = formatted(SparkEntry.queries("node_filter_label")(spark, dir))
    // formatted mode prints each node in the tree AND in the detail
    // section — count only the numbered detail headers
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 scan, got $scans:\n$plan")
  }

  test("type-filtered rel scan constant-folds to exactly ONE parquet scan") {
    val plan = formatted(SparkEntry.queries("rel_filter_type")(spark, dir))
    // formatted mode prints each node in the tree AND in the detail
    // section — count only the numbered detail headers
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 scan, got $scans:\n$plan")
  }

  test("Q6 pushes its selective filters into the lineitem scan") {
    val plan = formatted(SparkEntry.queries("sql_q6")(spark, dir))
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(l => l.contains("l_shipdate") &&
      l.contains("l_discount") && l.contains("l_quantity")),
      s"filters not pushed:\n${pushed.mkString("\n")}")
  }

  test("Q6 prunes the lineitem read schema to the referenced columns") {
    val plan = formatted(SparkEntry.queries("sql_q6")(spark, dir))
    val read = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    // 16-column table, 4 referenced — none of the untouched columns may
    // be read
    for (absent <- Seq("l_orderkey", "l_partkey", "l_tax", "l_returnflag"))
      assert(!read.contains(absent), s"unpruned column $absent in: $read")
    for (present <- Seq("l_shipdate", "l_discount", "l_quantity",
        "l_extendedprice"))
      assert(read.contains(present), s"missing column $present in: $read")
  }

  test("text pipeline reads only doc_id and text from documents") {
    val plan = formatted(SparkEntry.queries("token_count")(spark, dir))
    val read = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("doc_id") && read.contains("text") &&
      !read.contains("lang"), s"documents scan not pruned: $read")
  }

  test("brute top-k broadcasts the query side, never the corpus") {
    val plan = formatted(SparkEntry.queries("sim_topk")(spark, dir))
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), s"no broadcast in:\n$plan")
  }
}
