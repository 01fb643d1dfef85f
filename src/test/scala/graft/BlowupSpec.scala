package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TpchGraph

/** The SPARK_GRAFT_BLOWUP scale-up harness (tools/scale_up.py) must
  * model a ×N scale factor faithfully — otherwise the upward scaling
  * point measures an artifact, not the operator: fact-table counts ×N,
  * entity keys disjoint across copies, referential integrity intact
  * within each copy (copies never join each other), and dimension
  * tables (region/nation) fixed, the TPC-H scaling model. */
class BlowupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("without SPARK_GRAFT_BLOWUP, table() is the plain parquet read") {
    assume(!sys.env.contains("SPARK_GRAFT_BLOWUP"))
    assert(TpchGraph.table(spark, sf, "orders").count() == 1500L)
  }

  test("blowUp(n): fact counts scale xN with keys disjoint per copy; " +
    "dimensions stay fixed") {
    val orders = TpchGraph.table(spark, sf, "orders")
    val big = TpchGraph.blowUp(orders, "orders", 10)
    assert(big.count() == orders.count() * 10)
    assert(big.select("o_orderkey").distinct().count() ==
      orders.select("o_orderkey").distinct().count() * 10)
    val nation = TpchGraph.table(spark, sf, "nation")
    assert(TpchGraph.blowUp(nation, "nation", 10).count() == nation.count())
  }

  test("blowUp(n) preserves referential integrity within a copy: no " +
    "order is orphaned from its customer, none joins across copies") {
    val o = TpchGraph.blowUp(
      TpchGraph.table(spark, sf, "orders"), "orders", 3)
    val c = TpchGraph.blowUp(
      TpchGraph.table(spark, sf, "customer"), "customer", 3)
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
      .count() == 0L, "orphaned orders after blowup")
    // each order's key and its customer's key sit in the SAME copy band
    // (integer division: `/` would be double division in Spark SQL)
    val band = TpchGraph.BlowupStride
    val crossCopy = o.join(c, o("o_custkey") === c("c_custkey"))
      .where(org.apache.spark.sql.functions.expr(
        s"o_orderkey div ${band}L != c_custkey div ${band}L"))
    assert(crossCopy.count() == 0L, "a join crossed copy boundaries")
  }
}
