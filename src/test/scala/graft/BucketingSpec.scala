package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing
import graft.sources.TpchGraph

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join with zero exchanges and exact results") {
    val dir = "/root/testdata/sf0.001"
    val orders = TpchGraph.table(spark, dir, "orders")
    val lineitem = TpchGraph.table(spark, dir, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "lineitem_b", "o_orderkey", 8)

    // force the sort-merge path: at this toy scale auto-broadcast would
    // otherwise bypass bucketing entirely (at 100 TB neither side fits)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "orders_b", "lineitem_b",
        "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)

      val plain = orders.join(lineitem, "o_orderkey")
      assert(joined.count() == plain.count())
      assert(joined.agg(org.apache.spark.sql.functions.sum("l_quantity"))
        .head().getDouble(0) ==
        plain.agg(org.apache.spark.sql.functions.sum("l_quantity"))
          .head().getDouble(0))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
