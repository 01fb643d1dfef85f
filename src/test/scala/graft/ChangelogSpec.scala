package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Changelog

class ChangelogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def changes = Seq(
    // (key, seq, op, amount)
    (1L, 10L, "upsert", 5.0),
    (1L, 20L, "upsert", 7.0),   // latest for key 1
    (2L, 11L, "upsert", 1.0),
    (2L, 30L, "delete", 0.0),   // key 2 ends deleted
    (3L, 12L, "delete", 0.0),
    (3L, 40L, "upsert", 9.0),   // deleted then re-inserted: survives
    (4L, 13L, "upsert", 2.0)
  ).toDF("k", "seq", "op", "amount")

  test("latest record wins and tombstones drop the key") {
    val out = Changelog.compactLatest(changes, "k", "seq",
        col("op") === "delete")
      .select("k", "last_seq", "last_amount")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, 20L, 7.0), (3L, 40L, 9.0), (4L, 13L, 2.0)))
  }

  test("result is stable under input order and partitioning") {
    val shuffled = changes.orderBy(rand(7)).repartition(5)
    val a = Changelog.compactLatest(changes, "k", "seq",
      col("op") === "delete").orderBy("k").collect().toSeq
    val b = Changelog.compactLatest(shuffled, "k", "seq",
      col("op") === "delete").orderBy("k").collect().toSeq
    assert(a === b)
  }

  test("plan is a single aggregate — no window sort over history") {
    val plan = Changelog.compactLatest(changes, "k", "seq",
      col("op") === "delete").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "compaction must not use a window")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
  }
}
