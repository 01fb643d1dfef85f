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

  test("scd2 versions every change; deletes close intervals silently") {
    val out = Changelog.scd2(changes, "k", "seq", col("op") === "delete")
      .select("k", "valid_from", "valid_to", "amount")
      .as[(Long, Long, Option[Long], Double)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq === Seq(
      (1L, 10L, Some(20L), 5.0),   // superseded by seq 20
      (1L, 20L, None, 7.0),        // current
      (2L, 11L, Some(30L), 1.0),   // closed by the delete; no open row
      (3L, 40L, None, 9.0),        // re-insert after delete is current
      (4L, 13L, None, 2.0)))
  }

  test("scd2 intervals partition each key's history without overlap") {
    val out = Changelog.scd2(changes, "k", "seq", col("op") === "delete")
      .select("k", "valid_from", "valid_to")
      .as[(Long, Long, Option[Long])].collect()
    out.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, Some(to)), (_, from, _)) => assert(to <= from)
        case _ => ()
      }
      // at most one open (current) version per key
      assert(sorted.count(_._3.isEmpty) <= 1)
    }
  }

  test("compactState merges are batch-order invariant on random changelogs") {
    val rnd = new scala.util.Random(11)
    // 300 changes over 40 keys, unique seqs, ~20% deletes
    val all = rnd.shuffle((1L to 300L).toList).map { seq =>
      (rnd.nextInt(40).toLong, seq, rnd.nextInt(5) == 0, rnd.nextDouble())
    }
    def toDf(rows: Seq[(Long, Long, Boolean, Double)]) =
      rows.toDF("k", "seq", "_is_delete", "v")
    val whole = Changelog.compactState(toDf(all), "k", "seq")
      .orderBy("k").collect().toSeq
    // split into 3 batches, merge in a SHUFFLED order, re-compact each step
    val batches = rnd.shuffle(all.grouped(100).toList)
    val merged = batches.map(toDf).reduce((st, b) =>
      Changelog.compactState(st.unionByName(b), "k", "seq"))
      .orderBy("k").collect().toSeq
    assert(merged === whole)
    // and the tombstone-filtered view equals compactLatest over everything
    val viaState = Changelog.compactState(toDf(all), "k", "seq")
      .where(!col("_is_delete")).select("k", "seq", "v")
      .orderBy("k").collect().toSeq
    val direct = Changelog.compactLatest(
        toDf(all).withColumnRenamed("_is_delete", "del"), "k", "seq",
        col("del"))
      .select(col("k"), col("last_seq").as("seq"), col("last_v").as("v"))
      .orderBy("k").collect().toSeq
    assert(viaState === direct)
  }

  test("plan is a single aggregate — no window sort over history") {
    val plan = Changelog.compactLatest(changes, "k", "seq",
      col("op") === "delete").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "compaction must not use a window")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
  }

  test("datasetDiff: every status classified with exact checksums") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "t")
    val v2 = Seq((2L, "b"), (3L, "x"), (4L, "d")).toDF("id", "t")
    val r = Changelog.datasetDiff(v1, v2, "id", "t")
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r == Map(
      "removed" -> ((1L, 1L)), "unchanged" -> ((1L, 2L)),
      "changed" -> ((1L, 3L)), "added" -> ((1L, 4L))))
  }
}
