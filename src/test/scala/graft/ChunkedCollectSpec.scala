package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KHop
import graft.plans.ChunkedCollect

class ChunkedCollectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges = Seq(
    (1L, 10L, 20L), (1L, 11L, 21L), (1L, 12L, 22L), (1L, 13L, 23L),
    (2L, 14L, 24L), (3L, 15L, 25L), (3L, 16L, 26L))
    .toDF("origin", "src", "dst")

  test("custom physical operator plans with one exchange and chunks correctly") {
    val out = KHop.chunkNative(edges, maxListSize = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ChunkedCollect"))
    assert("Exchange".r.findAllIn(plan).size == 1)
    val rows = out.as[(Long, Seq[Long], Seq[Long])].collect()
    rows.foreach { case (_, s, d) =>
      assert(s.length == d.length && s.length <= 3 && s.nonEmpty)
    }
    // group 1 has 4 edges -> 2 chunks; groups 2, 3 -> 1 chunk each
    val chunksPerGroup = rows.groupBy(_._1).view.mapValues(_.length).toMap
    assert(chunksPerGroup == Map(1L -> 2, 2L -> 1, 3L -> 1))
    // multiset of (origin, src, dst) preserved and lists stay aligned
    val rebuilt = rows.flatMap { case (o, s, d) =>
      s.zip(d).map { case (a, b) => (o, a, b) }
    }.toSet
    assert(rebuilt == edges.as[(Long, Long, Long)].collect().toSet)
  }

  test("native and declarative chunking agree on the khop sample") {
    val sample = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (1L, 2L),
        (1L, 3L), (4L, 1L), (5L, 4L))
      .toDF("START_ID", "END_ID").withColumn("TYPE", lit("F"))
    val twoHop = KHop.twoHopEdges(sample)
    def flatten(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Seq[Long], Seq[Long])].collect().flatMap {
        case (o, s, d) => s.zip(d).map { case (a, b) => (o, a, b) }
      }.toSet
    assert(flatten(KHop.chunkNative(twoHop, 3)) ==
      flatten(KHop.chunk(twoHop, 3)))
  }

  test("maxSize 1 and string group keys work") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "v")
    val out = ChunkedCollect(df, "g", Seq("v"), maxSize = 1)
      .as[(String, Seq[Long])].collect().toSet
    assert(out == Set(("a", Seq(1L)), ("a", Seq(2L)), ("b", Seq(3L))))
  }

  test("multi-column groups with in-group sort emit ordered chunks") {
    val df = Seq(
      ("t1", 1L, 30L), ("t1", 1L, 10L), ("t1", 1L, 20L),
      ("t2", 1L, 5L), ("t1", 2L, 7L))
      .toDF("t", "g", "v")
    val out = ChunkedCollect(df, groups = Seq("t", "g"), values = Seq("v"),
        maxSize = 2, sortWithin = Seq("v"))
      .as[(String, Long, Seq[Long])].collect()
    // one exchange only, group (t1,1) split into sorted runs [10,20],[30]
    val byKey = out.groupBy(r => (r._1, r._2)).view
      .mapValues(_.toSeq.map(_._3).sortBy(_.head)).toMap
    assert(byKey(("t1", 1L)) == Seq(Seq(10L, 20L), Seq(30L)))
    assert(byKey(("t2", 1L)) == Seq(Seq(5L)))
    assert(byKey(("t1", 2L)) == Seq(Seq(7L)))
    out.foreach { case (_, _, vs) => assert(vs == vs.sorted) }
  }

  test("empty input produces no rows") {
    val df = Seq.empty[(Long, Long)].toDF("g", "v")
    assert(ChunkedCollect(df, "g", Seq("v"), 10).count() == 0)
  }
}
