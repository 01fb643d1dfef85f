package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quality

class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("referentialAudit counts exactly the dangling foreign keys") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq((10L, 1L), (11L, 2L), (12L, 2L), (13L, 9L), (14L, 8L))
      .toDF("id", "fk")
    val clean = Seq((20L, 3L)).toDF("id", "fk")
    val out = Quality.referentialAudit(Seq(
        ("child.fk", child, "fk", parent, "pk"),
        ("clean.fk", clean, "fk", parent, "pk")))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("child.fk") === (("child.fk", 5L, 2L)))  // fks 9 and 8 dangle
    assert(out("clean.fk") === (("clean.fk", 1L, 0L)))
  }

  test("anonymityAudit: exact k-anonymity and l-diversity flags") {
    // QI (city): "a" has 3 rows / 2 distinct salaries; "b" has 1 row / 1
    val rows = Seq(
      ("a", 100L), ("a", 100L), ("a", 200L),
      ("b", 300L)).toDF("city", "salary")
    val r = Quality.anonymityAudit(rows, Seq("city"), "salary",
        k = 2L, l = 2L)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // 2 groups; "b" below k (1 row); min size 1; "b" below l; min l 1
    assert(r === ((2L, 1L, 1L, 1L, 1L, 1L)))
  }

  test("fdAudit: holding and violated dependencies, exact counts") {
    val df = Seq((1L, "a", "x"), (2L, "a", "x"), (3L, "b", "y"),
      (4L, "b", "z")).toDF("id", "g", "v")
    val r = Quality.fdAudit(df, Seq(("id", "g"), ("g", "v")))
      .collect().map(row => row.getString(0) ->
        ((row.getLong(1), row.getLong(2), row.getLong(3),
          row.getBoolean(4)))).toMap
    assert(r("id->g") == ((4L, 4L, 0L, true)))
    // g=b maps to both y and z: 3 distinct (g,v) vs 2 distinct g
    assert(r("g->v") == ((2L, 3L, 1L, false)))
  }

  test("fdAudit: explicit null semantics — NULL x excluded, NULL y " +
      "is a distinct mapping (violations never negative)") {
    val df = Seq(
      (Some("a"), Some("x")),   // a -> x
      (Some("a"), None),        // a -> NULL: a SECOND mapping for a
      (Some("b"), Some("y")),   // b -> y (holds for b)
      (None, Some("z")),        // NULL x: no dependency evidence
      (None, None)
    ).toDF("g", "v")
    val r = Quality.fdAudit(df, Seq(("g", "v"))).collect().head
    // n_x = {a, b} = 2; n_xy = {(a,x), (a,NULL), (b,y)} = 3 — the old
    // countDistinct(x, y) dropped (a,NULL) entirely, giving n_xy = 2
    // and a vacuous holds=true while a genuinely maps to two values
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
      == ((2L, 3L, 1L, false)))
  }
}
