package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats

class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("groupedOls: exact fit on a perfect line, per group") {
    // A: y = 2x + 1 over x = 0,1,2 — slope 2.0, intercept 1.0 exactly
    // (numerator/denominator divide without FP residue);
    // B: constant y = 7 — slope 0.0, intercept 7.0
    val pts = Seq(("A", 0L, 1L), ("A", 1L, 3L), ("A", 2L, 5L),
      ("B", 0L, 7L), ("B", 1L, 7L)).toDF("g", "x", "y")
    val r = Stats.groupedOls(pts, "g", "x", "y")
      .select("g", "n", "slope", "intercept")
      .as[(String, Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r == Map("A" -> ((3L, 2.0, 1.0)), "B" -> ((2L, 0.0, 7.0))))
  }

  test("corrPairs: perfect correlation and all pairs emitted") {
    // y = 2x → r ≈ 1; z anti-correlated with x → r ≈ −1
    val df = Seq((1L, 2L, 3L), (2L, 4L, 2L), (3L, 6L, 1L))
      .toDF("x", "y", "z")
    val out = Stats.corrPairs(df, Seq("x", "y", "z"))
      .as[(String, String, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._4).toMap
    assert(out.keySet == Set(("x", "y"), ("x", "z"), ("y", "z")))
    assert(math.abs(out(("x", "y")) - 1.0) < 1e-12)
    assert(math.abs(out(("x", "z")) + 1.0) < 1e-12)
    assert(math.abs(out(("y", "z")) + 1.0) < 1e-12)
  }

  test("groupedOls moment sums are exactly the hand-computed integers") {
    val pts = Seq(("A", 0L, 1L), ("A", 1L, 3L), ("A", 2L, 5L))
      .toDF("g", "x", "y")
    val r = Stats.groupedOls(pts, "g", "x", "y")
      .select("n", "sx", "sy", "sxy", "sxx")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(r == ((3L, 3L, 9L, 13L, 5L)))
  }

  test("chiSquare: balanced 2x2 table matches the hand-computed statistic") {
    // counts: (a,x)=10 (a,y)=20 (b,x)=20 (b,y)=10; all expected = 15
    // per cell: (O·N − rT·cT)² / (rT·cT·N) = 90000/54000 → ·10⁶ floored
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val r = Stats.chiSquare(rows.toDF("ka", "kb"), "ka", "kb")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(r == ((60L, 2L, 2L, 1L, 4L * 1666666L)))
  }

  test("chiSquare: independent columns score zero") {
    // perfectly proportional table → every O equals E exactly
    val rows = for (a <- Seq("a", "b"); x <- Seq("x", "y", "z");
                    _ <- 0 until 5) yield (a, x)
    val r = Stats.chiSquare(rows.toDF("ka", "kb"), "ka", "kb")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(r == ((30L, 2L, 3L, 2L, 0L)))
  }

  test("paretoFront matches the brute domination test") {
    import org.apache.spark.sql.functions.col
    val pts = Seq((10L, 5L), (10L, 3L), (9L, 1L), (8L, 2L), (7L, 0L),
      (7L, 6L), (10L, 3L)) // duplicate pair folds to n_rows = 2
    val out = Stats.paretoFront(pts.toDF("p", "d"), col("p"), col("d"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((10L, 3L, 2L), (9L, 1L, 1L), (7L, 0L, 1L)))
    // brute: a kept pair is dominated by no other distinct pair
    val distinct = pts.distinct
    for ((p, d, _) <- out; (p2, d2) <- distinct)
      assert(!(p2 >= p && d2 <= d && (p2 > p || d2 < d)),
        s"($p,$d) dominated by ($p2,$d2)")
  }
}
