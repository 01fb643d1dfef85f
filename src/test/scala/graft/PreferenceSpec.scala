package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Preference, Quality}

class PreferenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events(rows: (Long, String, Long, String, Double)*)
      : DataFrame =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts")))

  test("matchups: consecutive pairs, same-type and tied-value dropped") {
    val ev = events(
      (1L, "2024-01-01 00:00:01", 1L, "A", 1.0),
      (2L, "2024-01-01 00:00:02", 1L, "B", 2.0), // B beats A
      (3L, "2024-01-01 00:00:03", 1L, "A", 3.0), // A beats B
      (4L, "2024-01-01 00:00:04", 1L, "C", 1.0), // A beats C
      (5L, "2024-01-01 00:00:01", 2L, "A", 5.0),
      (6L, "2024-01-01 00:00:02", 2L, "A", 6.0), // same type: no match
      (7L, "2024-01-01 00:00:01", 3L, "B", 5.0),
      (8L, "2024-01-01 00:00:02", 3L, "C", 5.0)) // tied value: no match
    val m = Preference.matchups(ev)
      .as[(String, String)].collect().sorted.toSeq
    assert(m == Seq(("A", "B"), ("A", "C"), ("B", "A")))
  }

  test("btStrength: hand-computed MM fixed point, A beats B 2-1") {
    // W_A=2, W_B=1, n_AB=3. Round 1: d = 3e12 div 2e6 = 1.5e6 each;
    // s_A = 2e12 div 1.5e6 = 1333333, s_B = 1e12 div 1.5e6 = 666666.
    // Round 2: d = 3e12 div 1999999 = 1500000 -> same strengths
    // (converged); round 3 identical.
    val ev = events(
      (1L, "2024-01-01 00:00:01", 1L, "B", 1.0),
      (2L, "2024-01-01 00:00:02", 1L, "A", 2.0),
      (3L, "2024-01-01 00:00:01", 2L, "B", 1.0),
      (4L, "2024-01-01 00:00:02", 2L, "A", 2.0),
      (5L, "2024-01-01 00:00:01", 3L, "A", 1.0),
      (6L, "2024-01-01 00:00:02", 3L, "B", 2.0))
    val out = Preference.btStrength(ev, iters = 3)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(("A", 2L, 3L, 1333333L), ("B", 1L, 3L, 666666L)))
  }

  test("cyclicTriads: rock-paper-scissors is one cycle, zero consistency") {
    val ev = events(
      (1L, "2024-01-01 00:00:01", 1L, "S", 1.0),
      (2L, "2024-01-01 00:00:02", 1L, "R", 2.0), // R beats S
      (3L, "2024-01-01 00:00:01", 2L, "P", 1.0),
      (4L, "2024-01-01 00:00:02", 2L, "S", 2.0), // S beats P
      (5L, "2024-01-01 00:00:01", 3L, "R", 1.0),
      (6L, "2024-01-01 00:00:02", 3L, "P", 2.0)) // P beats R
    val r = Preference.cyclicTriads(ev)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // n=3 odd -> max = 3*(9-1)/24 = 1; one cycle -> consistency 0
    assert(r == Seq((3L, 3L, 0L, 1L, 1L, 0L)))
  }

  test("cyclicTriads: a 1-1 tied pair draws no edge; degenerate max") {
    val ev = events(
      (1L, "2024-01-01 00:00:01", 1L, "A", 1.0),
      (2L, "2024-01-01 00:00:02", 1L, "B", 2.0), // B beats A
      (3L, "2024-01-01 00:00:01", 2L, "B", 1.0),
      (4L, "2024-01-01 00:00:02", 2L, "A", 2.0)) // A beats B
    val r = Preference.cyclicTriads(ev)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // 2 items: zero edges, one tied pair, max_triads = 2*(4-4)/24 = 0
    // -> vacuous consistency 1e6
    assert(r == Seq((2L, 0L, 1L, 0L, 0L, 1000000L)))
  }

  test("cohenKappa: textbook 2x2 example is exactly 0.4") {
    // agree=35/50, marginals A(25,25) B(30,20): pe_num = 1250,
    // kappa = (1750-1250)/(2500-1250) = 0.4
    val pairs = (Seq.fill(20)(("x", "x")) ++ Seq.fill(5)(("x", "y")) ++
      Seq.fill(10)(("y", "x")) ++ Seq.fill(15)(("y", "y")))
      .toDF("a", "b")
    val r = Quality.cohenKappa(pairs, "a", "b")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((50L, 35L, 1250L, 400000L)))
  }

  test("cohenKappa: perfect disagreement floors to exactly -1") {
    val pairs = Seq(("x", "y"), ("y", "x")).toDF("a", "b")
    val r = Quality.cohenKappa(pairs, "a", "b")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((2L, 0L, 2L, -1000000L)))
  }

  test("cohenKappa: negative kappa uses floor (not truncation) semantics") {
    // 4 rows (x,x),(x,y),(x,z),(y,x): agree=1, marginals A(x3,y1)
    // B(x2,y1,z1): pe = 3*2 + 1*1 = 7, num = 4-7 = -3, den = 16-7 = 9.
    // floor(-3e6/9) = -333334; toward-zero truncation would say
    // -333333 — the engine divergence this operator's CASE removes.
    val pairs = Seq(("x", "x"), ("x", "y"), ("x", "z"), ("y", "x"))
      .toDF("a", "b")
    val r = Quality.cohenKappa(pairs, "a", "b")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((4L, 1L, 7L, -333334L)))
  }

  test("cohenKappa: single-class degenerate denominator reports 0") {
    val pairs = Seq(("x", "x"), ("x", "x"), ("x", "x")).toDF("a", "b")
    val r = Quality.cohenKappa(pairs, "a", "b")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((3L, 3L, 9L, 0L)))
  }

  test("streaming matchups carry predecessor state across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{PrefEvent, StatefulMatchups}
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val in = MemoryStream[PrefEvent]
    val qn = s"graft_smatch_${System.nanoTime()}"
    val q = StatefulMatchups.matches(in.toDS()).toDF()
      .writeStream.format("memory").queryName(qn)
      .outputMode("update").start()
    try {
      // batch 1: A(1) then B(2) -> B beats A; same-type and tied-value
      // pairs are dropped exactly as in the batch derivation
      in.addData(
        PrefEvent(1L, t("2024-01-01 00:00:01"), 1L, "A", 1.0),
        PrefEvent(1L, t("2024-01-01 00:00:02"), 2L, "B", 2.0),
        PrefEvent(2L, t("2024-01-01 00:00:01"), 3L, "C", 5.0),
        PrefEvent(2L, t("2024-01-01 00:00:02"), 4L, "C", 6.0))
      q.processAllAvailable()
      // batch 2: user 1's A(3) pairs with the PREVIOUS batch's B(2) —
      // the state carry the batch lag window gets from its global sort
      in.addData(PrefEvent(1L, t("2024-01-01 00:00:03"), 5L, "A", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(qn).as[(String, String)].collect().sorted.toSeq
    spark.catalog.dropTempView(qn)
    assert(got == Seq(("A", "B"), ("B", "A")))
  }

  test("streaming matchups match batch Spark-SQL double semantics (NaN, -0.0)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{PrefEvent, StatefulMatchups}
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // SQL: NaN = NaN (pair dropped), NaN > 5 (NaN wins), -0.0 = 0.0
    // (pair dropped) — Scala primitive comparisons disagree on all three
    val rows = Seq(
      (1L, "2024-01-01 00:00:01", 1L, "A", Double.NaN),
      (2L, "2024-01-01 00:00:02", 1L, "B", Double.NaN),
      (3L, "2024-01-01 00:00:03", 1L, "C", 5.0),
      (4L, "2024-01-01 00:00:01", 2L, "A", -0.0),
      (5L, "2024-01-01 00:00:02", 2L, "B", 0.0))
    val batch = Preference.matchups(events(rows: _*))
      .as[(String, String)].collect().sorted.toSeq
    assert(batch == Seq(("B", "C")))
    val in = MemoryStream[PrefEvent]
    val qn = s"graft_smatch_nan_${System.nanoTime()}"
    val q = StatefulMatchups.matches(in.toDS()).toDF()
      .writeStream.format("memory").queryName(qn)
      .outputMode("update").start()
    try {
      // split so the NaN predecessor crosses a batch boundary
      in.addData(
        PrefEvent(1L, t("2024-01-01 00:00:01"), 1L, "A", Double.NaN),
        PrefEvent(1L, t("2024-01-01 00:00:02"), 2L, "B", Double.NaN))
      q.processAllAvailable()
      in.addData(
        PrefEvent(1L, t("2024-01-01 00:00:03"), 3L, "C", 5.0),
        PrefEvent(2L, t("2024-01-01 00:00:01"), 4L, "A", -0.0),
        PrefEvent(2L, t("2024-01-01 00:00:02"), 5L, "B", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(qn).as[(String, String)].collect().sorted.toSeq
    spark.catalog.dropTempView(qn)
    assert(got == batch)
  }

  test("streaming matchups fail loudly on a cross-batch arrival violation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{PrefEvent, StatefulMatchups}
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val in = MemoryStream[PrefEvent]
    val qn = s"graft_smatch_ooo_${System.nanoTime()}"
    val q = StatefulMatchups.matches(in.toDS()).toDF()
      .writeStream.format("memory").queryName(qn)
      .outputMode("update").start()
    try {
      in.addData(PrefEvent(1L, t("2024-01-01 00:00:05"), 1L, "A", 1.0))
      q.processAllAvailable()
      // a batch-2 event BEHIND the carried predecessor violates the
      // per-user time-ordered arrival contract — silent as-if-newest
      // pairing would drift from the batch oracle, so it must throw
      in.addData(PrefEvent(1L, t("2024-01-01 00:00:01"), 2L, "B", 2.0))
      val ex = intercept[Exception] { q.processAllAvailable() }
      def chain(e: Throwable): Seq[Throwable] =
        if (e == null) Seq.empty else e +: chain(e.getCause)
      assert(chain(ex).exists(c =>
        c.getMessage != null && c.getMessage.contains("out-of-order arrival")))
    } finally {
      try q.stop() catch { case _: Exception => () }
      spark.catalog.dropTempView(qn)
    }
  }

  test("btStrength and cyclicTriads are repartition-stable") {
    val ev = events(
      (1L, "2024-01-01 00:00:01", 1L, "S", 1.0),
      (2L, "2024-01-01 00:00:02", 1L, "R", 2.0),
      (3L, "2024-01-01 00:00:01", 2L, "P", 1.0),
      (4L, "2024-01-01 00:00:02", 2L, "S", 2.0),
      (5L, "2024-01-01 00:00:01", 3L, "R", 1.0),
      (6L, "2024-01-01 00:00:02", 3L, "P", 2.0),
      (7L, "2024-01-01 00:00:03", 3L, "S", 3.0))
    val a = Preference.btStrength(ev, iters = 3).collect().toSet
    val b = Preference.btStrength(ev.repartition(7), iters = 3)
      .collect().toSet
    assert(a == b)
    val c = Preference.cyclicTriads(ev).collect().toSeq
    val d = Preference.cyclicTriads(ev.repartition(5)).collect().toSeq
    assert(c == d)
  }
}
