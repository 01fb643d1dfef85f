package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics

class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  test("funnel enforces strict stage order per entity") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, ts(0), "view"), (1L, ts(5), "click"), (1L, ts(9), "buy"),
      // user 2: clicked BEFORE viewing — click must not count
      (2L, ts(3), "click"), (2L, ts(4), "view"),
      // user 3: view then click, no buy
      (3L, ts(0), "view"), (3L, ts(1), "click"),
      // user 4: buy with no view — counts nowhere
      (4L, ts(0), "buy")
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnel(ev, "user_id", "ts", Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "buy" -> (col("event_type") === "buy")))
      .as[(String, Long)].collect().toMap
    assert(out === Map("1_view" -> 3L, "2_click" -> 2L, "3_buy" -> 1L))
  }

  test("funnel uses the EARLIEST qualifying time at each stage") {
    // user's first view at t0; a click at t1 qualifies even though a
    // later view (t2) exists; the buy between them must chain off t1
    val ev = Seq(
      (1L, ts(0), "view"), (1L, ts(1), "click"),
      (1L, ts(2), "view"), (1L, ts(3), "buy")
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnel(ev, "user_id", "ts", Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "buy" -> (col("event_type") === "buy")))
      .as[(String, Long)].collect().toMap
    assert(out.values.toSeq.forall(_ == 1L))
  }

  test("funnelWithin: later stages must land within the window of the " +
      "stage-1 time (strict order kept)") {
    def dts(d: Int, min: Int = 0) =
      new Timestamp(d * 86400000L + min * 60000L)
    val w3d = 3L * 86400000000L
    val ev = Seq(
      // user 1: view d0, click d1, buy d2 — all inside the 3-day window
      (1L, dts(0), "view"), (1L, dts(1), "click"), (1L, dts(2), "buy"),
      // user 2: click only on day 4 — outside the window entirely
      (2L, dts(0), "view"), (2L, dts(4), "click"),
      // user 3: buy at d3+1min — 1 minute past t1 + 3d, must not count
      (3L, dts(0), "view"), (3L, dts(1), "click"), (3L, dts(3, 1), "buy"),
      // user 4: buy BEFORE the click — order still strict
      (4L, dts(0), "view"), (4L, dts(2), "click"), (4L, dts(1), "buy")
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnelWithin(ev, "user_id", "ts", Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "buy" -> (col("event_type") === "buy")), windowUs = w3d)
      .as[(String, Long)].collect().toMap
    assert(out === Map("1_view" -> 4L, "2_click" -> 3L, "3_buy" -> 1L))
    // sanity: the unwindowed funnel would pass user 3's buy
    val open = EventAnalytics.funnel(ev, "user_id", "ts", Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "buy" -> (col("event_type") === "buy")))
      .as[(String, Long)].collect().toMap
    assert(open("3_buy") == 2L)
  }

  test("cohort retention builds the triangle on day buckets") {
    val day = 86400000000L
    def dts(d: Int, min: Int = 1) = new Timestamp(d * 86400000L + min * 60000L)
    val ev = Seq(
      (1L, dts(0)), (1L, dts(1)), (1L, dts(3)),   // cohort 0, active 0/1/3
      (2L, dts(0)), (2L, dts(3)),                  // cohort 0, active 0/3
      (3L, dts(1)), (3L, dts(2))                   // cohort 1, active 1/2
    ).toDF("user_id", "ts")
    val out = EventAnalytics.cohortRetention(ev, "user_id", "ts", day)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out === Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 2L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("assocRules: exact integer confidence and lift") {
    // b1{1,2} b2{1,2} b3{1,3}: n(1)=3 n(2)=2 n(3)=1, N=3
    // 1→2 conf ⌊2e6/3⌋=666666, lift 2·3e6/(3·2)=1e6; 2→1 conf 1e6;
    // 1→3 conf 333333; 3→1 conf 1e6 — all lifts 1e6, ties by (x,y)
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L),
      (3L, 3L)).toDF("bk", "it")
    val out = EventAnalytics.assocRules(df, "bk", "it",
      maxBasket = 5, k = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(out == List(
      (1L, 2L, 2L, 666666L, 1000000L), (1L, 3L, 1L, 333333L, 1000000L),
      (2L, 1L, 2L, 1000000L, 1000000L), (3L, 1L, 1L, 1000000L, 1000000L)))
  }

  test("assocRules equals a driver-side computation on random baskets") {
    val rnd = new scala.util.Random(41)
    val rows = Seq.fill(150)((rnd.nextInt(20).toLong, rnd.nextInt(8).toLong))
    val items = rows.distinct
    val itemN = items.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nb = items.map(_._1).distinct.size.toLong
    val pairCnt = items.groupBy(_._1).values.flatMap { b =>
      val its = b.map(_._2).sorted
      for (i <- its.indices; j <- its.indices if i < j)
        yield (its(i), its(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val brute = pairCnt.toSeq.flatMap { case ((a, b), cab) =>
      Seq((a, b, cab), (b, a, cab)) }.map { case (x, y, cab) =>
      (x, y, cab, cab * 1000000L / itemN(x),
        cab * nb * 1000000L / (itemN(x) * itemN(y)))
    }.sortBy { case (x, y, _, _, l) => (-l, x, y) }
    val out = EventAnalytics.assocRules(rows.toDF("bk", "it"), "bk", "it",
        maxBasket = 100, k = 1000)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(out == brute)
  }

  test("topPaths: ordered journeys truncate at maxLen and count exactly") {
    val us = 86400000000L
    // user 1 day 0: a>b>c>d>e (truncates to a>b>c>d); user 2 day 0:
    // a>b>c>d; user 3 day 0: b>a
    val ev = (Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L), ("e", 5L))
        .map { case (t, i) => (i, 1L, i * 1000L, t) } ++
      Seq(("a", 11L), ("b", 12L), ("c", 13L), ("d", 14L))
        .map { case (t, i) => (i, 2L, (i - 10) * 1000L, t) } ++
      Seq(("b", 21L), ("a", 22L))
        .map { case (t, i) => (i, 3L, (i - 20) * 1000L, t) })
      .map { case (id, u, micros, t) =>
        (id, u, new java.sql.Timestamp(micros / 1000L), t)
      }.toDF("event_id", "user_id", "ts", "event_type")
    val r = EventAnalytics.topPaths(ev, "user_id", "ts", "event_id",
        "event_type", maxLen = 4, k = 5)
      .as[(String, Long)].collect().toList
    assert(r == List(("a>b>c>d", 2L), ("b>a", 1L)))
    val _ = us
  }

  test("assocTriples: a-priori growth finds the planted frequent triple") {
    // baskets 1..3 all hold {1,2,3}; basket 4 holds {1,2,9} — triple
    // (1,2,3) support 3; every pair of it is frequent; (1,2,9) support 1
    // falls below minSup
    val rows = (1L to 3L).flatMap(b => Seq((b, 1L), (b, 2L), (b, 3L))) ++
      Seq((4L, 1L), (4L, 2L), (4L, 9L))
    val df = rows.toDF("bk", "it")
    val r = EventAnalytics.assocTriples(df, "bk", "it", maxBasket = 5,
        minSup = 3L, k = 10)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(r == List((1L, 2L, 3L, 3L)))
  }

  test("transitionMatrix: hand-computed chain with exact ppm") {
    // user 1: a→b→a; user 2: a→b. transitions: (a,b)×2, (b,a)×1.
    // from a: 2/2 to b → 1e6 ppm; from b: 1/1 to a → 1e6 ppm... make it
    // non-trivial: user 3: a→c. from a: b×2, c×1 → 666666 / 333333 ppm.
    val ev = Seq(
      (1L, 1L, 10L, "a"), (2L, 1L, 20L, "b"), (3L, 1L, 30L, "a"),
      (4L, 2L, 10L, "a"), (5L, 2L, 20L, "b"),
      (6L, 3L, 10L, "a"), (7L, 3L, 20L, "c")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val r = EventAnalytics.transitionMatrix(ev, "user_id", "ts",
        "event_id", "event_type")
      .as[(String, String, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    assert(r == Map(
      ("a", "b") -> ((2L, 666666L)), ("a", "c") -> ((1L, 333333L)),
      ("b", "a") -> ((1L, 1000000L))))
  }

  test("basketPairs: pair counts with the basket-size cap") {
    // b1 {1,2,3}, b2 {2,3} (duplicate item rows collapse), b3 has 6
    // items > cap 5 → dropped whole
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 2L), (2L, 3L),
      (2L, 3L)) ++ (1L to 6L).map(i => (3L, 100L + i))
    val df = rows.toDF("bk", "it")
    val out = EventAnalytics.basketPairs(df, "bk", "it",
      maxBasket = 5, k = 10).as[(Long, Long, Long)].collect().toList
    assert(out == List((2L, 3L, 2L), (1L, 2L, 1L), (1L, 3L, 1L)))
  }

  test("precedencePairs compares first occurrences and skips ties") {
    // u1: view@1, click@3, view@5 (repeat ignored) → view<click only;
    // u2: view@2 and click@2 tie → no evidence either way;
    // u3: click@1, view@4 → click<view
    val ev = Seq(
      (1L, ts(1), "view"), (1L, ts(3), "click"), (1L, ts(5), "view"),
      (2L, ts(2), "view"), (2L, ts(2), "click"),
      (3L, ts(1), "click"), (3L, ts(4), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.precedencePairs(ev, "user_id", "ts",
        "event_type")
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("view", "click", 1L), ("click", "view", 1L)))
  }

  test("rfmScores: cents-exact tiers anchored on the corpus max time") {
    val day = 86400000L // ms
    val e = Seq(
      (1L, 1L, new Timestamp(0L), "purchase", 100.0),
      (2L, 1L, new Timestamp(9 * day), "purchase", 150.0),
      (3L, 2L, new Timestamp(1 * day), "purchase", 600.0),
      (4L, 1L, new Timestamp(9 * day), "click", 5.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = EventAnalytics.rfmScores(e, "user_id", "ts", col("value"),
        convPred = col("event_type") === "purchase")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))).toMap
    // user 1: last = day 9 (corpus max) -> r_days 0 -> 3; f 2 -> 1;
    // 25000 cents -> 2 -> rfm 312
    assert(out(1L) == ((0L, 2L, 25000L, 3L, 1L, 2L, 312L)))
    // user 2: r_days 8 -> 1; f 1 -> 1; 60000 cents -> 3 -> rfm 113
    assert(out(2L) == ((8L, 1L, 60000L, 1L, 1L, 3L, 113L)))
  }

  test("attribution: linear split, first/last ids, organic kept") {
    def ev(id: Long, u: Long, t: Long, ty: String) =
      (id, u, new Timestamp(t), ty)
    // user 1: clicks at 1000, 2000 then purchase at 3000 (both in the
    // 5-second window); user 2: purchase with no clicks; user 3: click
    // AFTER the purchase only
    val e = Seq(
      ev(11L, 1L, 1000L, "click"), ev(12L, 1L, 2000L, "click"),
      ev(13L, 1L, 3000L, "purchase"),
      ev(20L, 2L, 1000L, "purchase"),
      ev(31L, 3L, 2000L, "purchase"), ev(32L, 3L, 3000L, "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = EventAnalytics.attribution(e, "user_id", "ts", "event_id",
        touchPred = col("event_type") === "click",
        convPred = col("event_type") === "purchase",
        lookbackUs = 5000000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(out(13L) == ((2L, 500000L, 11L, 12L)))
    assert(out(20L) == ((0L, 0L, -1L, -1L)))
    assert(out(31L) == ((0L, 0L, -1L, -1L)))
  }
}
