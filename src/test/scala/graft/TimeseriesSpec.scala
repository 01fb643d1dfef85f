package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Timeseries

class TimeseriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = 3600000000L // one hour in µs
  private def ts(hour: Int, min: Int = 0): Timestamp =
    new Timestamp(hour * 3600000L + min * 60000L)

  test("resample keeps the latest observation per bucket and ffills gaps") {
    val ev = Seq(
      (1L, ts(0, 5), 1L, 10.0),
      (1L, ts(0, 1), 2L, 12.0),  // higher seq wins the bucket despite ts
      (1L, ts(3, 0), 3L, 7.0),
      (2L, ts(1, 0), 4L, 5.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Timeseries.resampleFfill(ev, "user_id", "ts", "event_id",
        "value", bucketUs = H)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq === Seq(
      (1L, 0L, 2L, 12.0),
      (1L, 1L, 0L, 12.0),   // gap: carried forward
      (1L, 2L, 0L, 12.0),
      (1L, 3L, 1L, 7.0),
      (2L, 1L, 1L, 5.0)))   // grid is per-entity, not global
  }

  test("lagFeatures: integer-cents lags and a shrinking rolling frame") {
    val grid = Seq(
      (1L, 0L, 1.10), (1L, 1L, 2.20), (1L, 2L, 3.30), (1L, 3L, 4.40)
    ).toDF("user_id", "bucket", "v_filled")
    val out = Timeseries.lagFeatures(grid, "user_id", "bucket", "v_filled",
        lags = Seq(1, 2), rollK = 3)
      .as[(Long, Long, Long, Option[Long], Option[Long], Long)]
      .collect().sortBy(_._2)
    assert(out.toSeq === Seq(
      (1L, 0L, 110L, None, None, 110L),
      (1L, 1L, 220L, Some(110L), None, 330L),
      (1L, 2L, 330L, Some(220L), Some(110L), 660L),
      (1L, 3L, 440L, Some(330L), Some(220L), 990L)))  // frame drops 110
  }

  test("v_filled is never null: each grid starts at the first observation") {
    val ev = Seq((9L, ts(5), 1L, 1.5), (9L, ts(8), 2L, 2.5))
      .toDF("user_id", "ts", "event_id", "value")
    val out = Timeseries.resampleFfill(ev, "user_id", "ts", "event_id",
      "value", bucketUs = H)
    assert(out.where("v_filled IS NULL").count() === 0L)
    assert(out.count() === 4L)  // buckets 5..8
  }

  test("mergeIntervals: overlap and touch merge, strict gap opens") {
    // A: [1,5]+[4,8] overlap → island [1,8]; [10,12] opens (10 > 8).
    // B: [1,2]+[2,3] touch (2 ≯ 2) → one island [1,3].
    val iv = Seq(("A", 1L, 5L), ("A", 4L, 8L), ("A", 10L, 12L),
      ("B", 1L, 2L), ("B", 2L, 3L)).toDF("k", "s", "e")
    val out = Timeseries.mergeIntervals(iv, "k", "s", "e")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out == Map(
      ("A", 1L) -> ((1L, 8L, 2L)), ("A", 2L) -> ((10L, 12L, 1L)),
      ("B", 1L) -> ((1L, 3L, 2L))))
  }

  test("mergeIntervals equals a driver-side sort-and-merge on random data") {
    val rnd = new scala.util.Random(47)
    val iv = Seq.fill(120) {
      val k = s"k${rnd.nextInt(5)}"
      val s = rnd.nextInt(60).toLong
      (k, s, s + 1 + rnd.nextInt(8).toLong)
    }
    val brute = iv.groupBy(_._1).flatMap { case (k, rows) =>
      val sorted = rows.map(r => (r._2, r._3)).sortBy(identity)
      val islands = sorted.tail.foldLeft(
        List((sorted.head._1, sorted.head._2, 1L))) {
        case ((st, en, n) :: rest, (s, e)) =>
          if (s > en) (s, e, 1L) :: (st, en, n) :: rest
          else (st, math.max(en, e), n + 1) :: rest
        case (Nil, _) => Nil
      }.reverse
      islands.zipWithIndex.map { case ((st, en, n), i) =>
        (k, i + 1L, st, en, n)
      }
    }.toSet
    val out = Timeseries.mergeIntervals(iv.toDF("k", "s", "e"), "k", "s", "e")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out == brute,
      s"missing: ${brute.diff(out)}, extra: ${out.diff(brute)}")
  }

  test("seasonalProfile: day buckets fold to exact dow means") {
    // day 0 (dow 0): 2 events; day 7 (dow 0): 1; day 1 (dow 1): 3 —
    // dow 0: n_days 2, total 3, mean 1500 milli; dow 1: 1 day, 3, 3000
    val us = 86400000000L
    val ev = Seq(
      (1L, "a", 0L), (2L, "a", 1000L), (3L, "a", 7L * us),
      (4L, "a", us), (5L, "a", us + 5L), (6L, "a", us + 9L)
    ).map { case (id, t, micros) =>
      (id, t, new java.sql.Timestamp(micros / 1000L))
    }.toDF("event_id", "event_type", "ts")
    val r = Timeseries.seasonalProfile(ev, "event_type", "ts")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._2 -> ((t._3, t._4, t._5))).toMap
    assert(r == Map(0L -> ((2L, 3L, 1500L)), 1L -> ((1L, 3L, 3000L))))
  }

  test("anomalyMad flags the spike day via exact rank-test medians") {
    // "a": counts 5×6 then 50 → med 5, MAD 0, spike flagged (strict >)
    // "b": counts 1,2,3,4,100 → med 3, MAD 1; only dev 97 > 2·MAD
    def day(d: Int) = new Timestamp(d * 86400000L)
    var id = 0L
    val rows = for {
      (t, counts) <- Seq("a" -> Seq(5, 5, 5, 5, 5, 5, 50),
        "b" -> Seq(1, 2, 3, 4, 100))
      (n, d) <- counts.zipWithIndex
      _ <- 1 to n
    } yield { id += 1; (id, t, day(d)) }
    val ev = rows.toDF("event_id", "event_type", "ts")
    val out = Timeseries.anomalyMad(ev, "event_type", "ts", k = 2L)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(("a", 6L, 50L, 5L, 0L, 45L),
      ("b", 4L, 100L, 3L, 1L, 97L)))
  }

  test("changepointCusum peaks at the level shift") {
    // counts 10,10,10,20,20,20 → mean 15: cusum −5k,−10k,−15k,−10k,−5k,0
    // peaks (|·|) at day 2, the last pre-shift day
    def day(d: Int) = new Timestamp(d * 86400000L)
    var id = 0L
    val rows = for {
      (n, d) <- Seq(10, 10, 10, 20, 20, 20).zipWithIndex
      _ <- 1 to n
    } yield { id += 1; (id, "a", day(d)) }
    val out = Timeseries.changepointCusum(
        rows.toDF("event_id", "event_type", "ts"), "event_type", "ts")
      .as[(String, Long, Long, Long)].collect().toList
    assert(out == List(("a", 2L, -15000L, 6L)))
  }

  test("mergeIntervals: contained interval does not reopen an island") {
    // [1,10] then [2,3] (contained) then [4,20]: all one island — the
    // running-max (not previous-row) end is what prevents a false gap
    val iv = Seq(("K", 1L, 10L), ("K", 2L, 3L), ("K", 4L, 20L))
      .toDF("k", "s", "e")
    val out = Timeseries.mergeIntervals(iv, "k", "s", "e")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.toList == List(("K", 1L, 1L, 20L, 3L)))
  }
}
