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

  test("v_filled is never null: each grid starts at the first observation") {
    val ev = Seq((9L, ts(5), 1L, 1.5), (9L, ts(8), 2L, 2.5))
      .toDF("user_id", "ts", "event_id", "value")
    val out = Timeseries.resampleFfill(ev, "user_id", "ts", "event_id",
      "value", bucketUs = H)
    assert(out.where("v_filled IS NULL").count() === 0L)
    assert(out.count() === 4L)  // buckets 5..8
  }
}
