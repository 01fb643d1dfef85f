package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

case class AsOfEv(event_id: Long, user_id: Long, ts: Timestamp, kind: String)

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private def Ev(event_id: Long, user_id: Long, ts: Timestamp, kind: String) =
    AsOfEv(event_id, user_id, ts, kind)

  test("matches latest strictly-prior right row per key") {
    val left = Seq(
      Ev(10, 1, ts(5), "x"), Ev(11, 1, ts(20), "x"), Ev(12, 2, ts(9), "x"))
    val right = Seq(
      Ev(1, 1, ts(1), "s"), Ev(2, 1, ts(10), "s"), Ev(3, 2, ts(30), "s"))
    val out = AsOfJoin.asOf(left.toDF(), right.toDF(), "user_id", "ts",
        "event_id", Map("event_id" -> "match_id"))
      .select("event_id", "match_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(10L) == Some(1L))   // ts(5): only ts(1) is prior
    assert(out(11L) == Some(2L))   // ts(20): latest prior is ts(10)
    assert(out(12L) == None)       // user 2 has no prior right row
  }

  test("equal timestamps do not match (strict inequality)") {
    val left = Seq(Ev(10, 1, ts(10), "x"))
    val right = Seq(Ev(1, 1, ts(10), "s"))
    val out = AsOfJoin.asOf(left.toDF(), right.toDF(), "user_id", "ts",
        "event_id", Map("event_id" -> "match_id"))
      .select("event_id", "match_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(10L) == None)
  }

  test("ties among right rows at one ts resolve to the largest tiebreak") {
    val left = Seq(Ev(10, 1, ts(10), "x"))
    val right = Seq(Ev(1, 1, ts(5), "s"), Ev(2, 1, ts(5), "s"))
    val out = AsOfJoin.asOf(left.toDF(), right.toDF(), "user_id", "ts",
        "event_id", Map("event_id" -> "match_id"))
      .select("event_id", "match_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(10L) == Some(2L))
  }

  test("forward as-of matches the earliest strictly-later right row; " +
      "equal ts excluded; ties take the smallest tiebreak") {
    val left = Seq(
      Ev(10, 1, ts(5), "x"),   // next right: ts(10)
      Ev(11, 1, ts(10), "x"),  // equal ts excluded → ts(30)
      Ev(12, 2, ts(9), "x"),   // user 2 has no later right row
      Ev(13, 3, ts(0), "x"))   // tie at ts(4): smallest id wins
    val right = Seq(
      Ev(1, 1, ts(1), "s"), Ev(2, 1, ts(10), "s"), Ev(3, 1, ts(30), "s"),
      Ev(4, 2, ts(2), "s"),
      Ev(6, 3, ts(4), "s"), Ev(5, 3, ts(4), "s"))
    val out = AsOfJoin.asOfForward(left.toDF(), right.toDF(), "user_id",
        "ts", "event_id", Map("event_id" -> "match_id"))
      .select("event_id", "match_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(10L) == Some(2L))
    assert(out(11L) == Some(3L))
    assert(out(12L) == None)
    assert(out(13L) == Some(5L))
  }
}
