package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{RangeJoin, TopK}

class TopKRangeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("aggregator top-k equals the window formulation") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 500L).map(i =>
      (i % 13, rnd.nextInt(100).toDouble, i, i))
      .toDF("k", "ord", "tb", "payload")
    val got = TopK.perKey(rows, "k", "ord", "tb", "payload", k = 3)
      .as[(Long, Long, Double, Long)].collect().toSet
    val want = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      rows.withColumn("rn", row_number().over(
          Window.partitionBy(col("k"))
            .orderBy(col("ord").desc, col("tb"))).cast("long"))
        .where(col("rn") <= 3)
        .select(col("k"), col("payload"), col("ord"), col("rn"))
        .as[(Long, Long, Double, Long)].collect().toSet
    }
    assert(got == want)
  }

  test("range join counts exactly the trailing-window rows across buckets") {
    def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    // window 60s; events placed to straddle bucket boundaries
    val left = Seq((100L, 1L, ts(90)), (101L, 1L, ts(200)), (102L, 2L, ts(50)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts(31)),   // 59s before left 100 -> in window (crosses bucket)
      (1L, ts(89)),   // 1s before -> in window
      (1L, ts(90)),   // equal ts -> excluded (strict)
      (1L, ts(150)),  // 50s before left 101 -> in window
      (2L, ts(49))    // user 2, 1s before -> in window
    ).toDF("user_id", "ts")
    val got = RangeJoin.countPriorWithin(left, right, "user_id", "ts",
        "event_id", windowMicros = 60L * 1000000L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(100L -> 2L, 101L -> 1L, 102L -> 1L))
  }
}
