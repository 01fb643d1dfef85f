package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed build: key 1 has 500 rows (supernode), keys 2-20 one row each
  private def build = ((1 to 500).map(i => (1L, i.toLong)) ++
    (2 to 20).map(k => (k.toLong, 1000L + k))).toDF("k", "bv")
  private def probe = (1 to 40).map(i => ((i % 21).toLong, i.toLong))
    .toDF("k", "pv")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "pv", "bv").as[(Long, Long, Long)].collect().sorted.toSeq

  test("salted join equals the plain join") {
    val plain = probe.join(build, Seq("k"))
    val salted = Skew.saltedJoin(probe, build, "k", salt = 8)
    assert(canon(salted) == canon(plain))
  }

  test("degree-split join equals the plain join and broadcasts the hot side") {
    val plain = probe.join(build, Seq("k"))
    val split = Skew.degreeSplitJoin(probe, build, "k", hotThreshold = 100)
    assert(canon(split) == canon(plain))
    val physical = split.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"))
  }

  test("degree-split with no hot keys degrades to the plain join result") {
    val split = Skew.degreeSplitJoin(probe, build, "k",
      hotThreshold = 1000000)
    assert(canon(split) == canon(probe.join(build, Seq("k"))))
  }
}
