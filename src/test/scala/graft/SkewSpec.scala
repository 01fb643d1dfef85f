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

  test("keyProfile: hand-computed Gini, percentiles, and hot key") {
    // keys 1×3, 2×2, 3×1 → ascending freqs [1,2,3]:
    // gini_num = (2·1−4)·1 + (4−4)·2 + (6−4)·3 = 4, den = 3·6 = 18
    // p50 rank ⌈1.5⌉=2 → 2; p99 rank ⌈2.97⌉=3 → 3; hot key 1
    val df = Seq(1L, 1L, 1L, 2L, 2L, 3L).toDF("k2")
    val r = Skew.keyProfile(df, "k2")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(r == ((3L, 6L, 3L, 2L, 3L, 1L, 4L, 18L)))
  }

  test("keyProfile matches the brute per-key-rank Gini on random data") {
    val rnd = new scala.util.Random(53)
    val keys = Seq.fill(400)(rnd.nextInt(40).toLong)
    val counts = keys.groupBy(identity).view.mapValues(_.size.toLong)
      .toMap
    val xs = counts.values.toSeq.sorted
    val n = xs.size.toLong
    val gini = xs.zipWithIndex.map { case (x, i0) =>
      (2L * (i0 + 1) - n - 1L) * x
    }.sum
    def pct(q: Long): Long = xs((((q * n + 99) / 100) - 1).toInt)
    val r = Skew.keyProfile(keys.toDF("k2"), "k2")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    val hot = counts.filter(_._2 == xs.max).keys.min
    assert(r == ((n, keys.size.toLong, xs.max, pct(50), pct(99), hot,
      gini, n * keys.size)))
  }

  test("keyProfile: uniform keys have zero Gini") {
    val df = (1L to 8L).flatMap(k => Seq(k, k)).toDF("k2")
    val r = Skew.keyProfile(df, "k2")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    // 8 keys × 2 rows: gini_num = Σ(2i−9)·2 over i=1..8 = 2·(72−72) = 0
    assert(r == ((8L, 16L, 2L, 2L, 2L, 1L, 0L, 128L)))
  }
}
