package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "a a a b c"),
    (2L, "a b d"),
    (3L, "c c e")).toDF("doc_id", "text")

  private def estimates(width: Int): Map[String, Long] = {
    val sketch = Sketches.countMinBuild(docs, "text", width)
    val probes = Seq("a", "b", "c", "d", "e", "zz").toDF("word")
    Sketches.countMinEstimate(sketch, probes, width)
      .as[(String, Long)].collect().toMap
  }

  test("count-min never underestimates; wide grid is exact") {
    val truth = Map("a" -> 4L, "b" -> 2L, "c" -> 3L, "d" -> 1L, "e" -> 1L,
      "zz" -> 0L)
    val est = estimates(width = 4096)
    truth.foreach { case (w, t) => assert(est(w) >= t, s"$w under: $est") }
    // 6 distinct terms in 3×4096 cells: collisions are impossible at
    // this width only if the 3 row hashes separate them — check exact
    assert(est == truth)
  }

  test("narrow grid overestimates but keeps the min-over-rows bound") {
    val truth = Map("a" -> 4L, "b" -> 2L, "c" -> 3L, "d" -> 1L, "e" -> 1L)
    val est = estimates(width = 2)
    // every estimate is an upper bound and no estimate exceeds the
    // total token count (11)
    truth.foreach { case (w, t) => assert(est(w) >= t) }
    assert(est.values.forall(_ <= 11L))
  }

  test("bloom filter has no false negatives and bounded words") {
    val keys = (0L until 200L).map(k => k * 17L).toDF("k")
    val m = 4096L
    val bloom = Sketches.bloomBuild(keys, "k", m)
    // ≤ ⌈m/63⌉ words, every word inside [0, ⌈m/63⌉), no sign-bit words
    val words = bloom.as[(Long, Long)].collect()
    assert(words.length <= (m / 63L + 1).toInt)
    assert(words.forall { case (w, bits) => w >= 0 && w <= m / 63L &&
      bits > 0L })
    // every built key must probe positive
    val probes = ((0L until 200L).map(_ * 17L) ++
      (0L until 200L).map(_ * 17L + 5L)).toDF("k")
    val r = Sketches.bloomMightContain(bloom, probes, "k", m)
      .as[(Long, Boolean)].collect().toMap
    (0L until 200L).map(_ * 17L).foreach(k => assert(r(k), s"false neg $k"))
    // at 3 hashes / 200 keys / 4096 bits most absent keys screen out
    val absentHits = (0L until 200L).map(_ * 17L + 5L).count(r(_))
    assert(absentHits < 60, s"too many false positives: $absentHits")
  }

  test("hll estimates within 15% at m=256 and registers stay bounded") {
    val keys = (1L to 5000L).map(_ * 7919L).toDF("k")
    val regs = Sketches.hllBuild(keys, "k", m = 256)
    assert(regs.count() <= 256L)
    val Array((_, _, est)) = Sketches.hllEstimate(regs, m = 256)
      .as[(Long, Long, Long)].collect()
    val rel = math.abs(est / 1000.0 - 5000.0) / 5000.0
    // standard error ≈ 1.04/√256 = 6.5%; 15% is > 2σ
    assert(rel < 0.15, s"estimate ${est / 1000.0} off by $rel")
  }

  test("hll grouped estimates track per-group distinct counts") {
    // group A: 400 distinct keys; group B: 40 distinct keys (10× apart)
    val df = ((1L to 400L).map(k => ("A", k * 13L)) ++
      (1L to 40L).map(k => ("B", k * 13L)) ++
      (1L to 40L).map(k => ("B", k * 13L))).toDF("g", "k")  // dupes collapse
    val est = Sketches.hllEstimateGrouped(
        Sketches.hllBuildGrouped(df, Seq("g"), "k", m = 64), Seq("g"), m = 64)
      .select("g", "est_x1000").as[(String, Long)].collect().toMap
    assert(math.abs(est("A") / 1000.0 - 400.0) / 400.0 < 0.3)
    assert(est("A") > 4 * est("B"), s"groups must separate: $est")
  }

  test("hll registers merge as a monoid: max-union == whole-corpus build") {
    val a = (1L to 2000L).toDF("k")
    val b = (1500L to 3500L).toDF("k")  // overlapping halves
    val merged = Sketches.hllBuild(a, "k", 256)
      .unionByName(Sketches.hllBuild(b, "k", 256))
      .groupBy("bucket").agg(max("register").as("register"))
    val whole = Sketches.hllBuild((1L to 3500L).toDF("k"), "k", 256)
    assert(merged.as[(Long, Long)].collect().toMap ===
      whole.as[(Long, Long)].collect().toMap)
  }

  test("histogram quantiles: rank test picks the first covering bin") {
    val vals = (1L to 100L).toDF("v")
    val out = Sketches.histogramQuantiles(vals, col("v"), binWidth = 10L,
        qPcts = Seq(50L, 90L, 99L))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // bins: 0 holds 1..9 (9 rows), k holds 10k..10k+9; cum(4)=49, cum(5)=59
    assert(out(50L) === ((5L, 50L)))   // true median 50.5, error < binWidth
    assert(out(90L) === ((9L, 90L)))
    assert(out(99L) === ((9L, 90L)))   // value 99 lives in bin 9
  }

  test("grouped histogram quantiles: independent ranks per group") {
    val vals = ((1L to 100L).map(("A", _)) ++ (1L to 10L).map(("B", _)))
      .toDF("g", "v")
    val out = Sketches.histogramQuantilesGrouped(vals, "g", col("v"),
        binWidth = 10L, qPcts = Seq(50L, 99L))
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("A", 50L)) === ((5L, 50L)))
    assert(out(("A", 99L)) === ((9L, 90L)))
    assert(out(("B", 50L)) === ((0L, 0L)))   // 9 of B's 10 rows in bin 0
    assert(out(("B", 99L)) === ((1L, 10L)))
  }

  test("grid size is bounded by d·w regardless of corpus size") {
    val sketch = Sketches.countMinBuild(docs, "text", width = 2)
    assert(sketch.count() <= 3L * 2L)
    val rows = sketch.select("row").distinct().as[Long].collect().toSet
    assert(rows.subsetOf(Set(0L, 1L, 2L)))
  }

  test("countMinJoinSize: exact when width avoids collisions") {
    // fA = {1:2, 2:1}, fB = {1:1, 2:2, 3:1} → Σ fA·fB = 2·1 + 1·2 = 4
    val a = Seq(1L, 1L, 2L).toDF("k")
    val b = Seq(1L, 2L, 2L, 3L).toDF("k")
    val est = Sketches.countMinJoinSize(a, "k", b, "k", width = 64)
      .as[Long].collect().head
    assert(est === 4L)
  }

  test("countMinJoinSize: collisions only overestimate") {
    // width 1 → every key in one cell: est = |A|·|B| = 12 ≥ exact 4
    val a = Seq(1L, 1L, 2L).toDF("k")
    val b = Seq(1L, 2L, 2L, 3L).toDF("k")
    val est = Sketches.countMinJoinSize(a, "k", b, "k", width = 1)
      .as[Long].collect().head
    assert(est === 12L)
  }

  test("quantileBins: quartile cuts partition 1..100 at exact ranks") {
    val df = (1L to 100L).toDF("v")
    val r = Sketches.quantileBins(df, col("v"), binWidth = 1L,
        qPcts = Seq(25L, 50L, 75L))
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // cut bins are 25/50/75 (smallest bin reaching each rank); a value
    // in the cut's own bin counts as past it
    assert(r == Map(
      0L -> ((24L, 1L, 24L)), 1L -> ((25L, 25L, 49L)),
      2L -> ((25L, 50L, 74L)), 3L -> ((26L, 75L, 100L))))
  }

  test("bloom-pruned join is lossless against the brute join") {
    // 200 fact keys, 17 build keys (some absent from facts); the pruned
    // path (screen → exact join) must return exactly the brute join
    val facts = (0L until 200L).map(i => (i, i * 37L % 101L))
      .toDF("fact_id", "k")
    val dim = (0L until 17L).map(i => i * 13L % 120L).toDF("k").distinct()
    val built = Sketches.bloomBuild(dim, "k", mBits = 512L)
    val keep = Sketches.bloomMightContain(built, facts.select("k"), "k",
        mBits = 512L)
      .where(col("might_contain")).select("k")
    val pruned = facts.join(keep, Seq("k")).join(dim, Seq("k"))
      .select("fact_id").as[Long].collect().sorted.toList
    val brute = facts.join(dim, Seq("k"))
      .select("fact_id").as[Long].collect().sorted.toList
    assert(pruned == brute && brute.nonEmpty)
  }

  test("histQuantileError: exact minus bin floor, bounded by bin width") {
    // values 1..100, bins of 10: p50 exact = 50, hist bin = 5 → lo 50,
    // err 0; p99 exact = 99, bin 9 → lo 90, err 9
    val df = (1L to 100L).toDF("x")
    val r = Sketches.histQuantileError(df, col("x"), binWidth = 10L,
        qPcts = Seq(50L, 99L))
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r == Map(50L -> ((50L, 50L, 0L)), 99L -> ((99L, 90L, 9L))))
    r.values.foreach { case (_, _, err) =>
      assert(err >= 0L && err < 10L)
    }
  }

  test("kmv: sub-k sketch is exact; full sketch estimates within tolerance") {
    val small = (1L to 20L).toDF("k")
    val (nVals, _, est) = Sketches.kmvEstimate(
      Sketches.kmvBuild(small, "k", k = 64), k = 64)
      .as[(Long, Long, Long)].head()
    assert(nVals === 20L && est === 20L)  // < k distinct → count is exact

    val big = (1L to 10000L).toDF("k")
    val (nB, _, estB) = Sketches.kmvEstimate(
      Sketches.kmvBuild(big, "k", k = 64), k = 64)
      .as[(Long, Long, Long)].head()
    assert(nB === 64L)
    // RSE ≈ 1/√(k−2) ≈ 12.7%; 4σ bound keeps the test deterministic-safe
    assert(math.abs(estB - 10000L) < 5000L, s"est $estB vs 10000")
  }

  test("kmv set ops: overlap estimated, exact when both sides sub-k") {
    // sub-k sides: every estimate must be EXACT (theta = full space)
    val a = (1L to 30L).toDF("k")
    val b = (21L to 50L).toDF("k")
    val r = Sketches.kmvSetOps(
      Sketches.kmvBuild(a, "k", 64), Sketches.kmvBuild(b, "k", 64), 64)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r === ((1000000007L, 30L, 30L, 10L, 50L)))

    // full sketches: planted 50% overlap, 4σ tolerance on each estimate
    val ba = (1L to 1000L).toDF("k")
    val bb = (501L to 1500L).toDF("k")
    val (_, ea, eb, ei, eu) = Sketches.kmvSetOps(
      Sketches.kmvBuild(ba, "k", 64), Sketches.kmvBuild(bb, "k", 64), 64)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(math.abs(ea - 1000L) < 500L, s"a $ea")
    assert(math.abs(eb - 1000L) < 500L, s"b $eb")
    assert(math.abs(eu - 1500L) < 750L, s"union $eu")
    // intersection keeps at most min(|A'∩B'|) ≤ k witnesses — wider band
    assert(ei > 0L && math.abs(ei - 500L) < 450L, s"intersect $ei")
  }

  test("kmv k-set matches the driver-side hash chain on random keys") {
    val p = 1000000007L
    def chain(key: Long): Long = {
      val x = key % p
      val y = (x * x + x * 31 + 7) % p
      val z = (y * y + y * 37 + 11) % p
      (z * z + z * 41 + 13) % p
    }
    val rnd = new scala.util.Random(57)
    val keys = Seq.fill(5000)(rnd.nextLong(1000000L))
    val expected = keys.map(chain).distinct.sorted.take(64)
    val got = Sketches.kmvBuild(keys.toDF("k"), "k", k = 64)
      .as[Long].collect().toSeq
    assert(got === expected)
  }

  test("kmv is mergeable and prefilter-stable") {
    val a = (1L to 400L).toDF("k")
    val b = (301L to 700L).toDF("k")
    val whole = Sketches.kmvBuild(a.unionByName(b), "k", 64)
      .as[Long].collect().toSeq
    // merge = union rows, re-distinct, re-cut to k
    val merged = Sketches.kmvBuild(a, "k", 64)
      .unionByName(Sketches.kmvBuild(b, "k", 64))
      .distinct().orderBy(col("h")).limit(64).as[Long].collect().toSeq
    assert(whole === merged)
    // prefilter at the previous theta reproduces the identical k-set
    val theta = whole.max
    val pre = Sketches.kmvBuild(a.unionByName(b), "k", 64,
      prefilter = Some(theta + 1)).as[Long].collect().toSeq
    assert(pre === whole)
  }

  test("negative int64 keys hash sign-safely (pmod) in bloom, hll and " +
      "key-CMS — r7 sign audit") {
    val keys = Seq(-5L, -1000000008L, -1L, 3L, 7L).toDF("k")
    // bloom: every inserted key must still probe positive (no false
    // negatives), and all bit positions are in range (no negative
    // shifts, which the old sign-carrying % produced)
    val bloom = Sketches.bloomBuild(keys, "k", mBits = 1024L)
    val probed = Sketches.bloomMightContain(bloom, keys, "k", 1024L)
      .where(col("might_contain")).count()
    assert(probed == 5L)
    // hll: buckets in [0, m), registers ≥ 1
    val regs = Sketches.hllBuild(keys, "k", m = 16)
      .select(col("bucket"), col("register")).collect()
    assert(regs.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 16 &&
      r.getLong(1) >= 1))
    // key-CMS join size: runs without sign errors and keeps the CM
    // never-underestimate bound (5 self-pairs; cell collisions at this
    // tiny width only ADD)
    val est = Sketches.countMinJoinSize(keys, "k", keys, "k", width = 64)
      .as[Long].head()
    assert(est >= 5L)
    // cross-engine contract: pmod(k, p) equals the oracle's
    // (k % p + p) % p replay for the most negative key
    val p = 1000000007L
    assert(((-1000000008L % p) + p) % p == (p - 1L))
  }
}
