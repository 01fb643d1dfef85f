package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def morton(x: Long, y: Long): Long =
    Seq((x, y)).toDF("x", "y")
      .select(Layout.mortonKey(col("x"), col("y")).as("z"))
      .as[Long].collect().head

  test("morton interleave matches hand-computed bit patterns") {
    // x bits land even, y bits odd: (x=3, y=0) → 0b0101; (x=0, y=3) → 0b1010
    assert(morton(3L, 0L) === 5L)
    assert(morton(0L, 3L) === 10L)
    assert(morton(3L, 3L) === 15L)
    assert(morton(2L, 1L) === 6L)    // 0b100 | 0b010
    // max 16-bit inputs fill all 32 bits
    assert(morton(0xFFFFL, 0xFFFFL) === 0xFFFFFFFFL)
    // only low 16 bits participate
    assert(morton(0x10003L, 0L) === morton(3L, 0L))
  }

  test("morton is a bijection on a small grid") {
    val zs = (for { x <- 0L until 16L; y <- 0L until 16L } yield (x, y))
      .toDF("x", "y")
      .select(Layout.mortonKey(col("x"), col("y")).as("z"))
      .as[Long].collect()
    assert(zs.distinct.length === 256)
    assert(zs.min === 0L && zs.max === 255L)
  }

  /** Driver-side reference xy→d (the classic public-domain bit
    * transform) for the order-65536 curve. */
  private def hilbertRef(x0: Int, y0: Int): Long = {
    var x = x0; var y = y0; var d = 0L; var s = 32768
    while (s > 0) {
      val rx = if ((x & s) != 0) 1 else 0
      val ry = if ((y & s) != 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 65535 - x; y = 65535 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("hilbertKey matches the reference bit transform on sampled points") {
    val pts = (for {
      x <- Seq(0, 1, 2, 3, 7, 100, 255, 32767, 32768, 65535)
      y <- Seq(0, 1, 5, 64, 4095, 65535)
    } yield (x.toLong, y.toLong)) ++
      (0 until 200).map(i => ((i * 7919) % 65536L, (i * 104729) % 65536L))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.hilbertKey(col("x"), col("y")).as("h"))
      .as[(Long, Long, Long)].collect()
    for ((x, y, h) <- got)
      assert(h == hilbertRef(x.toInt, y.toInt), s"($x, $y)")
  }

  test("hilbertKey is a bijection onto [0, 2^32) corners and is " +
      "neighbor-continuous along the curve") {
    // distinctness on a 16×16 subgrid (d values spread over the full
    // curve, so only distinctness — not compactness — holds there)
    val hs = (for { x <- 0L until 16L; y <- 0L until 16L } yield (x, y))
      .toDF("x", "y")
      .select(Layout.hilbertKey(col("x"), col("y")).as("h"))
      .as[Long].collect()
    assert(hs.distinct.length === 256)
    // curve continuity (the property Z-order lacks): d and d+1 are
    // always GRID NEIGHBORS. Verify on the reference over the first
    // 4096 curve positions by inverting via a map
    val inv = (for { x <- 0 until 64; y <- 0 until 64 }
      yield hilbertRef(x, y) -> (x, y)).toMap
    // order-65536 curve visits the 64×64 corner tile in its first 4096
    // positions exactly when the tile is curve-aligned — it is (d of
    // (0,0) is 0 and the transform recurses on quadrants)
    for (d <- 0L until 4095L if inv.contains(d) && inv.contains(d + 1)) {
      val (x1, y1) = inv(d); val (x2, y2) = inv(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) → ($x2,$y2)")
    }
  }

  test("boxQueryAudit: hand-checked block stats, and Hilbert scans no " +
      "more blocks than lexicographic on a clustered box") {
    // 32×32 full grid; box = the 8×8 corner tile; 64-row blocks.
    // Under Hilbert order the first 1024 curve positions cover a 32×32
    // tile contiguously, so the 64 matching rows of the box concentrate
    // in few blocks; under lexicographic (x-major) order every x-row
    // 0..7 strip lands in a different region.
    val grid = (for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y))
      .toDF("x", "y")
    type C = org.apache.spark.sql.Column
    def audit(name: String, keyOf: (C, C) => C) =
      Layout.boxQueryAudit(grid, name, keyOf,
        col("x") * 32 + col("y"), col("x"), col("y"),
        0L, 7L, 0L, 7L, blockRows = 64L)
        .as[(String, Long, Long, Long, Long, Long)].collect().head
    val lex = audit("lex", (kx, ky) => kx * 32 + ky)
    val hil = audit("hil", Layout.hilbertKey)
    assert(lex._2 == 1024 && lex._3 == 16 && hil._2 == 1024 &&
      hil._3 == 16)                               // n_rows, n_blocks
    assert(lex._6 == 64 && hil._6 == 64)          // rows_matched
    // lexicographic: x∈[0,7] strips spread over 8×(32-row) runs → the
    // 64 hits spread across 4 blocks (8 strips / 2 strips per block);
    // Hilbert: the 8×8 tile is 64 consecutive curve positions → 1 block
    assert(hil._4 <= lex._4, s"hilbert ${hil._4} vs lex ${lex._4}")
    assert(hil._4 == 1L)
  }

  test("zorder audit: blocks are square tiles with tight 2-D ranges") {
    // 64×64 grid, 12-bit z → blocks of 16 keys... use bitsPerBlock such
    // that each block is a 2^k × 2^k tile: shifting z by 2k merges k low
    // bits of each dimension → tile side 2^k. k=3 → 8×8 tiles, 64 blocks.
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y))
      .toDF("x", "y")
    val blocks = Layout.zorderAudit(grid, col("x"), col("y"),
        bitsPerBlock = 6)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(blocks.length === 64)
    blocks.foreach { case (_, n, xmin, xmax, ymin, ymax) =>
      assert(n === 64L)                       // 8×8 rows per tile
      assert(xmax - xmin === 7L, "x range must span exactly one tile side")
      assert(ymax - ymin === 7L, "y range must span exactly one tile side")
      assert(xmin % 8 === 0L && ymin % 8 === 0L)
    }
  }

  test("compactionPlan: cumulative fill crosses the target once per group") {
    val files = Seq(
      ("p", 1L, 10L), ("p", 2L, 10L), ("p", 3L, 10L),
      ("p", 4L, 10L), ("p", 5L, 10L),
      ("q", 1L, 100L), ("q", 2L, 1L))
      .toDF("part", "file_id", "size")
    val r = Layout.compactionPlan(files, "part", "file_id", "size",
        target = 25L)
      .as[(String, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._4).toMap
    // p: bytes-before = 0,10,20,30,40 → groups 0,0,0,1,1
    assert(r == Map(
      ("p", 1L) -> 0L, ("p", 2L) -> 0L, ("p", 3L) -> 0L,
      ("p", 4L) -> 1L, ("p", 5L) -> 1L,
      // q: the oversized first file fills groups 0..3 by itself; the
      // next file starts from its cumulative offset
      ("q", 1L) -> 0L, ("q", 2L) -> 4L))
  }

  test("encodingAdvisor: distinct/run statistics drive the suggestion") {
    // one row group; k: 8 rows of 2 values in long runs → rle is beaten
    // by dict (2·20 ≤ 8 false → 2*20=40 > 8 → not dict; runs=2, 2·4=8
    // ≤ 8 → rle). u: all distinct, alternating → plain.
    val df = Seq(
      (1L, "a", "x1"), (2L, "a", "x2"), (3L, "a", "x3"), (4L, "a", "x4"),
      (5L, "b", "x5"), (6L, "b", "x6"), (7L, "b", "x7"), (8L, "b", "x8")
    ).toDF("id", "k", "u")
    val r = Layout.encodingAdvisor(df, order = col("id"),
        rowGroup = lit(0L), cols = Seq("k", "u"))
      .as[(String, Long, Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._6))).toMap
    assert(r("k") == ((8L, 2L, 2L, "rle")))
    assert(r("u") == ((8L, 8L, 8L, "plain")))
  }

  test("rangeSplitPlan: equi-depth boundaries by the exact rank test") {
    // values 1..8, 4 splits: boundary i = smallest v with n_le·4 ≥ i·8
    // → v=2 (i=1), v=4 (i=2), v=6 (i=3)
    val df = (1L to 8L).toDF("x")
    val r = Layout.rangeSplitPlan(df, col("x"), splits = 4)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 2L, 2L -> 4L, 3L -> 6L))
    // skewed: nine 5s then a 100 — all boundaries land on 5
    val sk = ((1 to 9).map(_ => 5L) :+ 100L).toDF("x")
    val r2 = Layout.rangeSplitPlan(sk, col("x"), splits = 4)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 5L, 2L -> 5L, 3L -> 5L))
  }
}
