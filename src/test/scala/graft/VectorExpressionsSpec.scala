package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.plans.GraftExtensions

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fused codegen cosine agrees with the HOF formulation") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Array.fill(16)(rnd.nextDouble() - 0.5),
      Array.fill(16)(rnd.nextDouble() - 0.5)))
    val df = rows.toDF("a", "b")
    val both = df.select(
      VectorFunctions.cosineFast(col("a"), col("b")).as("fast"),
      VectorFunctions.cosine(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    both.foreach { case (f, h) => assert(math.abs(f - h) < 1e-12) }
  }

  test("zero-norm input yields null (not NaN) in the native expression") {
    val df = Seq((Array(0.0, 0.0), Array(1.0, 2.0))).toDF("a", "b")
    val r = df.select(VectorFunctions.cosineFast(col("a"), col("b")))
      .as[Option[Double]].head()
    assert(r.isEmpty)
  }

  test("null array elements are treated as zero") {
    val df = Seq((Seq(Some(3.0), None), Seq(Some(1.0), Some(5.0))))
      .toDF("a", "b")
    val r = df.select(VectorFunctions.cosineFast(col("a"), col("b")))
      .as[Double].head()
    assert(math.abs(r - 3.0 / (3.0 * math.sqrt(26.0))) < 1e-12)
  }

  test("codegen int64 kernels agree with the interpreted HOF chains") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      Array.fill(16)(rnd.nextInt(2001).toLong - 1000),
      Array.fill(16)(rnd.nextInt(2001).toLong - 1000)))
    val df = rows.toDF("a", "b")
    val both = df.select(
      VectorFunctions.longDot(col("a"), col("b")).as("dot_fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("dot_hof"),
      VectorFunctions.longSqDist(col("a"), col("b")).as("d_fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v).as("d_hof"))
      .as[(Long, Long, Long, Long)].collect()
    both.foreach { case (df_, dh, sf, sh) =>
      assert(df_ == dh && sf == sh)
    }
  }

  test("int64 kernels null-propagate exactly like zip_with padding") {
    // length mismatch and null elements both yield SQL NULL — identical
    // to the interpreted form, so swapping kernels can't change a gate
    val mismatch = Seq((Seq(1L, 2L), Seq(3L))).toDF("a", "b")
    assert(mismatch.select(VectorFunctions.longDot(col("a"), col("b")))
      .as[Option[Long]].head().isEmpty)
    val withNull = Seq((Seq(Some(1L), None), Seq(Some(3L), Some(4L))))
      .toDF("a", "b")
    assert(withNull.select(VectorFunctions.longSqDist(col("a"), col("b")))
      .as[Option[Long]].head().isEmpty)
  }

  test("bitLen agrees with length(bin(x)) across the full int64 range") {
    val rnd = new scala.util.Random(19)
    val edge = Seq(0L, 1L, 2L, 63L, 64L, Long.MaxValue, -1L,
      Long.MinValue, -42L)
    val vals = edge ++ Seq.fill(200)(rnd.nextLong()) ++
      Seq.fill(50)(rnd.nextInt(1000000).toLong)
    val df = vals.toDF("x")
    val both = df.select(
      VectorFunctions.bitLen(col("x")).as("fast"),
      length(bin(col("x"))).cast("long").as("ref"))
      .as[(Long, Long)].collect()
    both.foreach { case (f, r) => assert(f == r, s"bitLen $f != bin $r") }
  }

  test("registered SQL function works end-to-end") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 1.0d)) AS c")
      .as[Double].head()
    assert(math.abs(r - math.sqrt(0.5)) < 1e-12)
  }
}
