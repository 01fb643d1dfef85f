package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` embedding columns, composed from
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDF, so
  * Catalyst keeps the whole similarity pipeline in whole-stage codegen.
  * Accumulation is sequential left-to-right, matching DuckDB's list
  * kernels, which keeps oracle comparisons stable to the last ulp before
  * rounding. */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v * v)

  /** Cosine similarity dot/(|a|·|b|); 0-vectors yield null (division by
    * zero is NaN-free: we guard explicitly). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm2(a)
    val nb = norm2(b)
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(d / sqrt(na * nb))
  }

  /** Cast a float embedding column to double for exact-accumulation math. */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Engine-exact 6-decimal rounding: ⌊x·10⁶ + ½⌋ / 10⁶. SQL `round()` on
    * a double is the one scalar whose tie convention and algorithm
    * (decimal re-expansion vs multiply-and-round) vary across engines and
    * versions; this form is IEEE-pinned ops only (correctly rounded
    * multiply, add, floor, divide), so two engines given the same input
    * double always produce the same output double. Every gated query
    * pairs this with the literal `floor(x * 1000000 + 0.5) / 1000000`
    * in its oracle SQL. */
  def round6(x: Column): Column = floor(x * 1e6 + 0.5) / 1e6

  def norm(a: Column): Column = sqrt(norm2(a))

  /** Fused single-pass codegen cosine (graft.plans.CosineSimilarity): the
    * preferred form for pairwise hot paths — dot and both norms in one
    * whole-stage-codegen loop. Semantics identical to [[cosine]] /
    * [[cosineWithNorms]] (null for zero-norm inputs). */
  def cosineFast(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.CosineSimilarity(
        org.apache.spark.sql.graft.ColumnBridge.expression(a.cast("array<double>")),
        org.apache.spark.sql.graft.ColumnBridge.expression(b.cast("array<double>"))))

  /** Codegen int64 dot product over `array<bigint>` (null-strict, matching
    * the interpreted zip_with/aggregate chain) — the hyperplane sign-bit
    * kernel. */
  def longDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.LongDotProduct(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Codegen int64 bit length — `length(bin(x))` without the per-row
    * string materialization (exact ⌊log₂⌋+1, the surprisal kernel). */
  def bitLen(a: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.BitLength(
        org.apache.spark.sql.graft.ColumnBridge.expression(a)))

  /** Codegen int64 squared L2 distance over `array<bigint>` — the
    * quantized k-means kernel. */
  def longSqDist(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.LongSqDistance(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Cosine given pre-materialized norms. Use this in pairwise joins:
    * materialize `norm(v)` as its own column on each side BELOW the join so
    * every pair costs a single array pass (the dot) plus scalar math —
    * `cosine()` re-walks both arrays for the norms on every pair, and
    * higher-order functions are interpreted, so that tripled per-pair cost
    * (measured ~3× on the near-dup join). */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(dot(a, b) / (na * nb))
}
