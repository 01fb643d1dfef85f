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
}
