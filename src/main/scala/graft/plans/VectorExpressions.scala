package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the similarity hot path (SURVEY.md §7.3:
  * "custom Expression beats a Scala UDF beats anything else").
  *
  * The composed `zip_with`/`aggregate` formulation is semantically identical
  * but interpreted (higher-order functions have no doGenCode) and needs one
  * array pass per factor (dot, |a|², |b|²). This expression fuses all three
  * into a single codegen'd loop inside whole-stage codegen — the inner-loop
  * shape a columnar engine would emit. Null elements are treated as 0;
  * zero-norm inputs yield SQL NULL (never NaN). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else x.getDouble(i)
      val yv = if (y.isNullAt(i)) 0.0 else y.getDouble(i)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: the same expression can be instantiated several times
      // in one generated function (e.g. inside max(struct(...)) aggregate
      // buffers), where fixed local names collide
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.isNullAt($i) ? 0.0 : $a.getDouble($i);
         |  double $y = $b.isNullAt($i) ? 0.0 : $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot /
         |    (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Shared base for the int64 pairwise kernels (hyperplane-LSH sign bits,
  * quantized k-means distances). Null semantics deliberately MATCH the
  * interpreted `aggregate(zip_with(...))` chains these replace — so
  * swapping one in can never change a gate result: a length mismatch or
  * any null element yields SQL NULL (zip_with pads the shorter side with
  * nulls and the sum null-propagates). */
sealed abstract class LongPairwiseExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  /** Java source for one element pair's contribution to `acc`. */
  protected def combineJava(acc: String, x: String, y: String): String
  protected def combine(acc: Long, x: Long, y: Long): Long

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var acc = 0L
      var i = 0
      val n = x.numElements()
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc = combine(acc, x.getLong(i), y.getLong(i))
        i += 1
      }
      java.lang.Long.valueOf(acc)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $x = $a.getLong($i);
         |    long $y = $b.getLong($i);
         |    ${combineJava(acc, x, y)}
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ over array<bigint> — the hyperplane sign-bit kernel. */
case class LongDotProduct(left: Expression, right: Expression)
    extends LongPairwiseExpression {
  override def prettyName: String = "long_dot_product"
  override protected def combine(acc: Long, x: Long, y: Long): Long =
    acc + x * y
  override protected def combineJava(acc: String, x: String, y: String) =
    s"$acc += $x * $y;"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Bit length of an int64 — semantically identical to
  * `length(bin(x))` (positive: 64 − nlz(x); zero: 1; negative: 64,
  * two's-complement digits) but ONE intrinsic instead of materializing
  * a binary string per row. This is the doc-surprisal hot-path kernel:
  * exact integer ⌊log₂⌋+1 with no allocation inside whole-stage
  * codegen. */
case class BitLength(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got " +
        child.dataType.simpleString)

  override def dataType: DataType = LongType
  override def prettyName: String = "bit_len"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Long]
    val r: Long =
      if (x == 0L) 1L
      else if (x < 0L) 64L
      else 64L - java.lang.Long.numberOfLeadingZeros(x)
    java.lang.Long.valueOf(r)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"($x == 0L ? 1L : ($x < 0L ? 64L : " +
        s"64L - (long) java.lang.Long.numberOfLeadingZeros($x)))")

  override protected def withNewChildInternal(
      newChild: Expression): BitLength = copy(child = newChild)
}

/** Σ (aᵢ−bᵢ)² over array<bigint> — the quantized k-means distance. */
case class LongSqDistance(left: Expression, right: Expression)
    extends LongPairwiseExpression {
  override def prettyName: String = "long_sq_distance"
  override protected def combine(acc: Long, x: Long, y: Long): Long = {
    val d = x - y
    acc + d * d
  }
  override protected def combineJava(acc: String, x: String, y: String) =
    s"$acc += ($x - $y) * ($x - $y);"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongSqDistance =
    copy(left = newLeft, right = newRight)
}
