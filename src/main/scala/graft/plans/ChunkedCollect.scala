package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, GenericInternalRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.ArrayType
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator Catalyst extension (the (c) escalation path: LogicalPlan
  * + SparkStrategy + SparkPlan, registered via SparkSessionExtensions or
  * `experimental.extraStrategies`): grouped collect-into-chunks — for each
  * group key, the values collected into arrays of at most `maxSize`
  * elements, one output row per chunk.
  *
  * This is the reference's chunked-stream contract (each k-hop row carries
  * ≤ ARROW_MAX_LIST_SIZE edges — Config.java:73-75, Iterators.partition at
  * GdsReadJob.java:143-153) as a first-class operator. Spark can express it
  * declaratively only as row_number-window + groupBy(key, chunk) — two
  * wide stages (exchange + sort + window, then exchange + hash aggregate
  * buffering whole groups). This operator declares
  * `ClusteredDistribution(groups)` + in-partition ordering on the groups, so
  * the planner inserts ONE exchange + sort, and the exec streams each
  * sorted partition emitting chunk rows as they fill: constant memory per
  * group (one chunk buffer), no second shuffle, no whole-group
  * materialization — the shape that survives a 100 TB group.
  *
  * `sortWithin` extends the in-partition sort past the group key, so chunks
  * are consecutive runs of the group's SORTED values — this is how the
  * chunked adjacency build keeps the reference's per-source sorted-target
  * contract (GdsWriteJob.java:529-537) while bounding every row: the sort
  * rides the single exchange's sort for free instead of a per-row
  * `sort_array` over an unbounded collected list.
  */
object ChunkedCollect {

  /** Single-group form (the khop chunk contract). */
  def apply(df: DataFrame, group: String, values: Seq[String],
            maxSize: Int): DataFrame =
    apply(df, Seq(group), values, maxSize, Nil)

  /** df grouped by `groups`, each of `values` collected into ≤ maxSize
    * chunks, values ordered by `sortWithin` inside each group. Output
    * columns: groups, then one array column per value (same names).
    * Chunks of the parallel value arrays stay aligned. */
  def apply(df: DataFrame, groups: Seq[String], values: Seq[String],
            maxSize: Int, sortWithin: Seq[String]): DataFrame = {
    require(maxSize > 0, "maxSize must be positive")
    require(groups.nonEmpty, "need at least one group column")
    val spark = df.sparkSession
    ensureStrategy(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(",")}"))
    val vAttrs = values.map(attr)
    // minted ONCE and carried as constructor state: a `val output` minting
    // AttributeReferences would re-mint new ExprIds on every optimizer
    // copy(), orphaning downstream references to the old ids
    val minted = vAttrs.map(v =>
      AttributeReference(v.name, ArrayType(v.dataType, v.nullable))())
    ColumnBridge.ofRows(spark,
      ChunkedCollectPlan(groups.map(attr), vAttrs, sortWithin.map(attr),
        maxSize, analyzed, minted))
  }

  /** Idempotently add the planner strategy to a session (the
    * GraftExtensions path covers sessions built with the extension). */
  def ensureStrategy(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[ChunkedCollectStrategy.type]))
      spark.experimental.extraStrategies = cur :+ ChunkedCollectStrategy
  }
}

case class ChunkedCollectPlan(groups: Seq[Attribute], values: Seq[Attribute],
                              sortWithin: Seq[Attribute],
                              maxSize: Int, child: LogicalPlan,
                              minted: Seq[Attribute])
    extends UnaryNode {
  override def output: Seq[Attribute] = groups ++ minted
  // the array columns are minted here, not read from the child — without
  // this the node reports them as missingInput (an invalid plan) and the
  // optimizer mis-rewrites anything downstream of it
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(minted)
  override protected def withNewChildInternal(c: LogicalPlan)
      : ChunkedCollectPlan = copy(child = c)
}

object ChunkedCollectStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: ChunkedCollectPlan =>
      ChunkedCollectExec(p.groups, p.values, p.sortWithin, p.maxSize,
        p.output, planLater(p.child)) :: Nil
    case _ => Nil
  }
}

case class ChunkedCollectExec(groups: Seq[Attribute], values: Seq[Attribute],
                              sortWithin: Seq[Attribute], maxSize: Int,
                              output: Seq[Attribute],
                              child: SparkPlan) extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output.drop(groups.length))

  // one hash exchange on the groups + in-partition sort by (groups,
  // sortWithin); the planner provides both (EnsureRequirements), the exec
  // streams the rest
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groups) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq((groups ++ sortWithin).map(a => SortOrder(a, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val gIdxs = groups.map(g => childOutput.indexWhere(_.exprId == g.exprId))
    val vIdxs = values.map(v => childOutput.indexWhere(_.exprId == v.exprId))
    val gTypes = groups.map(_.dataType)
    val vTypes = values.map(_.dataType)
    val nG = groups.length
    val cap = maxSize
    child.execute().mapPartitions { iter =>
      new Iterator[InternalRow] {
        private val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
        private val buffers = vTypes.map(_ => new ArrayBuffer[Any](cap)).toArray
        private var curKey: Array[Any] = null
        private var pending: InternalRow = null

        // sort-based values (UTF8String, array views) are reused buffers —
        // copy anything non-primitive on the way in
        private def own(v: Any): Any = v match {
          case s: UTF8String => s.copy()
          case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
          case other => other
        }

        private def readKey(row: InternalRow): Array[Any] = {
          val k = new Array[Any](nG)
          var i = 0
          while (i < nG) { k(i) = own(row.get(gIdxs(i), gTypes(i))); i += 1 }
          k
        }

        private def sameKey(k: Array[Any]): Boolean = {
          var i = 0
          while (i < nG) {
            if (!java.util.Objects.equals(curKey(i), k(i))) return false
            i += 1
          }
          true
        }

        private def emit(): InternalRow = {
          val fields = new Array[Any](nG + buffers.length)
          var i = 0
          while (i < nG) { fields(i) = curKey(i); i += 1 }
          i = 0
          while (i < buffers.length) {
            fields(nG + i) = new GenericArrayData(buffers(i).toArray)
            buffers(i).clear()
            i += 1
          }
          proj(new GenericInternalRow(fields))
        }

        private def append(row: InternalRow): Unit = {
          var i = 0
          while (i < buffers.length) {
            buffers(i) += own(row.get(vIdxs(i), vTypes(i)))
            i += 1
          }
        }

        private def step(): Unit = {
          if (pending != null) return
          // a buffer left full by the previous call (possible when a group
          // switch and a full chunk coincide, e.g. maxSize = 1)
          if (curKey != null && buffers(0).length >= cap) { pending = emit(); return }
          while (iter.hasNext) {
            val row = iter.next()
            val key = readKey(row)
            if (curKey == null) {
              curKey = key
            } else if (!sameKey(key)) {
              val remainder =
                if (buffers(0).nonEmpty) emit() else null   // clears buffers
              curKey = key
              if (remainder != null) {
                append(row)
                pending = remainder
                return
              }
            }
            append(row)
            if (buffers(0).length >= cap) { pending = emit(); return }
          }
          if (curKey != null && buffers(0).nonEmpty) pending = emit()
        }

        override def hasNext: Boolean = { step(); pending != null }
        override def next(): InternalRow = {
          step()
          val r = pending
          pending = null
          r
        }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan)
      : ChunkedCollectExec = copy(child = c)
}
