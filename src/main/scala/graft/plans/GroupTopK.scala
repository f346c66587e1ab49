package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator top-k-per-group as a first-class plan node
  * (SURVEY.md §2 row O6 scale path; the (c) tier of the custom-operator
  * preference order: LogicalPlan + Strategy + SparkPlan via
  * SparkSessionExtensions).
  *
  * Why a physical operator instead of the row_number window: the window
  * form must SORT every group completely (one big in-partition sort of
  * the whole dataset) before discarding all but k rows. This node keeps a
  * bounded k-row heap per group and runs in TWO phases like a hash
  * aggregate — a partial pass on the map side reduces each partition to
  * at most k rows per group BEFORE the shuffle, so the exchange carries
  * O(partitions * groups * k) rows instead of the full input, and nothing
  * is ever fully sorted. At 100 TB with, say, k=3 and a few thousand
  * groups, the shuffle shrinks from the dataset size to kilobytes.
  *
  * Determinism contract: `sortOrder` must be a total order (include a
  * unique tiebreak column) or the k-th place is arbitrary among ties —
  * same caveat as any top-k.
  *
  * Memory contract: like hash aggregation, each task holds
  * (#groups in its partition) x k rows; there is no spill path. With the
  * partial phase bounding map-side state the final phase sees only its
  * own clustered groups.
  */
case class GroupTopK(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"GroupTopK needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopK =
    copy(child = newChild)
}

/** Plans GroupTopK as partial-then-final execs; EnsureRequirements inserts
  * the hash exchange demanded by the final node's required distribution. */
object GroupTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GroupTopK =>
      GroupTopKExec(g.groupExprs, g.sortOrder, g.k, partial = false,
        GroupTopKExec(g.groupExprs, g.sortOrder, g.k, partial = true,
          planLater(g.child))) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap top-k per group over InternalRows. The same algorithm
  * serves both phases (top-k of per-partition top-k's is the global
  * top-k); `partial` only controls the required child distribution. */
case class GroupTopKExec(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val gExprs = groupExprs
    val kk = k
    // generated comparator over the sort order; "top-k" = the k smallest
    // rows under it (a DESC order is expressed inside the SortOrder)
    val ord = new LazilyGeneratedOrdering(sortOrder, childOutput)
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(gExprs, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      // reversed ordering => heap head is the WORST retained row
      val worstFirst: java.util.Comparator[InternalRow] = ord.reverse
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.offer(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          // beats the current worst: admit, evict (copy only on admit)
          heap.poll()
          heap.offer(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)
}
