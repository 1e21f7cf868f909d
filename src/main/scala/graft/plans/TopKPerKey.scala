package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom whole-operator path (SURVEY §2.2 preference (c)): per-key
  * top-k as a first-class plan node.
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy(
  * ord)) <= k`) SORTS every partition — O(n log n) per key group and a
  * full materialization of the sort buffer, even though only k rows per
  * key survive. This operator keeps a bounded k-row min-heap per key —
  * O(n log k), no sort buffer, memory O(keys × k) — the shape that wins
  * at 100 TB when k is small and groups are large (the "top 3 documents
  * per domain" / "top-k neighbors per query" pattern).
  *
  * The logical node declares only `ClusteredDistribution(keys)`, so
  * Catalyst plans ONE hash shuffle (reusing an existing partitioning
  * when the child already clusters by the key) and the heap runs
  * map-local within each partition.
  *
  * `order` must be LongType (callers fold price/tiebreak into one exact
  * long, as [[graft.ops.Relational.orderExtremes]] does); top-k is
  * taken DESCENDING with ties impossible by construction (the caller's
  * ordering value embeds a unique key).
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Expression, k: Int,
                          child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to its exec — registered
  * through `SparkSessionExtensions.injectPlannerStrategy` (see
  * [[graft.functions.GraftExtensions]]) or lazily via
  * `spark.experimental.extraStrategies` by the PlanBridge entry point.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      // two-phase, like hash aggregation: a PARTIAL top-k runs
      // map-side (no distribution requirement — no exchange below it),
      // so at most k rows per (key, input partition) cross the wire;
      // the FINAL top-k re-heaps after the clustered shuffle. Top-k is
      // mergeable, so partial∘final ≡ single-phase.
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Expression, k: Int,
                          partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    (if (partial) org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution
     else ClusteredDistribution(keys)) :: Nil

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  private final class Entry(val ord: Long, val row: UnsafeRow)

  protected override def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val ordExpr = order
    val childOutput = child.output
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordProj = UnsafeProjection.create(Seq(ordExpr), childOutput)
      val cmp = new java.util.Comparator[Entry] {
        override def compare(a: Entry, b: Entry): Int =
          java.lang.Long.compare(a.ord, b.ord)
      }
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[Entry]]()
      iter.foreach { row =>
        val ord = ordProj(row).getLong(0)
        val key = keyProj(row) // reused buffer; content-based hash/equals
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[Entry](kk + 1, cmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) {
          heap.add(new Entry(ord, row.copy().asInstanceOf[UnsafeRow]))
        } else if (heap.peek().ord < ord) {
          heap.poll()
          heap.add(new Entry(ord, row.copy().asInstanceOf[UnsafeRow]))
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { h =>
        h.asScala.toArray.sortBy(-_.ord).iterator.map(_.row: InternalRow)
      }
    }, preservesPartitioning = true)
  }
}
