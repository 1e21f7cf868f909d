package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Custom whole-operator path (SURVEY §2.2 preference (c)): per-key
  * top-k as a first-class plan node.
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy(
  * ord)) <= k`) SORTS every partition — O(n log n) per key group and a
  * full materialization of the sort buffer, even though only k rows per
  * key survive — and hash-partitions the FULL input by key, so the
  * reducer parallelism is capped at the number of keys (eight queries →
  * eight busy cores, however large the corpus). This operator keeps a
  * bounded k-row min-heap per key — O(n log k), no sort buffer, memory
  * O(keys × k) — and runs a PARTIAL pass map-side, so at most k rows
  * per (key, input partition) ever cross the wire. The shape that wins
  * at 100 TB when k is small and groups are large (the "top 3 documents
  * per domain" / "top-k neighbors per query" pattern).
  *
  * The logical node declares only `ClusteredDistribution(keys)`, so
  * Catalyst plans ONE hash shuffle (reusing an existing partitioning
  * when the child already clusters by the key) and the heap runs
  * map-local within each partition.
  *
  * `orders` is a 1- or 2-expression DESCENDING lexicographic key of
  * LongType or DoubleType components. Callers make the compound key
  * total (fold a unique tiebreak into the last component, negated for
  * ascending ties), so heap replacement order can never change the
  * result. Doubles compare like SQL: -0.0 == 0.0 and NaN largest —
  * via an order-preserving bits transform applied at projection time.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], orders: Seq[Expression],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  require(orders.nonEmpty && orders.size <= 2,
    s"1 or 2 ordering expressions supported, got ${orders.size}")
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
    case TopKPerKeyPlan(keys, orders, k, child) =>
      // two-phase, like hash aggregation: a PARTIAL top-k runs
      // map-side (no distribution requirement — no exchange below it),
      // so at most k rows per (key, input partition) cross the wire;
      // the FINAL top-k re-heaps after the clustered shuffle. Top-k is
      // mergeable, so partial∘final ≡ single-phase.
      TopKPerKeyExec(keys, orders, k, partial = false,
        TopKPerKeyExec(keys, orders, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], orders: Seq[Expression],
                          k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    (if (partial) org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution
     else ClusteredDistribution(keys)) :: Nil

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  private final class Entry(val o1: Long, val o2: Long, val row: UnsafeRow)

  /** Order-preserving long image of a double under SQL comparison
    * semantics: -0.0 normalizes to +0.0 (SQL-equal), NaN canonicalizes
    * largest (doubleToLongBits), and the sign-fold makes signed-long
    * comparison agree with Double.compare everywhere else.
    */
  private def doubleOrd(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v + 0.0)
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val ordExprs = orders
    val childOutput = child.output
    val kk = k
    val ordIsDouble = ordExprs.map(_.dataType == DoubleType).toArray
    ordExprs.foreach(e => require(e.dataType == LongType || e.dataType == DoubleType,
      s"ordering component must be LONG or DOUBLE, got ${e.dataType}"))
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordProj = UnsafeProjection.create(ordExprs, childOutput)
      def ordAt(r: InternalRow, i: Int): Long =
        if (ordIsDouble(i)) doubleOrd(r.getDouble(i)) else r.getLong(i)
      val cmp = new java.util.Comparator[Entry] {
        override def compare(a: Entry, b: Entry): Int = {
          val c1 = java.lang.Long.compare(a.o1, b.o1)
          if (c1 != 0) c1 else java.lang.Long.compare(a.o2, b.o2)
        }
      }
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[Entry]]()
      iter.foreach { row =>
        val ords = ordProj(row)
        val o1 = ordAt(ords, 0)
        val o2 = if (ordExprs.size > 1) ordAt(ords, 1) else 0L
        val key = keyProj(row) // reused buffer; content-based hash/equals
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[Entry](kk + 1, cmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) {
          heap.add(new Entry(o1, o2, row.copy().asInstanceOf[UnsafeRow]))
        } else if (cmp.compare(heap.peek(),
            new Entry(o1, o2, null)) < 0) {
          heap.poll()
          heap.add(new Entry(o1, o2, row.copy().asInstanceOf[UnsafeRow]))
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { h =>
        h.asScala.toArray.sortWith((a, b) => cmp.compare(a, b) > 0)
          .iterator.map(_.row: InternalRow)
      }
    }, preservesPartitioning = true)
  }
}
