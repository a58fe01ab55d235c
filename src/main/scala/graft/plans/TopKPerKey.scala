package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Top-k rows PER KEY as a first-class operator — the §7.3 tier-(c)
  * showcase: custom `LogicalPlan` + `Strategy` + `SparkPlan`, registered
  * through `SparkSessionExtensions`.
  *
  * Spark's idiom for "top k per key" is
  * `row_number() OVER (PARTITION BY key ORDER BY ord) <= k`, which
  * fully SORTS every group (WindowExec sorts each partition by
  * (key, ord)) and shuffles EVERY input row to its key's reducer. At
  * 100 TB that is a full-data shuffle followed by a full sort, to keep
  * k rows per key.
  *
  * This operator's physical plan is the aggregation shape instead:
  * a PARTIAL phase keeps a bounded size-k heap per key per input
  * partition (no distribution requirement, no sort), so at most
  * partitions x k rows per key ever reach the shuffle; the FINAL phase
  * (clustered on the keys) merges the per-partition survivors with the
  * same bounded heap. Work is O(n log k), memory O(keys·k) per task,
  * shuffle volume collapses from n to ~partitions·k·|keys|.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Planner strategy: one partial + one final exec; EnsureRequirements
  * inserts the key-clustered exchange between them (same pattern as
  * partial/final HashAggregate). */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true,
        planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // max-heap under `ord`: head is the WORST survivor, evicted first
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        // probe with the REUSED projection row; copy the key only when
        // it is actually inserted — getOrElseUpdate(copy, ...) would
        // allocate a fresh key per input row on this hot path
        val probe = keyProj(row)
        val heap = heaps.get(probe) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(probe.copy(), h)
            h
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.lt(row, heap.head)) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      // emit each key's survivors best-first (deterministic final output)
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override def simpleString(maxFields: Int): String =
    s"TopKPerKeyExec(k=$k, ${if (partial) "partial" else "final"}, " +
      s"keys=${keys.mkString(",")}, order=${order.mkString(",")})"

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Public API. */
object TopK {
  /** Exact top-`k` rows per distinct `keys` value, ranked by `order`
    * (use `.desc`/`.asc` columns; bare columns mean ascending). Include
    * a unique tiebreaker column in `order` for deterministic output. */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    // Spark 4 Columns are lazily-resolved column nodes; route them through
    // a throwaway Sort / Project analysis to obtain RESOLVED catalyst
    // expressions bound to df's analyzed plan (stable attribute ids)
    val sortPlan = Bridge.analyzed(df.sort(order: _*))
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Sort]
    val keyExprs = Bridge.analyzed(df.select(keys: _*)) match {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.map {
          case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
          case e => e
        }
      case other => throw new IllegalArgumentException(
        s"key columns did not analyze to a projection: $other")
    }
    Bridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(keyExprs, sortPlan.order, k, sortPlan.child))
  }
}
