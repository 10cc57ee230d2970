package org.apache.spark.sql.graftnative

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Grouped top-k as a first-class operator: `LogicalPlan` node →
  * `SparkStrategy` → `SparkPlan` (SURVEY §7.3 option (c); guide §"Custom
  * operator").
  *
  * Spark's idiomatic phrasing — `row_number().over(partitionBy(key)
  * .orderBy(...)) <= k` — fully SORTS every key group before discarding all
  * but k rows: at 100 TB that's a giant sort per partition just to keep the
  * top handful. This operator keeps a bounded k-row heap per key in one
  * pass: the planner inserts a hash exchange on the key (declared via
  * `requiredChildDistribution`), each partition streams once, memory is
  * O(keys_in_partition × k), and nothing is sorted globally.
  */
case class TopKPerKeyNode(
    k: Int,
    keys: Seq[Expression],
    order: SortOrder,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: SortOrder,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Ask the planner to co-locate rows by key — it inserts the (single)
    * hash exchange, reusing an existing compatible partitioning if present. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderExpr = order.child
    val descending = order.direction == Descending
    val childOutput = child.output
    val orderDataType = orderExpr.dataType

    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordProj = UnsafeProjection.create(Seq(orderExpr), childOutput)
      val baseOrdering = PhysicalDataType.ordering(orderDataType)
        .asInstanceOf[Ordering[Any]]
      // "ranked before" = compares smaller; nulls always rank last.
      val ranked = new Ordering[Any] {
        private val dirOrd = if (descending) baseOrdering.reverse else baseOrdering
        override def compare(a: Any, b: Any): Int = (a, b) match {
          case (null, null) => 0
          case (null, _) => 1
          case (_, null) => -1
          case _ => dirOrd.compare(a, b)
        }
      }
      // PriorityQueue dequeues its maximum = the worst kept row.
      val heapOrd = Ordering.by[(Any, InternalRow), Any](_._1)(ranked)

      val heaps = mutable.LinkedHashMap
        .empty[UnsafeRow, mutable.PriorityQueue[(Any, InternalRow)]]
      while (iter.hasNext) {
        val row = iter.next()
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          mutable.PriorityQueue.empty[(Any, InternalRow)](heapOrd))
        val ordRow = ordProj(row)
        // get() on struct/string types returns a VIEW into the reused
        // projection buffer — copy before retaining in the heap.
        val ordVal = if (ordRow.isNullAt(0)) null
          else InternalRow.copyValue(ordRow.get(0, orderDataType))
        if (heap.size < kLocal) {
          heap.enqueue((ordVal, row.copy()))
        } else if (ranked.compare(ordVal, heap.head._1) < 0) {
          heap.dequeue()
          heap.enqueue((ordVal, row.copy()))
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._2))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to its physical operator. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Public entry points (Dataset.ofRows and the Column bridge are
  * private[sql], hence this package). */
object GraftOps {

  private def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GraftStrategies)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategies
    }

  /** Enable the [[TopKRewrite]] optimizer rule on an existing session (the
    * `GraftSparkExtensions` hook injects it automatically): `row_number()
    * ≤ k` window filters plan as heap-based [[TopKPerKeyExec]] instead of
    * sort-the-world windows. */
  def enableTopKRewrite(spark: SparkSession): Unit = {
    ensureStrategy(spark)
    if (!spark.experimental.extraOptimizations.contains(TopKRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewrite
    }
  }

  /** Enable [[GraftScanSkipping]] on an existing session (the
    * `GraftSparkExtensions` hook injects it automatically;
    * `GraftTable.view` calls this so registered views skip even on plain
    * sessions). Idempotent, like the rule itself. */
  def enableScanSkipping(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(GraftScanSkipping)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GraftScanSkipping
    }
    // Registered views also unlock metadata-only COUNT answers — same
    // registry, same lifecycle, so the two rules travel together.
    if (!spark.experimental.extraOptimizations.contains(GraftMetadataOnlyAggregate)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GraftMetadataOnlyAggregate
    }
  }

  /** Top `k` rows per key group, ranked by `orderBy` (descending by
    * default; ties unresolved — pass a unique tiebreak, e.g.
    * `struct(score, id)`).
    *
    * The order expression is projected through the ordinary Dataset API
    * first (Spark 4's Column wrappers only resolve on built-in nodes), so
    * the custom node receives fully-resolved attributes. */
  def topKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderBy: Column,
      k: Int,
      descending: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val ordName = "__graft_topk_ord"
    val analyzed = df.withColumn(ordName, orderBy).queryExecution.analyzed
    def attr(n: String) = analyzed.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${analyzed.output.map(_.name)}"))
    val node = TopKPerKeyNode(
      k,
      keyCols.map(attr),
      SortOrder(attr(ordName), if (descending) Descending else Ascending),
      analyzed)
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], node).drop(ordName)
  }
}
