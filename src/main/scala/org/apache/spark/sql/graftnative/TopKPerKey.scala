package org.apache.spark.sql.graftnative

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Descending, Expression, NullsFirst, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
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
  *
  * Two generalizations over the first-cut operator (optimization round 12):
  *
  *  - The order is a full `Seq[SortOrder]` — mixed directions and explicit
  *    null ordering included — compared lexicographically per field, so
  *    the `(cosine DESC, id ASC)` ranking every ANN/kNN query here uses
  *    now plans through the heap instead of falling back to the
  *    sort-the-world window (the old single-`SortOrder` encoding could
  *    only express uniform-direction nulls-last orders as a struct).
  *  - Top-k is decomposable (top-k of a union = top-k of per-part top-ks),
  *    so the strategy plans a PARTIAL heap pass before the exchange and a
  *    final pass after it — the map-side-combine shape of hash
  *    aggregation. The exchange then carries at most keys×k rows per map
  *    partition instead of every input row: for the all-pairs ranking
  *    queries that is the difference between shuffling the pair table and
  *    shuffling the answer. The partial pass caps its key-tracking map at
  *    `spark.graft.topk.partialMaxKeys` (per-partition) and passes rows of
  *    untracked keys straight through once full — emitting a SUPERSET per
  *    key is always correct, so the cap bounds memory without a spill
  *    path.
  */
case class TopKPerKeyNode(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    partial: Boolean,
    partialMaxKeys: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** The final pass asks the planner to co-locate rows by key — it inserts
    * the (single) hash exchange, reusing an existing compatible
    * partitioning if present. The partial pass runs wherever the rows
    * already are. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  /** Heaping never moves rows, so the child's partitioning survives —
    * declaring it lets EnsureRequirements skip the exchange entirely when
    * the input is already clustered on the keys (and the partial pass
    * below then steps aside at runtime instead of heaping twice). */
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    // Already co-located by key → the final pass alone produces the exact
    // answer; a partial pass would only re-materialize every key's heap
    // for zero shuffle savings.
    if (partial &&
        child.outputPartitioning.satisfies(ClusteredDistribution(keys)))
      return child.execute()
    val kLocal = k
    val keyExprs = keys
    val orderExprs = order.map(_.child)
    val orderTypes = orderExprs.map(_.dataType).toArray
    val childOutput = child.output
    val maxKeys = if (partial) partialMaxKeys else Int.MaxValue
    // Per-field comparator facts, extracted driver-side (SortOrder itself
    // is not serialization-friendly inside closures).
    val descendingF = order.map(_.direction == Descending).toArray
    val nullsFirstF = order.map(_.nullOrdering == NullsFirst).toArray
    val nFields = orderTypes.length

    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordProj = UnsafeProjection.create(orderExprs, childOutput)
      val fieldOrd: Array[Ordering[Any]] = Array.tabulate(nFields) { i =>
        val base = PhysicalDataType.ordering(orderTypes(i))
          .asInstanceOf[Ordering[Any]]
        if (descendingF(i)) base.reverse else base
      }
      // "ranked before" = compares smaller = a better row; null ranking
      // follows each SortOrder's null ordering exactly as the window sort
      // would (ASC defaults nulls-first, DESC nulls-last).
      val ranked = new Ordering[Array[Any]] {
        override def compare(a: Array[Any], b: Array[Any]): Int = {
          var i = 0
          while (i < nFields) {
            val x = a(i); val y = b(i)
            val c =
              if (x == null && y == null) 0
              else if (x == null) { if (nullsFirstF(i)) -1 else 1 }
              else if (y == null) { if (nullsFirstF(i)) 1 else -1 }
              else fieldOrd(i).compare(x, y)
            if (c != 0) return c
            i += 1
          }
          0
        }
      }
      // PriorityQueue dequeues its maximum = the worst kept row.
      val heapOrd = Ordering.by[(Array[Any], InternalRow), Array[Any]](_._1)(ranked)

      val heaps = mutable.LinkedHashMap
        .empty[UnsafeRow, mutable.PriorityQueue[(Array[Any], InternalRow)]]
      // Rows whose key the partial pass no longer tracks (map at cap) are
      // forwarded as-is — a per-key superset is always a correct partial.
      var overflow: mutable.ArrayBuffer[InternalRow] = null
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.getOrElse(key, null)
        if (heap == null) {
          if (heaps.size >= maxKeys) {
            if (overflow == null) overflow = mutable.ArrayBuffer.empty
            overflow += row.copy()
            heap = null
          } else {
            heap = mutable.PriorityQueue.empty[(Array[Any], InternalRow)](heapOrd)
            heaps.put(key.copy(), heap)
          }
        }
        if (heap != null) {
          val ordRow = ordProj(row)
          // get() on struct/string types returns a VIEW into the reused
          // projection buffer — copy before retaining in the heap.
          val ordVal = Array.tabulate[Any](nFields) { i =>
            if (ordRow.isNullAt(i)) null
            else InternalRow.copyValue(ordRow.get(i, orderTypes(i)))
          }
          if (heap.size < kLocal) {
            heap.enqueue((ordVal, row.copy()))
          } else if (ranked.compare(ordVal, heap.head._1) < 0) {
            heap.dequeue()
            heap.enqueue((ordVal, row.copy()))
          }
        }
      }
      val kept = heaps.valuesIterator.flatMap(_.iterator.map(_._2))
      if (overflow == null) kept else kept ++ overflow.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to its physical operators:
  * a partial (pre-exchange, map-side) heap pass under the final one —
  * EnsureRequirements inserts the key exchange between them, so the
  * shuffle carries per-map-partition top-ks, not the full input. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, order, child) =>
      val maxKeys = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.topk.partialMaxKeys", "262144").toInt
      TopKPerKeyExec(k, keys, order, partial = false, maxKeys,
        TopKPerKeyExec(k, keys, order, partial = true, maxKeys,
          planLater(child))) :: Nil
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
    * default; nulls rank LAST either direction — the original API
    * contract, preserved as an explicit NullsLast SortOrder; ties
    * unresolved — pass a unique tiebreak, e.g. `struct(score, id)`).
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
      Seq(SortOrder(attr(ordName),
        if (descending) Descending else org.apache.spark.sql.catalyst.expressions.Ascending,
        org.apache.spark.sql.catalyst.expressions.NullsLast, Seq.empty)),
      analyzed)
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], node).drop(ordName)
  }
}
