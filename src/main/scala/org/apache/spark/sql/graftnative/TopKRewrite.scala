package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, ExprId, Expression, LessThan, LessThanOrEqual, Literal, RowNumber, SortOrder, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule completing the custom-operator quartet (LogicalPlan +
  * Rule + Strategy + SparkPlan): the idiomatic Spark top-k-per-group
  * phrasing —
  *
  *   df.withColumn("rn", row_number().over(partitionBy(keys).orderBy(o)))
  *     .filter($"rn" <= k).drop("rn")
  *
  * — fully sorts every key group before discarding all but k rows. This
  * rule recognizes the analyzed Project(Filter(rn ≤ k, Window(row_number)))
  * shape and rewrites it to [[TopKPerKeyNode]], whose physical operator
  * keeps bounded per-key heaps in one pass with no sort. (Spark's own
  * InferWindowGroupLimit only PREFILTERS and still sorts + runs the window;
  * this removes both.)
  *
  * Fires only when the rewrite is semantics-preserving: the filter is
  * `rn <= k` / `rn < k` / `rn = 1` on the row_number output, and nothing
  * downstream reads `rn` (the outer Project must reference only the window
  * child's columns). The full `Seq[SortOrder]` — mixed directions and
  * explicit null orderings included — is handed to the heap, whose
  * per-field lexicographic comparator reproduces the window sort order
  * exactly (the first-cut operator could only encode uniform-direction
  * nulls-last orders as a struct, which silently excluded every
  * `(score DESC, id ASC)` ranking — the dominant kNN/ANN shape here —
  * from the rewrite).
  * Ties beyond the sort keys are tie-broken arbitrarily by BOTH phrasings
  * (row_number over a non-unique order is not contractually deterministic);
  * supply a unique tiebreak where exact row identity matters.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rn => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rn => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rn && k == 1 => Some(1)
    case _ => None
  }

  private def rewrite(
      outer: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression],
      cond: Expression,
      window: Window): Option[LogicalPlan] = window match {
    // The analyzed Window node's own partition/order fields are
    // authoritative (the WindowSpecDefinition inside the expression mirrors
    // them post-analysis).
    case Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _: WindowSpecDefinition), _)),
        partitionSpec, orderSpec, child, _)
        if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      for {
        k <- limitOf(cond, alias.exprId)
        // downstream must not read rn, and keys must be plain child columns
        if outer.forall(_.references.subsetOf(child.outputSet))
        if partitionSpec.forall(_.references.subsetOf(child.outputSet))
        if orderSpec.forall(_.child.references.subsetOf(child.outputSet))
        if k >= 1
      } yield {
        // extraOptimizations run after the main batches, so Spark's
        // InferWindowGroupLimit has usually already slid a logical
        // WindowGroupLimit (same spec, same k, derived from the same
        // filter) under the Window. The heap subsumes it — keeping it
        // would keep its partial/final Sorts too, defeating the rewrite.
        val source = child match {
          case WindowGroupLimit(ps, os, _, limit, grandchild)
              if limit >= k &&
                ps.length == partitionSpec.length &&
                ps.zip(partitionSpec).forall { case (a, b) => a.semanticEquals(b) } &&
                os.length == orderSpec.length &&
                os.zip(orderSpec).forall { case (a, b) => a.semanticEquals(b) } =>
            grandchild
          case other => other
        }
        // ColumnPruning can't see through the custom node, so prune here:
        // the heap only needs the columns the outer project, the keys, and
        // the order expression read.
        val needed = org.apache.spark.sql.catalyst.expressions.AttributeSet(
          outer.flatMap(_.references) ++
            partitionSpec.flatMap(_.references) ++
            orderSpec.flatMap(_.child.references))
        val pruned =
          if (needed.size < source.output.size)
            Project(source.output.filter(needed.contains), source)
          else source
        Project(outer, TopKPerKeyNode(k, partitionSpec, orderSpec, pruned))
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(outer, Filter(cond, w: Window)) =>
      rewrite(outer, cond, w).getOrElse(p)
    // withColumn leaves a pass-through Project between Filter and Window
    // until CollapseProject runs; handle that shape too when it only
    // forwards attributes.
    case p @ Project(outer, Filter(cond, Project(passThrough, w: Window)))
        if passThrough.forall(_.isInstanceOf[AttributeReference]) =>
      rewrite(outer, cond, w).getOrElse(p)
  }
}
