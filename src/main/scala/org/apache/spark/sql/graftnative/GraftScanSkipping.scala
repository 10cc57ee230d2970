package org.apache.spark.sql.graftnative

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

import graft.table.SqlSkipping

/** Transparent dir-level data skipping for SQL over registered graft
  * views (the PrepareDeltaScan analogue): a `Filter` directly above a
  * plain parquet scan whose root paths are the data dirs of a registered
  * [[graft.table.GraftTable]] snapshot gets its file listing replaced by
  * the pruned one the table derives from the filter condition — range
  * stats, string prefixes, CHECK-constraint bounds, null counts and
  * bloom sidecars, same sources as `GraftTable.where`.
  *
  * Runs inside the operator-optimization fixed point (after predicate
  * pushdown has parked filters on the scans), so it must be idempotent
  * and cheap: it fast-exits when nothing is registered, only rewrites
  * when the kept set actually shrinks (the second visit computes
  * kept == current and no-ops), and skips every shape it can't prove —
  * partitioned relations (Spark's own partition pruning owns those),
  * paths that aren't a registered snapshot's data dirs, non-parquet
  * locations. The filter stays in place, so a rewrite can only remove
  * files the condition provably cannot match: plan semantics unchanged. */
object GraftScanSkipping extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (SqlSkipping.isEmpty) return plan
    plan.transform {
      case f @ Filter(cond, lr: LogicalRelation) =>
        lr.relation match {
          case rel: HadoopFsRelation
              if rel.partitionSchema.isEmpty &&
                rel.location.isInstanceOf[InMemoryFileIndex] &&
                rel.location.rootPaths.nonEmpty =>
            prunedPaths(cond, rel.location.rootPaths) match {
              case Some(kept) if kept.size < rel.location.rootPaths.size =>
                val idx = new InMemoryFileIndex(
                  rel.sparkSession, kept, rel.options, None)
                Filter(cond,
                  lr.copy(relation = rel.copy(location = idx)(rel.sparkSession)))
              case _ => f
            }
          // Hive-partitioned graft reads are a UNION of single-dir
          // relations (one basePath per version dir); pushdown copies the
          // filter into every branch, so pruning here means keeping or
          // emptying a WHOLE branch — the partition schema and listing
          // semantics stay untouched (an empty listing just yields zero
          // partitions), and Spark's own partition pruning still handles
          // the partition-column predicates inside surviving branches.
          case rel: HadoopFsRelation
              if rel.partitionSchema.nonEmpty &&
                rel.location.isInstanceOf[InMemoryFileIndex] &&
                rel.location.rootPaths.size == 1 =>
            prunedPaths(cond, rel.location.rootPaths) match {
              case Some(kept) if kept.isEmpty =>
                val idx = new InMemoryFileIndex(
                  rel.sparkSession, Nil, rel.options,
                  Some(rel.partitionSchema))
                Filter(cond,
                  lr.copy(relation = rel.copy(location = idx)(rel.sparkSession)))
              case _ => f
            }
          case _ => f
        }
    }
  }

  private def prunedPaths(
      cond: org.apache.spark.sql.catalyst.expressions.Expression,
      paths: Seq[Path]): Option[Seq[Path]] = {
    // All data dirs live two levels under the table root (<root>/data/v…),
    // so the candidate root is the grand-parent of any scan path. Several
    // snapshots of the table may be registered (head + time-travel
    // views); the one whose dataDirs cover these paths answers.
    val candidate = Option(paths.head.getParent).flatMap(p => Option(p.getParent))
    candidate.map(_.toString).map(SqlSkipping.lookup).getOrElse(Nil)
      .iterator.map(e => SqlSkipping.prune(e, cond, paths))
      .collectFirst { case Some(kept) => kept }
  }
}
