package org.apache.spark.sql.graftnative

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

import graft.table.SqlSkipping

/** Metadata-only aggregates over registered graft views (the
  * OptimizeMetadataOnlyDeltaQuery analogue): an ungrouped, unfiltered
  * `COUNT(*)` / `COUNT(col)` whose child is a plain parquet scan of a
  * registered [[graft.table.GraftTable]] snapshot is answered from the
  * commit's row/null bookkeeping — the scan disappears from the plan
  * entirely (a `LocalRelation` with the one answer row replaces it).
  * `SELECT count(*) FROM events` over 100 TB then reads zero bytes of
  * data, exactly like Delta/Iceberg stats-based counts.
  *
  * Soundness gates (any miss leaves the plan untouched):
  *   - every aggregate output is a non-distinct, unfiltered COUNT of a
  *     non-null literal (count(*)/count(1)) or of a plain attribute;
  *   - the child is the bare relation, optionally under column-pruning
  *     Projects of plain attributes (no expressions, no Filter — a
  *     filtered count must scan);
  *   - [[graft.table.GraftTable.metadataCount]] vouches for exactness:
  *     complete per-dir row counts, known null counts for the counted
  *     column, no merge-on-read state, no partition/nested columns.
  * Idempotent by construction: the rewritten node no longer matches. */
object GraftMetadataOnlyAggregate extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (SqlSkipping.isEmpty) return plan
    plan.transform {
      case a @ Aggregate(Nil, aggExprs, child, _) =>
        (for {
          paths <- scanPaths(child)
          counted <- countTargets(aggExprs)
          values <- answers(counted.map(_._2), paths)
        } yield LocalRelation(
          a.output,
          Seq(InternalRow.fromSeq(values)))).getOrElse(a)
    }
  }

  /** The counted column per output: None = COUNT(*) semantics. Fails the
    * whole rewrite unless EVERY output is an answerable COUNT. */
  private def countTargets(
      aggExprs: Seq[NamedExpression]): Option[Seq[(NamedExpression, Option[String])]] = {
    val resolved = aggExprs.map {
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty && ae.mode == Complete =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(v, _))) if v != null => Some(al -> None)
          case Count(Seq(attr: AttributeReference)) => Some(al -> Some(attr.name))
          case _ => None
        }
      case _ => None
    }
    if (resolved.forall(_.isDefined)) Some(resolved.flatten) else None
  }

  /** The scan's root paths, provided the child is the bare registered
    * relation under at most attribute-only Projects (column pruning). */
  private def scanPaths(child: LogicalPlan): Option[Seq[Path]] = child match {
    case Project(projectList, inner) if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      scanPaths(inner)
    case lr: LogicalRelation =>
      lr.relation match {
        case rel: HadoopFsRelation
            if rel.partitionSchema.isEmpty &&
              rel.location.isInstanceOf[InMemoryFileIndex] &&
              rel.location.rootPaths.nonEmpty =>
          Some(rel.location.rootPaths)
        case _ => None
      }
    case _ => None
  }

  private def answers(
      cols: Seq[Option[String]], paths: Seq[Path]): Option[Seq[Long]] = {
    // Data dirs live two levels under the table root (<root>/data/v…) —
    // same candidate derivation as GraftScanSkipping.
    val candidate = Option(paths.head.getParent).flatMap(p => Option(p.getParent))
    candidate.map(_.toString).flatMap(SqlSkipping.lookup).flatMap { e =>
      cols.foldLeft(Option(Vector.empty[Long])) { (acc, c) =>
        for (v <- acc; n <- SqlSkipping.metadataCount(e, c, paths)) yield v :+ n
      }
    }
  }
}
