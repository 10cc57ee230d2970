package org.apache.spark.sql.graftnative

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

import graft.table.SqlSkipping

/** Metadata-only aggregates over registered graft views (the
  * OptimizeMetadataOnlyDeltaQuery analogue): an ungrouped, unfiltered
  * `COUNT(*)` / `COUNT(col)` / `MIN(col)` / `MAX(col)` whose child is a
  * plain parquet scan of a registered [[graft.table.GraftTable]]
  * snapshot is answered from the commit's row/null/range bookkeeping —
  * the scan disappears from the plan entirely (a `LocalRelation` with
  * the one answer row replaces it). `SELECT count(*), max(ts) FROM
  * events` over 100 TB then reads zero bytes of data, exactly like
  * Delta/Iceberg stats-based answers.
  *
  * Soundness gates (any miss leaves the plan untouched):
  *   - every aggregate output is a non-distinct, unfiltered COUNT of a
  *     non-null literal (count(*)/count(1)), COUNT of a plain attribute,
  *     or MIN/MAX of a plain attribute;
  *   - the child is the bare relation, optionally under column-pruning
  *     Projects of plain attributes (no expressions, no Filter — a
  *     filtered aggregate must scan);
  *   - [[graft.table.GraftTable.metadataCount]] /
  *     [[graft.table.GraftTable.metadataExtreme]] vouch for exactness:
  *     complete per-dir row counts, known null counts, value-exact
  *     stats encodings for MIN/MAX (int/long/date/timestamp only —
  *     never widened decimals, string prefixes, or NaN-prone floats),
  *     no merge-on-read state, no partition/nested columns.
  * Idempotent by construction: the rewritten node no longer matches. */
object GraftMetadataOnlyAggregate extends Rule[LogicalPlan] {

  private sealed trait Target
  private final case class CountOf(col: Option[String]) extends Target
  private final case class ExtremeOf(col: String, isMin: Boolean) extends Target

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (SqlSkipping.isEmpty) return plan
    plan.transform {
      case a @ Aggregate(Nil, aggExprs, child, _) =>
        (for {
          paths <- scanPaths(child)
          targets <- answerTargets(aggExprs)
          values <- answers(targets, paths)
        } yield LocalRelation(
          a.output,
          Seq(InternalRow.fromSeq(values)))).getOrElse(a)
    }
  }

  /** What each output asks for. Fails the whole rewrite unless EVERY
    * output is a metadata-answerable aggregate. */
  private def answerTargets(
      aggExprs: Seq[NamedExpression]): Option[Seq[Target]] = {
    val resolved: Seq[Option[Target]] = aggExprs.map {
      case Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty && ae.mode == Complete =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(v, _))) if v != null => Some(CountOf(None))
          case Count(Seq(attr: AttributeReference)) => Some(CountOf(Some(attr.name)))
          case Min(attr: AttributeReference) => Some(ExtremeOf(attr.name, isMin = true))
          case Max(attr: AttributeReference) => Some(ExtremeOf(attr.name, isMin = false))
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
      targets: Seq[Target], paths: Seq[Path]): Option[Seq[Any]] = {
    // Data dirs live two levels under the table root (<root>/data/v…) —
    // same candidate derivation (and same multi-snapshot disambiguation)
    // as GraftScanSkipping.
    val candidate = Option(paths.head.getParent).flatMap(p => Option(p.getParent))
    candidate.map(_.toString).map(SqlSkipping.lookup).getOrElse(Nil)
      .iterator.map { e =>
        targets.foldLeft(Option(Vector.empty[Any])) { (acc, t) =>
          for {
            vs <- acc
            v <- t match {
              case CountOf(c) => SqlSkipping.metadataCount(e, c, paths)
              case ExtremeOf(c, isMin) =>
                SqlSkipping.metadataExtreme(e, c, isMin, paths).map(_.orNull)
            }
          } yield vs :+ (v: Any)
        }
      }
      .collectFirst { case Some(vs) => vs }
  }
}
