package org.apache.spark.sql.graftnative

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, ExpressionUtils, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.LongType

import graft.table.GraftTable

/** Runnable commands behind graft's Delta-style SQL surface
  * (`DELETE FROM` / `UPDATE` / `MERGE INTO` / `OPTIMIZE` / `VACUUM` /
  * `DESCRIBE HISTORY` / `RESTORE TABLE`), produced by [[GraftSqlParser]]
  * when the named relation is a graft table. Each command is a thin
  * eager adapter over the corresponding [[GraftTable]] operation — all
  * transaction, CDF, and constraint semantics live there, identically
  * for the SQL and DataFrame entry points. Reference exercises the same
  * operations through delta-rs / Spark-Delta APIs
  * (spark_delta_handler.py:197-289, deltalake-query.ipynb cells 11-26);
  * the SQL forms are Delta's user-facing spellings of those calls. */
/** Opaque envelope hiding UNRESOLVED parsed expressions from TreeNode's
  * product traversal: a command's `Expression` fields are collected by
  * `QueryPlan.expressions` and CheckAnalysis then demands they resolve —
  * but DML conditions/assignments can only resolve against the table
  * read built at RUN time. Wrapping makes them payload, not plan. */
final class GraftParsed[+T](val value: T) extends Serializable {
  override def toString: String = String.valueOf(value)
  override def hashCode: Int = String.valueOf(value).hashCode
  override def equals(o: Any): Boolean = o match {
    case p: GraftParsed[_] => String.valueOf(p.value) == String.valueOf(value)
    case _ => false
  }
}
object GraftParsed { def apply[T](v: T): GraftParsed[T] = new GraftParsed(v) }

private[graftnative] object GraftSqlCommands {

  /** Delta returns a one-row metrics relation from DML; same here. */
  def metricAttrs(names: String*): Seq[Attribute] =
    names.map(n => AttributeReference(n, LongType, nullable = false)())

  /** DML conditions arrive as UNRESOLVED parsed trees; they are applied
    * with `df.filter` against the bare table read, where a `t.`/alias
    * qualifier has nothing to bind to. Strip qualifiers that name the
    * target so `DELETE FROM orders WHERE orders.x = 1` and the aliased
    * form both resolve; struct-field paths (first part NOT a known
    * qualifier) pass through untouched. */
  def stripQualifiers(e: Expression, qualifiers: Seq[String]): Expression = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val quals = qualifiers.map(_.toLowerCase)
    e.transformUp {
      case a: UnresolvedAttribute
          if a.nameParts.length >= 2 && quals.contains(a.nameParts.head.toLowerCase) =>
        UnresolvedAttribute(a.nameParts.tail)
    }
  }

  def sourceDf(session: SparkSession, plan: LogicalPlan) =
    ClassicDataset.ofRows(session.asInstanceOf[ClassicSparkSession], plan)
}

/** `DELETE FROM t [WHERE cond]`. No condition deletes every row (Delta
  * semantics), still as a logged, time-travelable commit. */
case class GraftDeleteCommand(
    table: GraftTable,
    condition: GraftParsed[Option[Expression]],
    qualifiers: Seq[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = GraftSqlCommands.metricAttrs("num_affected_rows")

  override def run(session: SparkSession): Seq[Row] = {
    val cond = condition.value
      .map(e => ExpressionUtils.column(GraftSqlCommands.stripQualifiers(e, qualifiers)))
      .getOrElse(lit(true))
    val c = table.delete(cond)
    Seq(Row(c.metrics.getOrElse("numDeletedRows", 0L)))
  }
}

/** `UPDATE t SET c = e, … [WHERE cond]`. Assignment targets must be
  * top-level columns of the table (matched case-insensitively, as SQL
  * resolution does); Delta has the same restriction for non-struct
  * assignments. */
case class GraftUpdateCommand(
    table: GraftTable,
    assignments: GraftParsed[Seq[(Seq[String], Expression)]],
    condition: GraftParsed[Option[Expression]],
    qualifiers: Seq[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = GraftSqlCommands.metricAttrs("num_affected_rows")

  override def run(session: SparkSession): Seq[Row] = {
    val fields = table.read().schema.fieldNames
    val setMap: Map[String, org.apache.spark.sql.Column] = assignments.value.map {
      case (nameParts, value) =>
        // An assignment key may carry the table/alias qualifier too.
        val bare = if (nameParts.length >= 2 &&
            qualifiers.exists(_.equalsIgnoreCase(nameParts.head))) nameParts.tail
          else nameParts
        val name = bare match {
          case Seq(one) => fields.find(_.equalsIgnoreCase(one)).getOrElse(
            throw new IllegalArgumentException(
              s"UPDATE SET target '$one' is not a column of the table " +
                s"(columns: ${fields.mkString(", ")})"))
          case other => throw new UnsupportedOperationException(
            s"graft SQL UPDATE supports top-level column assignments only, " +
              s"got '${other.mkString(".")}'")
        }
        name -> ExpressionUtils.column(
          GraftSqlCommands.stripQualifiers(value, qualifiers))
    }.toMap
    val cond = condition.value
      .map(e => ExpressionUtils.column(GraftSqlCommands.stripQualifiers(e, qualifiers)))
      .getOrElse(lit(true))
    val c = table.update(cond, setMap)
    Seq(Row(c.metrics.getOrElse("numUpdatedRows", 0L)))
  }
}

/** The canonical `MERGE INTO` shapes, mapped onto graft's keyed merge
  * primitives. [[GraftSqlParser]] admits exactly these; anything else
  * (multi-condition actions, explicit assignment lists, non-equi ON)
  * fails at parse time with an actionable message rather than silently
  * approximating Delta's row-level semantics. */
sealed trait GraftMergeShape
object GraftMergeShape {
  /** WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT * */
  case object Upsert extends GraftMergeShape
  /** WHEN NOT MATCHED THEN INSERT * only — CDC-style insert-if-absent. */
  case object InsertOnly extends GraftMergeShape
  /** WHEN MATCHED THEN DELETE only — delete keys present in the source. */
  case object DeleteMatched extends GraftMergeShape
}

/** `MERGE INTO t USING s ON t.k = s.k WHEN …` for the shapes above.
  * The source plan is analyzed at run time (it may be any query —
  * views, subqueries, joins), exactly as a DataFrame-API caller would
  * pass an arbitrary source frame to [[GraftTable.merge]]. */
case class GraftMergeCommand(
    table: GraftTable,
    sourcePlan: LogicalPlan,
    key: String,
    shape: GraftMergeShape) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = GraftSqlCommands.metricAttrs(
    "num_affected_rows", "num_updated_rows", "num_deleted_rows", "num_inserted_rows")

  override def run(session: SparkSession): Seq[Row] = {
    val src = GraftSqlCommands.sourceDf(session, sourcePlan)
    shape match {
      case GraftMergeShape.Upsert =>
        val c = table.merge(src, key)
        val upd = c.metrics.getOrElse("numTargetRowsUpdated",
          c.metrics.getOrElse("numUpdatedRows", 0L))
        val ins = c.metrics.getOrElse("numTargetRowsInserted",
          c.metrics.getOrElse("numInsertedRows", 0L))
        Seq(Row(upd + ins, upd, 0L, ins))
      case GraftMergeShape.InsertOnly =>
        // Insert-if-absent: anti-join the CURRENT key set, append the rest.
        // The anti-join is broadcast-or-shuffle by Catalyst's sizing; at
        // 100 TB the single-column key projection keeps the build side
        // minimal. NULL source keys can never match (Delta drops them in
        // the not-matched branch too — they'd insert; we keep them, same
        // as Delta, since NOT MATCHED is vacuously true for null keys).
        val existing = table.read().select(col(key))
        val novel = src.join(existing, Seq(key), "left_anti")
        val c = table.append(novel)
        val ins = c.metrics.getOrElse("numOutputRows", 0L)
        Seq(Row(ins, 0L, 0L, ins))
      case GraftMergeShape.DeleteMatched =>
        val c = table.deleteKeys(src.select(col(key)), key)
        val del = c.metrics.getOrElse("numDeletedRows", 0L)
        Seq(Row(del, 0L, del, 0L))
    }
  }
}

/** `OPTIMIZE t [WHERE pred] [ZORDER BY (c, …)]` — Delta's compaction
  * statement (S19, spark_delta_handler.py:282-289 runs the API form). */
case class GraftOptimizeCommand(
    table: GraftTable,
    where: GraftParsed[Option[Expression]],
    zorderBy: Seq[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = GraftSqlCommands.metricAttrs(
    "num_files_kept", "num_output_rows")

  override def run(session: SparkSession): Seq[Row] = {
    val c = where.value match {
      case Some(p) => table.optimizeWhere(
        ExpressionUtils.column(GraftSqlCommands.stripQualifiers(p, Nil)),
        zorderBy = zorderBy)
      case None => table.optimize(zorderBy = zorderBy)
    }
    Seq(Row(c.dataDirs.size.toLong, c.metrics.getOrElse("numOutputRows", 0L)))
  }
}

/** `VACUUM t [RETAIN n HOURS]` (S18; default retention 168 h as the
  * reference configures, docker-compose.yml spark-defaults). */
case class GraftVacuumCommand(
    table: GraftTable,
    retainHours: Option[Double]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = GraftSqlCommands.metricAttrs("num_deleted_dirs")

  override def run(session: SparkSession): Seq[Row] = {
    val removed = retainHours match {
      case Some(h) => table.vacuum(retentionHours = h)
      case None => table.vacuum()
    }
    Seq(Row(removed.size.toLong))
  }
}

/** `DESCRIBE HISTORY t` (S7) — the commit log as a relation, newest
  * first, same shape as [[GraftTable.history]] (which q14 oracles). */
case class GraftHistoryCommand(table: GraftTable) extends LeafRunnableCommand {

  // The history frame is built driver-side from the commit log (one row
  // per commit) — schema access and collect are both log-sized, not
  // data-sized.
  override val output: Seq[Attribute] =
    DataTypeUtils.toAttributes(table.history().schema)

  override def run(session: SparkSession): Seq[Row] =
    table.history().collect().toSeq
}

/** `RESTORE TABLE t TO VERSION AS OF n` (M? — q113's operation as SQL). */
case class GraftRestoreCommand(table: GraftTable, version: Long)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = GraftSqlCommands.metricAttrs(
    "table_version", "restored_to_version")

  override def run(session: SparkSession): Seq[Row] = {
    val c = table.restore(version)
    Seq(Row(c.version, version))
  }
}
