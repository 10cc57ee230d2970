package org.apache.spark.sql.graftnative

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{DataType, StructType, TimestampType}

import graft.table.GraftTable

/** Delta's SQL time-travel syntax for graft relations:
  * {{{
  *   SELECT … FROM t VERSION AS OF 3
  *   SELECT … FROM t TIMESTAMP AS OF '2026-01-01 00:00:00'
  * }}}
  * Spark's own parser already accepts the temporal clause (it produces a
  * [[RelationTimeTravel]] node), but the stock analyzer resolves it only
  * for DSv2 catalog tables — a temp view or v1 table fails with
  * "time travel is not supported". This delegating parser rewrites the
  * node BEFORE analysis whenever the identifier names a graft relation —
  * a `USING graft` temp view or catalog table — into the pinned-version
  * read ([[GraftTable.readVersion]] / [[GraftTable.readAsOf]]). Anything
  * else passes through untouched, so non-graft behavior is unchanged.
  * (Reference exercises option-based travel, notebook cells 22-24; the
  * SQL clause is Delta's user-facing form of the same read.) */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    rewrite(delegate.parseQuery(sqlText))

  // Parameterized SQL (spark.sql(text, args)) enters through this default
  // method; without explicit delegation the interface default would skip
  // the real parser's parameter machinery.
  override def parsePlanWithParameters(sqlText: String,
      parameterContext: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    rewrite(delegate.parsePlanWithParameters(sqlText, parameterContext))

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver) =>
      graftTableOf(u.multipartIdentifier) match {
        case Some(t) =>
          val df = (ver, ts) match {
            case (Some(v), _) =>
              val n = try v.trim.toLong catch {
                case _: NumberFormatException => throw new IllegalArgumentException(
                  s"graft VERSION AS OF needs an integer version, got '$v'")
              }
              t.readVersion(n)
            case (None, Some(e)) => t.readAsOf(evalTsMillis(e))
            case _ => t.read()
          }
          SubqueryAlias(u.multipartIdentifier.last, df.queryExecution.logical)
        case None => tt // not graft's — stock resolution (and its errors) apply
      }
  }

  /** Evaluate the temporal-clause expression to epoch millis (literals and
    * foldable casts; the session time zone applies to naive strings). */
  private def evalTsMillis(e: Expression): Long = {
    val zone = session.sessionState.conf.sessionLocalTimeZone
    val cast = Cast(e, TimestampType, Some(zone))
    cast.eval(null) match {
      // Non-ANSI Cast yields null for a malformed timestamp string —
      // surface it (null.asInstanceOf[Long] would silently read epoch 0).
      case null => throw new IllegalArgumentException(
        s"TIMESTAMP AS OF: cannot parse '${e.sql}' as a timestamp")
      case micros: Long => Math.floorDiv(micros, 1000L)
      case other => throw new IllegalArgumentException(
        s"TIMESTAMP AS OF: unexpected value $other for '${e.sql}'")
    }
  }

  /** The graft table behind an identifier: a temp/global-temp view whose
    * stored plan is a `USING graft` relation, or a `USING graft` catalog
    * table (path in storage properties). */
  private def graftTableOf(name: Seq[String]): Option[GraftTable] = {
    val cat = session.sessionState.catalog
    def extract(p: LogicalPlan): Option[GraftTable] = p.collectFirst {
      case lr: LogicalRelation if lr.relation.isInstanceOf[GraftRelation] =>
        lr.relation.asInstanceOf[GraftRelation].headTable.map(_._1)
    }.flatten
    // Temp views register under the conf-formatted (lowercased) name; an
    // as-typed miss retries lowercased so quoted/cased SQL still resolves.
    def view(lookup: String => Option[LogicalPlan], v: String): Option[GraftTable] =
      lookup(v).orElse(lookup(v.toLowerCase)).flatMap(extract)
    val fromView = name match {
      case Seq(v) => view(cat.getTempView(_), v)
      case Seq(g, v) if g.equalsIgnoreCase("global_temp") =>
        view(cat.getGlobalTempView(_), v)
      case _ => None
    }
    fromView.orElse {
      val ident = name match {
        case Seq(t) => Some(TableIdentifier(t))
        case Seq(db, t) => Some(TableIdentifier(t, Some(db)))
        case _ => None
      }
      ident.flatMap { ti =>
        try {
          val meta = cat.getTableMetadata(ti)
          if (meta.provider.exists(_.equalsIgnoreCase("graft")))
            meta.storage.properties.get("path")
              .orElse(meta.storage.locationUri.map(_.toString))
              .map(p => GraftTable.forPath(session, p))
          else None
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }

  // ------------------------------------------------- pure delegation below

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
