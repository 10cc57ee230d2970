package org.apache.spark.sql.graftnative

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, Filter, PrunedFilteredScan, RelationProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.DeltaImport

/** `format("graft-delta")` — the read-only Delta Lake bridge as a standard
  * Spark data source, so plain SQL opens a frozen Delta table (the
  * reference's own `deltalake/` artifacts) without the Delta jar:
  *
  * {{{
  *   spark.read.format("graft-delta").load("/path/to/delta_table")
  *   spark.read.format("graft-delta").option("versionAsOf", 0).load(p)
  *   spark.read.format("graft-delta").option("timestampAsOf", "2026-01-01").load(p)
  *   spark.read.format("graft-delta").option("readChangeFeed", "true")
  *     .option("startingVersion", 0).load(p)
  *   CREATE TEMPORARY VIEW d USING `graft-delta` OPTIONS (path '…')
  * }}}
  *
  * Writes are refused by construction (no CreatableRelationProvider): the
  * migration path is [[DeltaImport.importTable]] into a graft table.
  * Filters are re-applied by Spark on top of the scan, so the relation
  * only uses them for the scan condition — correctness never depends on
  * pushdown (same contract as [[GraftRelation]]). */
class GraftDeltaDataSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-delta"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "format(\"graft-delta\") requires a path: .load(root) / OPTIONS (path '…')"))
    val versionAsOf = parameters.get("versionAsOf").map(_.toLong)
    val timestampAsOf = parameters.get("timestampAsOf").map(parseTsMs)
    val cdf = parameters.get("readChangeFeed").exists(_.toBoolean)
    require(Seq(cdf, versionAsOf.isDefined, timestampAsOf.isDefined)
      .count(identity) <= 1,
      "readChangeFeed / versionAsOf / timestampAsOf are mutually exclusive")
    val df =
      if (cdf) DeltaImport.readChanges(spark, path,
        parameters.get("startingVersion").map(_.toLong).getOrElse(0L),
        parameters.get("endingVersion").map(_.toLong).getOrElse(Long.MaxValue))
      else (versionAsOf, timestampAsOf) match {
        case (Some(v), _) => DeltaImport.read(spark, path, Some(v))
        case (_, Some(ms)) => DeltaImport.readAsOf(spark, path, ms)
        case _ => DeltaImport.read(spark, path)
      }
    new GraftDeltaRelation(sqlContext, df)
  }

  private def parseTsMs(s: String): Long =
    s.toLongOption.getOrElse {
      val norm = if (s.contains(" ") || s.contains("T")) s.replace(' ', 'T')
        else s + "T00:00:00"
      java.time.LocalDateTime.parse(norm)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }
}

/** Read-only scan over the resolved Delta snapshot/CDF frame. */
class GraftDeltaRelation(val sqlContext: SQLContext, df: DataFrame)
    extends BaseRelation with PrunedFilteredScan {

  override def schema: StructType = df.schema
  override def needConversion: Boolean = false

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val base = filters.flatMap(GraftRelation.translate)
      .reduceOption(_ && _).map(df.filter).getOrElse(df)
    val pruned =
      if (requiredColumns.isEmpty) base.select()
      else base.select(requiredColumns.map(c => col(s"`$c`")).toSeq: _*)
    pruned.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}
