package org.apache.spark.sql.graftnative

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, Filter, PrunedFilteredScan, RelationProvider, StreamSourceProvider}
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
class GraftDeltaDataSource extends RelationProvider
    with StreamSourceProvider with DataSourceRegister {

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
    if (cdf) {
      val df = DeltaImport.readChanges(spark, path,
        parameters.get("startingVersion").map(_.toLong).getOrElse(0L),
        parameters.get("endingVersion").map(_.toLong).getOrElse(Long.MaxValue))
      new GraftDeltaRelation(sqlContext, df, None)
    } else {
      // Resolve the snapshot ONCE at relation creation: every scan —
      // pruned or not — reads this pinned version, and the pushed filter
      // drives per-file stats/partition skipping (DeltaSkipping).
      val pinned = versionAsOf.orElse(timestampAsOf.map(ms =>
        DeltaImport.versionAsOfTimestamp(spark, path, ms)))
      val snap = DeltaImport.snapshot(spark, path, pinned)
      new GraftDeltaRelation(sqlContext, DeltaImport.read(spark, snap), Some(snap))
    }
  }

  private def parseTsMs(s: String): Long =
    s.toLongOption.getOrElse {
      val norm = if (s.contains(" ") || s.contains("T")) s.replace(' ', 'T')
        else s + "T00:00:00"
      java.time.LocalDateTime.parse(norm)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }

  // ---------------------------------- streaming: Delta table as a SOURCE

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta streaming source requires option 'path'"))
    val head = DeltaImport.snapshot(sqlContext.sparkSession, path)
    val s = schema.getOrElse(
      if (parameters.get("readChangeFeed").exists(_.toBoolean))
        DeltaImport.cdfSchemaOf(head)
      else head.schema)
    (shortName(), s)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new GraftDeltaTableSource(sqlContext.sparkSession, parameters("path"),
      cdf = parameters.get("readChangeFeed").exists(_.toBoolean),
      maxVersionsPerTrigger = parameters.get("maxVersionsPerTrigger").map(_.toInt))
}

/** Version-offset streaming source over a DELTA table's log (the streaming
  * form of the bridge — Delta's own streaming-source model): each
  * micro-batch serves exactly the commits in (start, end].
  *
  *  - plain mode: dataChange adds stream as rows; a commit carrying
  *    dataChange removes or cdc actions is a REWRITE and fails the query
  *    loudly (stream the CDF for mutating tables — Delta's contract);
  *  - `readChangeFeed=true`: per-commit CDF batches, same synthesis rules
  *    as the batch [[DeltaImport.readChanges]] (cdc actions as-is, blind
  *    adds as inserts, whole-file removes as deletes). */
class GraftDeltaTableSource(
    sparkSession: SparkSession,
    root: String,
    cdf: Boolean,
    protected val maxVersionsPerTrigger: Option[Int] = None)
    extends Source with VersionAdmission {

  private val head = DeltaImport.snapshot(sparkSession, root)
  private val schema0: StructType =
    if (cdf) DeltaImport.cdfSchemaOf(head) else head.schema

  override def schema: StructType = schema0
  override protected def currentVersion: Long =
    DeltaImport.latestVersion(sparkSession, root)

  override def getOffset: Option[Offset] = {
    val v = currentVersion
    if (v < 0) None else Some(LongOffset(v))
  }

  /** Streaming parquet relation over explicit paths — the V1 source
    * contract (isStreaming LogicalRelation; only this package can build
    * one, hence the callback into [[DeltaImport.changeFrames]]). */
  private def streamingParquet(paths: Seq[String], s: StructType): DataFrame =
    GraftTableSource.streamingParquet(sparkSession, paths, s)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(-1L)
    val to = versionOf(end)
    val changes = DeltaImport.changesBetween(sparkSession, root, from, to)
    val frames =
      if (cdf) DeltaImport.changeFrames(sparkSession, head, changes, streamingParquet)
      else {
        changes.foreach { c =>
          if (c.removes.nonEmpty || c.cdc.nonEmpty)
            throw new UnsupportedOperationException(
              s"version ${c.version} of $root is ${c.operation} (a rewrite) — " +
                "version-aware streaming requires an append-only Delta table; " +
                "stream the CDF (readChangeFeed=true) for mutating tables")
        }
        val headCols = head.schema.fieldNames.map(n => col(s"`$n`")).toIndexedSeq
        DeltaImport.changeFrames(sparkSession, head,
          changes.filter(_.adds.nonEmpty), streamingParquet)
          .map(_.select(headCols: _*))
      }
    if (frames.isEmpty)
      GraftTableSource.emptyStreamingBatch(sparkSession, schema0)
    else frames.reduce(_ unionByName _)
  }

  override def stop(): Unit = ()
}

/** Read-only scan over the resolved Delta snapshot/CDF frame. When the
  * relation is a plain snapshot (`snap` present), pushed filters drive
  * FILE-level data skipping over the pinned version's `add.stats` and
  * partitionValues ([[graft.sources.DeltaSkipping]]); Spark re-applies the
  * exact filters on top, so correctness never depends on the pruning. */
class GraftDeltaRelation(val sqlContext: SQLContext, df: DataFrame,
    snap: Option[graft.sources.DeltaImport.Snapshot])
    extends BaseRelation with PrunedFilteredScan {

  override def schema: StructType = df.schema
  override def needConversion: Boolean = false

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val cond = filters.flatMap(GraftRelation.translate).reduceOption(_ && _)
    val base = (cond, snap) match {
      case (Some(c), Some(s)) =>
        DeltaImport.whereSnapshot(sqlContext.sparkSession, s, c)
      case (Some(c), None) => df.filter(c)
      case (None, _) => df
    }
    val pruned =
      if (requiredColumns.isEmpty) base.select()
      else base.select(requiredColumns.map(c => col(s"`$c`")).toSeq: _*)
    pruned.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}
