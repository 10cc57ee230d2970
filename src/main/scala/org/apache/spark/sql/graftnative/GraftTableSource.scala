package org.apache.spark.sql.graftnative

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession, functions}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxFiles, SupportsAdmissionControl, Offset => OffsetV2}
import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.table.GraftTable

/** Version-range admission control shared by both graft streaming sources:
  * `maxVersionsPerTrigger` caps how many COMMITS a micro-batch may span
  * (Delta's `maxFilesPerTrigger` analogue at our offset granularity), so a
  * backfill over a long table history proceeds in bounded batches instead
  * of one giant first batch. */
private[graftnative] trait VersionAdmission extends SupportsAdmissionControl {
  protected def currentVersion: Long
  protected def maxVersionsPerTrigger: Option[Int]

  /** Byte budget per micro-batch (Delta's `maxBytesPerTrigger`): versions
    * are admitted until the NEXT one would exceed the budget; the first
    * pending version is always admitted (a single over-budget commit must
    * still make progress — Delta's rule). Sizes come from a driver-side
    * listing of each candidate version's dirs, paid once per trigger. */
  protected def maxBytesPerTrigger: Option[Long] = None

  /** Bytes a single version would contribute to a batch (0 = none). */
  protected def bytesOfVersion(v: Long): Long = 0L

  protected def versionOf(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(n => ReadLimit.maxFiles(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val head = currentVersion
    if (head < 0) return null
    val from = Option(startOffset)
      .map(o => versionOf(o.asInstanceOf[Offset])).getOrElse(-1L)
    val versionCap = limit match {
      case mf: ReadMaxFiles => math.min(head, from + mf.maxFiles())
      case _ => head
    }
    val to = maxBytesPerTrigger match {
      case Some(budget) if versionCap > from =>
        var v = from + 1
        var spent = bytesOfVersion(v) // first version always admitted
        var continue = true
        while (continue && v < versionCap) {
          val next = bytesOfVersion(v + 1)
          if (spent + next <= budget) { v += 1; spent += next }
          else continue = false
        }
        v
      case _ => versionCap
    }
    if (to <= from) null else LongOffset(to)
  }

  override def reportLatestOffset(): OffsetV2 = {
    val head = currentVersion
    if (head < 0) null else LongOffset(head)
  }
}

/** Version-aware streaming source over a [[GraftTable]]: offsets are commit
  * versions, and each micro-batch emits exactly the rows ADDED by the
  * commits in (start, end] — the Delta streaming-source model, replacing
  * the glob-based file stream:
  *
  *  - APPEND commits emit their new data dir.
  *  - OPTIMIZE commits emit NOTHING (same rows, new files) — compaction no
  *    longer re-feeds downstream consumers, which the glob approach
  *    couldn't avoid.
  *  - Rewriting commits (MERGE/DELETE/UPDATE/WRITE/RESTORE) fail the query
  *    with a clear message: stream `_changes` (the CDF) for mutating
  *    tables.
  *
  * Usage: `spark.readStream.format("graft-table").option("path", root)`
  * (or the provider class name). V1 `Source` API on purpose: `getBatch`
  * can hand back a parquet relation over exactly the right dirs, reusing
  * the vectorized reader — the same reason Delta's source is V1.
  */
class GraftTableSource(
    sparkSession: SparkSession,
    root: String,
    protected val maxVersionsPerTrigger: Option[Int] = None,
    protected override val maxBytesPerTrigger: Option[Long] = None)
    extends Source with VersionAdmission {

  private val table = GraftTable.forPath(sparkSession, root)
  private val initialSchema: StructType = table.read().schema

  override def schema: StructType = initialSchema
  override protected def currentVersion: Long = table.version

  override protected def bytesOfVersion(v: Long): Long =
    GraftTableSource.dirsBytes(sparkSession, table.appendedDirsBetween(v - 1, v))

  override def getOffset: Option[Offset] = {
    val v = table.version
    if (v < 0) None else Some(LongOffset(v))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(-1L)
    val to = versionOf(end)
    val dirs = table.appendedDirsBetween(from, to)
    if (dirs.isEmpty)
      GraftTableSource.emptyStreamingBatch(sparkSession, initialSchema)
    else
      GraftTableSource.streamingParquet(sparkSession, dirs, initialSchema)
  }

  override def stop(): Unit = ()
}

/** Version-offset streaming source over a table's Change Data Feed: each
  * micro-batch is exactly the CDF rows emitted by the commits in
  * (start, end] — valid for mutating tables (the streaming form of
  * `option("readChangeFeed", true)`).
  *
  * APPEND commits write no `_changes` dir; like the batch
  * [[GraftTable.readChanges]] (and Delta's streaming CDF, which serves
  * AddFile actions as inserts), their insert rows are synthesized here by
  * reading each append's added dirs with that commit's schema, aligning to
  * the CDF schema, and stamping the three CDF columns as literals — so
  * batch and streaming CDF agree on every commit type. */
class GraftChangesSource(
    sparkSession: SparkSession,
    root: String,
    protected val maxVersionsPerTrigger: Option[Int] = None,
    protected override val maxBytesPerTrigger: Option[Long] = None)
    extends Source with VersionAdmission {

  private val table = GraftTable.forPath(sparkSession, root)
  private val cdfSchema: StructType = table.changesSchema

  override def schema: StructType = cdfSchema
  override protected def currentVersion: Long = table.version

  // Append dirs count toward the byte budget too: admission control must
  // see the bytes a version will actually feed the batch.
  override protected def bytesOfVersion(v: Long): Long =
    GraftTableSource.dirsBytes(sparkSession, table.changeDirsBetween(v - 1, v) ++
      table.appendCommitsBetween(v - 1, v).flatMap(_._2))

  override def getOffset: Option[Offset] = {
    val v = table.version
    if (v < 0) None else Some(LongOffset(v))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(-1L)
    val to = versionOf(end)
    def streamingParquet(paths: Seq[String], s: StructType): DataFrame =
      GraftTableSource.streamingParquet(sparkSession, paths, s)

    val changeDirs = table.changeDirsBetween(from, to)
    val written =
      if (changeDirs.isEmpty) Nil else Seq(streamingParquet(changeDirs, cdfSchema))
    // Synthesized append inserts — mirror of readChanges: the commit's own
    // schema on disk, nulls for columns added later, literal CDF stamps.
    val synthesized = table.appendCommitsBetween(from, to).map { case (c, dirs) =>
      val cSchema = DataType.fromJson(c.schemaJson).asInstanceOf[StructType]
      streamingParquet(dirs, cSchema).select(cdfSchema.fields.map { f =>
        if (f.name == "_change_type") functions.lit("insert").as(f.name)
        else if (f.name == "_commit_version") functions.lit(c.version).as(f.name)
        else if (f.name == "_commit_timestamp")
          functions.lit(new java.sql.Timestamp(c.tsMs)).as(f.name)
        else if (cSchema.fieldNames.contains(f.name)) functions.col(s"`${f.name}`")
        else functions.lit(null).cast(f.dataType).as(f.name)
      }.toSeq: _*)
    }
    val parts = written ++ synthesized
    if (parts.isEmpty)
      GraftTableSource.emptyStreamingBatch(sparkSession, cdfSchema)
    else parts.reduce(_ unionByName _)
  }

  override def stop(): Unit = ()
}

class GraftTableSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def readChangeFeed(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-table source requires option 'path'"))
    val t = GraftTable.forPath(sqlContext.sparkSession, root)
    val s = schema.getOrElse(
      if (readChangeFeed(parameters)) t.changesSchema else t.read().schema)
    (shortName(), s)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val maxVersions = parameters.get("maxVersionsPerTrigger").map(_.toInt)
    val maxBytes = parameters.get("maxBytesPerTrigger").map(_.toLong)
    if (readChangeFeed(parameters))
      new GraftChangesSource(sqlContext.sparkSession, parameters("path"),
        maxVersions, maxBytes)
    else
      new GraftTableSource(sqlContext.sparkSession, parameters("path"),
        maxVersions, maxBytes)
  }
}

object GraftTableSource {
  /** Driver-side byte size of a version's dirs — one listing per dir per
    * admission decision (the commit log records stats, not file bytes;
    * at trigger cadence the RPC cost is noise). */
  private[graftnative] def dirsBytes(spark: SparkSession, dirs: Seq[String]): Long =
    dirs.map { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
          .sessionState.newHadoopConf())
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }.sum

  /** Streaming (V1-source) parquet relation over explicit paths with a
    * declared schema — the one construction every version-offset source
    * in this package shares (graft appends, graft CDF, the Delta bridge). */
  private[graftnative] def streamingParquet(spark: SparkSession,
      paths: Seq[String], s: StructType): DataFrame = {
    val classicSpark = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val relation = DataSource(
      sparkSession = classicSpark,
      paths = paths,
      userSpecifiedSchema = Some(s),
      className = "parquet").resolveRelation(checkFilesExist = false)
    org.apache.spark.sql.classic.Dataset.ofRows(classicSpark,
      LogicalRelation(relation, isStreaming = true))
  }

  /** Empty micro-batch — must still carry isStreaming=true. */
  private[graftnative] def emptyStreamingBatch(spark: SparkSession,
      s: StructType): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
        org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(s),
        Seq.empty, isStreaming = true))
}
