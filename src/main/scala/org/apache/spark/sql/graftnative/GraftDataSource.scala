package org.apache.spark.sql.graftnative

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.table.GraftTable

/** `format("graft")` — the standard Spark DataSource surface over
  * [[graft.table.GraftTable]], so ANY Spark user (or plain SQL via
  * `CREATE TABLE t USING graft OPTIONS (path '…')`) reads and writes graft
  * tables without touching the library API — the packaging Delta ships as
  * its `format("delta")` (reference: consumer/spark-streaming's
  * `.format("delta")` read/write calls throughout spark_streaming.py).
  *
  * Read options (Delta-parity names):
  *  - `versionAsOf`        — time travel to a version
  *  - `timestampAsOf`      — time travel to `yyyy-MM-dd HH:mm:ss` (UTC) or
  *                           epoch millis
  *  - `readChangeFeed`     — `true` → the CDF rows, with `startingVersion`
  *                           / `endingVersion` bounds
  *
  * Write: `df.write.format("graft").mode(m).save(root)` maps SaveMode onto
  * the table's commit surface — Append → APPEND commit (creates on first
  * write), Overwrite → OVERWRITE commit, ErrorIfExists / Ignore per their
  * contracts. `option("partitionBy", "a,b")` partitions a CREATE
  * (the DSv1 seam drops `df.write.partitionBy`, so it rides an option).
  *
  * Scan path: [[GraftRelation.buildScan]] receives Spark's pushed-down
  * predicates, rebuilds a Column condition, and routes HEAD reads through
  * [[GraftTable.whereVersion]] pinned to the version captured at
  * relation-creation time — the dir-level data-skipping scan (range stats,
  * string prefixes, constraint bounds, null counts, bloom sidecars). A
  * `WHERE doc_id = 'x'` through the connector prunes directories before
  * Spark lists a file, exactly like the programmatic path. Unsupported
  * predicate shapes are simply not pushed (Spark re-applies every filter
  * on top, so pushdown is a pruning hint, never a correctness dependency).
  */
class GraftDataSource extends RelationProvider
    with CreatableRelationProvider with StreamSinkProvider
    with StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "format(\"graft\") requires a path: .load(root) / OPTIONS (path '…')"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = path(parameters)
    val t = GraftTable.forPath(spark, root)
    val cdf = parameters.get("readChangeFeed").exists(_.toBoolean)
    val history = parameters.get("history").exists(_.toBoolean)
    val detail = parameters.get("detail").exists(_.toBoolean)
    val versionAsOf = parameters.get("versionAsOf").map(_.toLong)
    val timestampAsOf = parameters.get("timestampAsOf").map(parseTsMs)
    require(Seq(cdf, history, detail, versionAsOf.isDefined,
      timestampAsOf.isDefined).count(identity) <= 1,
      "readChangeFeed / history / detail / versionAsOf / timestampAsOf " +
        "are mutually exclusive")
    (versionAsOf, timestampAsOf) match {
      case _ if cdf =>
        // Version and timestamp bounds compose like Delta's: a timestamp
        // resolves to its version on the adjusted clock, then the read is
        // version-bounded. Mixing both forms for one bound is refused.
        require(!(parameters.contains("startingVersion") &&
          parameters.contains("startingTimestamp")),
          "startingVersion and startingTimestamp are mutually exclusive")
        require(!(parameters.contains("endingVersion") &&
          parameters.contains("endingTimestamp")),
          "endingVersion and endingTimestamp are mutually exclusive")
        val from = parameters.get("startingVersion").map(_.toLong)
          .orElse(parameters.get("startingTimestamp")
            .map(s => t.changesStartVersionAt(parseTsMs(s))))
          .getOrElse(0L)
        val to = parameters.get("endingVersion").map(_.toLong)
          .orElse(parameters.get("endingTimestamp")
            .map(s => t.versionAsOf(parseTsMs(s))))
          .getOrElse(Long.MaxValue)
        new GraftRelation(sqlContext, t.readChanges(from, to), None)
      case _ if history => new GraftRelation(sqlContext, t.history(), None)
      case _ if detail => new GraftRelation(sqlContext, t.detail(), None)
      case (Some(v), _) => new GraftRelation(sqlContext, t.readVersion(v), None)
      case (_, Some(ms)) => new GraftRelation(sqlContext, t.readAsOf(ms), None)
      case _ =>
        // Head reads pin the CURRENT version at relation-creation time and
        // route every scan (pushed-filter or not) through that pinned
        // snapshot — a commit landing between planning and scan cannot make
        // one query mix versions. Data skipping still applies: the pushed
        // condition goes through whereVersion's dir-pruning scan.
        val v = t.version
        new GraftRelation(sqlContext, t.readVersion(v), Some((t, v)))
    }
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = path(parameters)
    val partitionBy = parameters.get("partitionBy")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    // Create-time clustering declaration (Delta's `.clusterBy(...)` writer
    // call): one metadata commit right after the CREATE — the same DSv1
    // option seam partitionBy rides.
    val clusterBy = parameters.get("clusterBy")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    def created(t: GraftTable): GraftTable = {
      if (clusterBy.nonEmpty) t.clusterBy(clusterBy)
      t
    }
    val exists = GraftTable.isTable(spark, root)
    mode match {
      case SaveMode.Append =>
        if (exists) GraftTable.forPath(spark, root).append(data)
        else created(GraftTable.create(spark, root, data, partitionBy))
      case SaveMode.Overwrite =>
        if (exists) GraftTable.forPath(spark, root).overwrite(data)
        else created(GraftTable.create(spark, root, data, partitionBy))
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graft table already exists at $root (mode ErrorIfExists)")
        else created(GraftTable.create(spark, root, data, partitionBy))
      case SaveMode.Ignore =>
        if (!exists) created(GraftTable.create(spark, root, data, partitionBy))
    }
    createRelation(sqlContext, parameters)
  }

  /** `writeStream.format("graft")` — the streaming sink (Delta's
    * `.writeStream.format("delta")`, reference spark_streaming.py's sink
    * calls). Append mode lands one APPEND commit per micro-batch through
    * the exactly-once txn-stamp path ([[GraftTable.appendOnce]]): a batch
    * replayed after a crash between commit and checkpoint is recognized by
    * its (appId, batchId) stamp and skipped. Complete mode overwrites the
    * snapshot per batch the same way. The stamp's appId is
    * `option("txnAppId", …)` when given, else the writer-option checkpoint
    * location, else the STREAMING QUERY ID read at addBatch time (what
    * Delta's DeltaSink stamps) — never the shared table root, which two
    * distinct queries writing one table (or one query restarted with a
    * fresh checkpoint set only via the session conf) would share, colliding
    * their (appId, batchId) stamps and silently skipping real batches.
    * Update mode needs a merge key — that is foreachBatch +
    * [[GraftTable.merge]] territory, refused here. */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode != OutputMode.Update(),
      "format(\"graft\") streaming sink supports Append and Complete modes; " +
        "Update needs a merge key — use foreachBatch with GraftTable.merge")
    val root = path(parameters)
    val ciParams = parameters.map { case (k, v) => k.toLowerCase -> v }
    val explicitAppId =
      ciParams.get("txnappid").orElse(ciParams.get("checkpointlocation"))
    new GraftSink(root, explicitAppId, partitionColumns,
      outputMode == OutputMode.Complete())
  }

  // `readStream.format("graft")` — same short name for the streaming READ
  // too (Delta parity): version-aware appends by default, the CDF stream
  // with option("readChangeFeed", true). Delegates to the dedicated
  // provider so both format strings share one Source implementation.
  private val streamProvider = new GraftTableSourceProvider

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), streamProvider.sourceSchema(sqlContext, schema,
      providerName, parameters)._2)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    streamProvider.createSource(sqlContext, metadataPath, schema,
      providerName, parameters)

  private def parseTsMs(s: String): Long =
    s.toLongOption.getOrElse {
      val norm = if (s.contains(" ") || s.contains("T")) s.replace(' ', 'T')
        else s + "T00:00:00"
      java.time.LocalDateTime.parse(norm)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }
}

/** One commit per micro-batch, exactly-once via (appId, batchId) stamps.
  * `explicitAppId` = txnAppId/checkpointLocation writer option when set;
  * otherwise the appId is the streaming query id, read per-batch from the
  * `StreamExecution.QUERY_ID_KEY` local property the stream runner sets on
  * its thread (stable across restarts of the same checkpoint — it is
  * persisted in checkpoint metadata — and distinct per query). */
class GraftSink(root: String, explicitAppId: Option[String],
    partitionColumns: Seq[String], complete: Boolean) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // `data` is the incremental-execution frame: its .write is refused, so
    // re-wrap the executed plan's InternalRow RDD as a batch DataFrame —
    // the standard sink technique (Delta's DeltaSink does exactly this).
    val spark = data.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val appId = explicitAppId.orElse(Option(spark.sparkContext.getLocalProperty(
      org.apache.spark.sql.execution.streaming.runtime.StreamExecution.QUERY_ID_KEY)))
      .getOrElse(root)
    val batch = spark.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
    val t =
      if (GraftTable.isTable(spark, root)) GraftTable.forPath(spark, root)
      else GraftTable.create(spark, root, batch.limit(0), partitionColumns)
    if (complete) t.overwriteOnce(batch, appId, batchId)
    else t.appendOnce(batch, appId, batchId)
    (): Unit
  }

  override def toString: String = s"GraftSink[$root]"
}

/** DSv1 relation whose scan delegates to the resolved snapshot DataFrame —
  * projection and (for head reads) predicate-driven dir skipping included.
  * `needConversion = false`: the scan hands back the query's own
  * InternalRow RDD, so no external-type round-trip is paid. */
class GraftRelation(val sqlContext: SQLContext, df: DataFrame,
    private[graftnative] val headTable: Option[(GraftTable, Long)])
    extends BaseRelation
    with PrunedFilteredScan with InsertableRelation {

  /** Declared column defaults surface as `CURRENT_DEFAULT` field metadata
    * so stock Spark's own ResolveDefaultColumns fills INSERTs that omit
    * the column (or say DEFAULT) — no custom insert path. Existing rows
    * are untouched: only the insert-resolution rule reads this key. */
  override def schema: StructType = {
    val defaults = headTable.map(_._1.columnDefaults).getOrElse(Map.empty)
    if (defaults.isEmpty) df.schema
    else StructType(df.schema.fields.map { f =>
      defaults.get(f.name) match {
        case Some(sql) => f.copy(metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata).putString("CURRENT_DEFAULT", sql).build())
        case None => f
      }
    })
  }
  override def needConversion: Boolean = false

  /** SQL `INSERT INTO` / `INSERT OVERWRITE` on a `USING graft` relation —
    * an APPEND / OVERWRITE commit on the head. Versioned and CDF
    * relations are read-only views of history. */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    val (t, _) = headTable.getOrElse(throw new UnsupportedOperationException(
      "cannot INSERT into a time-travel or change-feed read"))
    if (overwrite) t.overwrite(data) else t.append(data)
    (): Unit
  }

  // Head scans pin per EXECUTION, not per relation instance: a stored
  // relation (temp-view plan, catalog relation cache) would otherwise
  // serve its creation-time snapshot forever — `DELETE FROM t` followed
  // by `SELECT * FROM t` reading the pre-delete rows. Keyed on the SQL
  // execution id, every scan of one statement (self-joins, the pushed-
  // filter and no-filter paths) shares one version — a commit landing
  // mid-query still cannot mix versions — while the next statement
  // re-reads the head. Eviction is LRU of the OLDEST entry (executions
  // are short-lived, the eldest is long finished); a wholesale clear()
  // could drop an IN-FLIGHT execution's pin and let its later scans
  // re-pin to a newer head — the very version mixing this map prevents.
  private val execVersion =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, java.lang.Long](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.lang.Long]): Boolean = size > 256
      })

  private def pinnedVersion(t: GraftTable): Long = {
    val execId = sqlContext.sparkContext
      .getLocalProperty(org.apache.spark.sql.execution.SQLExecution.EXECUTION_ID_KEY)
    if (execId == null) t.version // lone scan outside an execution scope
    else execVersion.synchronized {
      val cur = execVersion.get(execId)
      if (cur != null) cur.longValue
      else { val v = t.version; execVersion.put(execId, v); v }
    }
  }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val cond = filters.flatMap(GraftRelation.translate)
      .reduceOption(_ && _)
    val base = (headTable, cond) match {
      // dir-skipping scan on the execution-pinned snapshot
      case (Some((t, _)), Some(c)) => t.whereVersion(pinnedVersion(t), c)
      case (Some((t, _)), None) => t.readVersion(pinnedVersion(t))
      case (_, Some(c)) => df.filter(c)
      case _ => df
    }
    // `needConversion = false` hands Spark the snapshot's InternalRows AS
    // the relation's declared schema: if a type CHANGED under a stored
    // relation (a widenColumnType after the temp view resolved), an int
    // read of a long slot would silently truncate — fail loudly instead.
    // Additive evolution stays fine (extra head columns are never
    // required); drops already fail at the select below.
    val stale = requiredColumns.filter(c =>
      base.schema.fields.find(_.name == c)
        .zip(schema.fields.find(_.name == c))
        .exists { case (h, d) => h.dataType != d.dataType })
    if (stale.nonEmpty)
      throw new IllegalStateException(
        s"column type changed under this relation (${stale.mkString(", ")}): " +
          "the table was widened after the view/plan was resolved — " +
          "re-create the temp view (or re-resolve the path read)")
    val pruned =
      if (requiredColumns.isEmpty) base.select() // count(*)-style scans
      else base.select(requiredColumns.map(c => col(s"`$c`")).toSeq: _*)
    pruned.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

object GraftRelation {
  /** sources.Filter → Column; None = shape not translated (not pushed —
    * Spark evaluates it on top, so this loses pruning, never rows). */
  private[graftnative] def translate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(s"`$a`") === v)
    case EqualNullSafe(a, v) => Some(col(s"`$a`") <=> v)
    case GreaterThan(a, v) => Some(col(s"`$a`") > v)
    case GreaterThanOrEqual(a, v) => Some(col(s"`$a`") >= v)
    case LessThan(a, v) => Some(col(s"`$a`") < v)
    case LessThanOrEqual(a, v) => Some(col(s"`$a`") <= v)
    case In(a, vs) => Some(col(s"`$a`").isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(s"`$a`").isNull)
    case IsNotNull(a) => Some(col(s"`$a`").isNotNull)
    case StringStartsWith(a, v) => Some(col(s"`$a`").startsWith(v))
    case StringEndsWith(a, v) => Some(col(s"`$a`").endsWith(v))
    case StringContains(a, v) => Some(col(s"`$a`").contains(v))
    case And(l, r) => for { lc <- translate(l); rc <- translate(r) } yield lc && rc
    // OR must translate whole-or-nothing: pushing one branch alone would
    // DROP rows of the other branch before Spark's re-application sees them
    case Or(l, r) => for { lc <- translate(l); rc <- translate(r) } yield lc || rc
    case Not(c) => translate(c).map(!_)
    case _ => None
  }
}
