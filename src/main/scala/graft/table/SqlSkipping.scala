package graft.table

/** Session-level registry behind [[GraftTable.view]]: qualified table root
  * → (table, the snapshot commit the view was built from). The injected
  * optimizer rule (`org.apache.spark.sql.graftnative.GraftScanSkipping`)
  * consults it to map a scan relation's file paths back to the table
  * whose commit metadata can prune them. Registration pins the COMMIT,
  * not the head — the pruning metadata always matches the dirs the view's
  * plan actually references, even after the table advances. */
object SqlSkipping {
  final case class Entry(table: GraftTable, commit: Commit)

  // One entry per registered SNAPSHOT — a table can have several views
  // alive at once (head + versionAsOf time-travel views); the rule
  // disambiguates by which commit's dataDirs cover the scan's paths.
  private val byRoot =
    scala.collection.concurrent.TrieMap.empty[String, Map[Long, Entry]]

  private[table] def register(qualifiedRoot: String, t: GraftTable, c: Commit): Unit =
    byRoot.updateWith(qualifiedRoot) { cur =>
      Some(cur.getOrElse(Map.empty) + (c.version -> Entry(t, c)))
    }

  /** Drop EVERY snapshot registration of the root (views are ephemeral
    * session state; per-version bookkeeping isn't worth the API). */
  private[table] def unregister(qualifiedRoot: String): Unit =
    byRoot.remove(qualifiedRoot)

  /** Release every registration (e.g. between test suites or on session
    * teardown) — entries strongly reference their tables. */
  def clear(): Unit = byRoot.clear()

  def lookup(qualifiedRoot: String): Seq[Entry] =
    byRoot.get(qualifiedRoot).map(_.values.toSeq).getOrElse(Nil)

  /** Package-bridging seam for the optimizer rule (which lives in the
    * Spark-internal package tree): prune `paths` for `entry` under the
    * query's filter condition. None = not this snapshot's plain scan. */
  def prune(
      entry: Entry,
      cond: org.apache.spark.sql.catalyst.expressions.Expression,
      paths: Seq[org.apache.hadoop.fs.Path]): Option[Seq[org.apache.hadoop.fs.Path]] =
    entry.table.prunePaths(entry.commit, cond, paths)

  def isEmpty: Boolean = byRoot.isEmpty

  /** Bridge for the metadata-only aggregate rule: the exact COUNT(*)
    * (`colName = None`) or COUNT(col) over the rows under `paths`,
    * answered purely from `entry`'s commit bookkeeping. None = the
    * metadata can't answer exactly (foreign path, missing row count,
    * unknown null count, partition/nested column, merge-on-read state) —
    * the caller leaves the plan alone. */
  def metadataCount(
      entry: Entry,
      colName: Option[String],
      paths: Seq[org.apache.hadoop.fs.Path]): Option[Long] =
    entry.table.metadataCountForPaths(entry.commit, colName, paths)

  /** Exact MIN/MAX of `colName` under `paths` from commit metadata, in
    * Catalyst internal form. None = not provably exact (caller scans);
    * Some(None) = provably no values (SQL NULL). */
  def metadataExtreme(
      entry: Entry,
      colName: String,
      isMin: Boolean,
      paths: Seq[org.apache.hadoop.fs.Path]): Option[Option[Any]] =
    entry.table.metadataExtremeForPaths(entry.commit, colName, isMin, paths)
}
