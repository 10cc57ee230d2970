package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.table.GraftTable

/** Slowly-Changing-Dimension Type 2 maintenance — the standard shape a CDC
  * consumer gives a dimension table when history must be queryable ("what
  * was this customer's segment when the order shipped?"). The reference
  * pipeline lands Debezium upserts as overwrite-latest state
  * (consumer/python-consumer/delta_handler.py:152-236, the MERGE path);
  * SCD2 is the history-preserving variant of that same merge: instead of
  * updating a matched row in place, the current row is CLOSED (validity
  * interval end-stamped, current flag dropped) and a new current row opens.
  *
  * Row layout: business columns plus the three bookkeeping columns
  * [[Scd2.ValidFrom]] / [[Scd2.ValidTo]] (null = still open) /
  * [[Scd2.IsCurrent]]. All dimension history lives in ONE table — point-in-
  * time lookup is `valid_from <= t AND (valid_to > t OR valid_to IS NULL)`,
  * which composes with an as-of join ([[graft.operators.AsOfJoin]]) for
  * fact enrichment.
  *
  * Scale shape: one key-partitioned full-outer join between the CURRENT
  * slice and the (deduped-to-latest) change batch; closed history rows are
  * carried by union, untouched — no shuffle ever visits them. At 100 TB the
  * current slice is the small side (one row per live key) and AQE
  * broadcasts the change batch when it is batch-sized. The per-key branch
  * logic emits 0–2 rows via an exploded when-array, exactly the CDF-image
  * technique [[graft.table.GraftTable.merge]] uses, so the whole update is
  * a single codegen'd pass over the join.
  */
object Scd2 {
  val ValidFrom = "_valid_from"
  val ValidTo = "_valid_to"
  val IsCurrent = "_is_current"

  private def nullTs: Column = lit(null).cast("timestamp")

  /** Initial load: every row becomes an open current version effective at
    * `effectiveFrom`. */
  def init(df: DataFrame, effectiveFrom: Column): DataFrame =
    df.withColumn(ValidFrom, effectiveFrom.cast("timestamp"))
      .withColumn(ValidTo, nullTs)
      .withColumn(IsCurrent, lit(true))

  /** Apply one change batch to an SCD2 dimension.
    *
    * Per change row keyed by `key` (the batch must be unique per key —
    * dedupe upstream CDC to latest-per-key first, exactly as
    * [[graft.table.GraftTable.merge]] requires):
    *  - key unseen → INSERT an open version effective at `effectiveFrom`;
    *  - key current & any compared attribute differs (null-safely) → CLOSE
    *    the current version at `effectiveFrom` and open a new one;
    *  - key current & nothing differs → no-op (no spurious versions);
    *  - `deleteCol` true → CLOSE the current version, open nothing (the
    *    CDC tombstone: the entity ended, its history stays queryable);
    *  - dimension keys absent from the batch ride through untouched.
    *
    * `compareIgnore` lists volatile attributes (processing timestamps…)
    * that must not open new versions on their own. */
  def apply(dim: DataFrame, changes: DataFrame, key: String,
      effectiveFrom: Column, deleteCol: Option[String] = None,
      compareIgnore: Seq[String] = Nil): DataFrame = {
    val (joined, history, branches) =
      plan(dim, changes, key, effectiveFrom, deleteCol, compareIgnore)
    import branches._
    // Unmatched branches fall through to null, which explode drops: a
    // delete of a key that was never current emits nothing.
    val out = when(isDelete, array(tClosed))
      .when(isUpdate, array(tClosed, sOpen))
      .when(tPresent && sPresent, array(tAsIs))
      .when(tPresent, array(tAsIs))
      .when(isInsert, array(sOpen))
    val updated = joined.select(explode(out).as("r")).select("r.*")
    history.unionByName(updated)
  }

  /** Only the rows [[apply]] would CHANGE OR ADD — closed versions, opened
    * versions, inserts; nothing for carried-through keys. This is the
    * incremental-maintenance form: merge the delta into a stored dimension
    * keyed by (key, valid_from) instead of rewriting the table, so a batch
    * costs O(changed rows), not O(history). */
  def delta(dim: DataFrame, changes: DataFrame, key: String,
      effectiveFrom: Column, deleteCol: Option[String] = None,
      compareIgnore: Seq[String] = Nil): DataFrame = {
    val (joined, _, branches) =
      plan(dim, changes, key, effectiveFrom, deleteCol, compareIgnore)
    import branches._
    val out = when(isDelete, array(tClosed))
      .when(isUpdate, array(tClosed, sOpen))
      .when(isInsert, array(sOpen))
    joined.select(explode(out).as("r")).select("r.*")
  }

  /** Surrogate merge key of a version row — (business key, valid_from
    * micros) rendered as one string, the unit a stored SCD2 table upserts
    * on: closing a version UPDATES its row, opening one INSERTS. */
  val MergeKey = "_scd2_key"

  private def mergeKeyCol(key: String): Column =
    concat_ws("|", col(key).cast("string"),
      unix_micros(col(ValidFrom)).cast("string"))

  /** Create the stored form of an SCD2 dimension: [[init]] versions plus
    * the [[MergeKey]] column every later [[maintain]] merge matches on. */
  def initTable(spark: org.apache.spark.sql.SparkSession, root: String,
      df: DataFrame, key: String, effectiveFrom: Column): GraftTable =
    GraftTable.create(spark, root,
      init(df, effectiveFrom).withColumn(MergeKey, mergeKeyCol(key)))

  /** Apply one change batch to a STORED SCD2 dimension ([[initTable]]'s
    * [[GraftTable]]) incrementally: [[delta]] rows merged on [[MergeKey]].
    * A batch costs O(changed rows) — history is never rewritten. Replaying
    * the same batch is a value-level no-op (`changedOnly` merge semantics +
    * a deterministic event-time `effectiveFrom`), so at-least-once
    * foreachBatch delivery composes without txn bookkeeping — the
    * streaming CDC→dimension-history sink. */
  def maintain(table: GraftTable, changes: DataFrame, key: String,
      effectiveFrom: Column, deleteCol: Option[String] = None,
      compareIgnore: Seq[String] = Nil): Unit = {
    require(table.read().columns.contains(MergeKey),
      s"SCD2 maintenance needs the $MergeKey column — create the table " +
        "with Scd2.initTable")
    val dim = table.read().drop(MergeKey)
    val d = delta(dim, changes, key, effectiveFrom, deleteCol, compareIgnore)
      .withColumn(MergeKey, mergeKeyCol(key))
    table.merge(d, MergeKey)
    (): Unit
  }

  /** Shared join plumbing of [[apply]]/[[delta]]. */
  private case class Branches(tPresent: Column, sPresent: Column,
      isUpdate: Column, isInsert: Column, isDelete: Column,
      tAsIs: Column, tClosed: Column, sOpen: Column)

  private def plan(dim: DataFrame, changes: DataFrame, key: String,
      effectiveFrom: Column, deleteCol: Option[String],
      compareIgnore: Seq[String]): (DataFrame, DataFrame, Branches) = {
    val attrCols = dim.columns.toSeq
      .filterNot(c => c == key || c == ValidFrom || c == ValidTo || c == IsCurrent)
    val missing = attrCols.filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"SCD2 change batch lacks dimension attributes: ${missing.mkString(", ")}")

    val history = dim.filter(!col(IsCurrent))
    val current = dim.filter(col(IsCurrent)).alias("t")
    val ch = changes
      .withColumn("__eff", effectiveFrom.cast("timestamp"))
      .withColumn("__del",
        deleteCol.map(c => coalesce(col(c), lit(false))).getOrElse(lit(false)))
      .alias("s")

    val joined = current.join(ch, col(s"t.$key") === col(s"s.$key"), "full_outer")
    val tPresent = col(s"t.$key").isNotNull
    val sPresent = col(s"s.$key").isNotNull
    // Monotonicity guard: CDC event times are often millisecond-resolution,
    // so consecutive batches can carry the SAME effectiveFrom for one key.
    // Closing the current version at (or before) its own valid_from would
    // emit a closed row and a new open row sharing (key, valid_from) — a
    // non-unique [[MergeKey]] (nondeterministic upsert in [[maintain]])
    // plus a zero/negative-length version. Clamp the effective instant to
    // strictly after the current version's start (1 µs past it).
    val eff = when(tPresent && col("s.__eff") <= col(s"t.$ValidFrom"),
      col(s"t.$ValidFrom") + expr("INTERVAL 1 MICROSECOND"))
      .otherwise(col("s.__eff"))
    val changed = attrCols.filterNot(compareIgnore.contains)
      .map(c => !(col(s"t.$c") <=> col(s"s.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))

    def row(side: String, vf: Column, vt: Column, cur: Column): Column = struct(
      Seq(col(s"$side.$key").as(key)) ++
        attrCols.map(c => col(s"$side.$c").as(c)) ++
        Seq(vf.as(ValidFrom), vt.as(ValidTo), cur.as(IsCurrent)): _*)

    (joined, history, Branches(
      tPresent = tPresent,
      sPresent = sPresent,
      isUpdate = tPresent && sPresent && !col("s.__del") && changed,
      isInsert = !tPresent && sPresent && !col("s.__del"),
      isDelete = tPresent && sPresent && col("s.__del"),
      tAsIs = row("t", col(s"t.$ValidFrom"), col(s"t.$ValidTo"), col(s"t.$IsCurrent")),
      tClosed = row("t", col(s"t.$ValidFrom"), eff, lit(false)),
      sOpen = row("s", eff, nullTs, lit(true))))
  }
}
