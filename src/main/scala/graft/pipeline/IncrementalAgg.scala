package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.table.GraftTable

/** Declarative incremental maintenance of ADDITIVE group-by aggregates from
  * Change-Data-Feed rows — the generalized form of the per-MV maintainers
  * (ROADMAP #4): callers declare (group keys, additive sums) once and both
  * the signed-delta computation and the state merge come from here.
  *
  * Additivity is the contract: every maintained aggregate must be a sum
  * (counts are sums of ±1; averages are derived at publish time from
  * sum/count — the standard decomposition). insert/update_postimage rows
  * contribute +, delete/update_preimage rows contribute −, so work per
  * refresh is O(changed rows) regardless of table size, and batches may
  * split or coalesce commits without changing the result.
  */
object IncrementalAgg {

  /** One additive aggregate: state/output column name, the value expression
    * over change rows, and the exact state type (sums widen — the state
    * column is cast back so repeated folds stay closed over the type). */
  final case class Sum(name: String, value: Column, dataType: DataType)

  /** @param groupKeys output name → key expression over change rows
    * @param countCol  name of the signed row-count column in the state
    * @param sums      additive aggregates beyond the count */
  final case class Spec(
      groupKeys: Seq[(String, Column)],
      countCol: String,
      sums: Seq[Sum])

  /** Per-group signed deltas of one CDF micro-batch (groups with all-zero
    * deltas dropped — they cannot change state). */
  def signedDeltas(changes: DataFrame, spec: Spec): DataFrame = {
    val signed = changes
      .filter(col("_change_type").isin(
        "insert", "delete", "update_preimage", "update_postimage"))
      .withColumn("__sign",
        when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L))
    val keyCols = spec.groupKeys.map { case (n, e) => e.as(n) }
    val aggs = sum(col("__sign")).as("__d_count") +:
      spec.sums.map(s => sum(col("__sign") * s.value).cast(s.dataType).as(s"__d_${s.name}"))
    val nonZero = (col("__d_count") =!= 0) +:
      spec.sums.map(s => col(s"__d_${s.name}") =!= 0)
    signed.groupBy(keyCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(nonZero.reduce(_ || _))
  }

  /** Fold one micro-batch of CDF rows into the MV state table: full-outer
    * merge of current state with the deltas on the (null-safe) group keys,
    * counts and sums added, groups whose count reaches zero deleted. With
    * `txn` the publish is stamped (queryName, batchId) via
    * [[GraftTable.overwriteOnce]], so an at-least-once foreachBatch replay
    * is detected and skipped — deltas are not idempotent. */
  def applyChanges(
      mv: GraftTable,
      changes: DataFrame,
      spec: Spec,
      txn: Option[(String, Long)] = None): Unit = {
    val deltas = signedDeltas(changes, spec)
    val keyNames = spec.groupKeys.map(_._1)
    val cur = mv.read().select(
      keyNames.map(col) ++
        Seq(col(spec.countCol)) ++
        spec.sums.map(s => col(s.name).cast(s.dataType).as(s.name)): _*)
    val joinCond = keyNames.map(k => col(s"m.$k") <=> col(s"d.$k")).reduce(_ && _)
    val merged = cur.alias("m").join(deltas.alias("d"), joinCond, "full_outer")
      .select(
        keyNames.map(k => coalesce(col(s"m.$k"), col(s"d.$k")).as(k)) ++
          Seq((coalesce(col(s"m.${spec.countCol}"), lit(0L))
            + coalesce(col("d.__d_count"), lit(0L))).as(spec.countCol)) ++
          spec.sums.map { s =>
            (coalesce(col(s"m.${s.name}"), lit(0).cast(s.dataType))
              + coalesce(col(s"d.__d_${s.name}"), lit(0).cast(s.dataType)))
              .cast(s.dataType).as(s.name)
          }: _*)
      .filter(col(spec.countCol) > 0)
    txn match {
      case Some((appId, batchId)) => mv.overwriteOnce(merged, appId, batchId)
      case None => mv.overwrite(merged)
    }
    ()
  }
}
