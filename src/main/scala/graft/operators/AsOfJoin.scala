package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) left join: for every left row, the single right
  * row with the same key and the greatest right-time ≤ left-time.
  *
  * Beyond-reference operator (builder prompt's custom-operator list; the
  * reference has no temporal joins). Spark has no native ASOF JOIN, and a
  * naive phrasing — range-join then row_number per left row — explodes to
  * |L|×|matching R| intermediate rows. This implementation is the
  * union-and-carry-forward formulation: tag both sides, union, and in one
  * window pass per key carry the latest right values forward into each left
  * row. ONE shuffle on the key, no row blowup, no driver work — the plan
  * you want at 100 TB. Skewed keys cost what any windowed op costs; salt
  * upstream if a single key dominates.
  *
  * Requirements: `right` has at most one row per (key, time) — pre-aggregate
  * otherwise (ties would be nondeterministic in any engine).
  */
object AsOfJoin {

  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String): DataFrame = {
    val rightValueCols = right.columns.filterNot(_ == rightKey).toSeq

    val lTagged = left.select(
      Seq(col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
        struct(left.columns.map(col).toSeq: _*).as("__l")) ++
        rightValueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right.select(
      Seq(col(rightKey).as("__k"),
        col(rightTime).cast(left.schema(leftTime).dataType).as("__t"),
        lit(0).as("__side"), lit(null).cast(lTagged.schema("__l").dataType).as("__l")) ++
        rightValueCols.map(col): _*)

    // Right rows sort before left rows at equal time (__side 0 < 1), so a
    // right row stamped exactly at the left time is visible — `<=` semantics.
    val w = Window.partitionBy("__k").orderBy("__t", "__side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightValueCols.foldLeft(lTagged.unionByName(rTagged)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(col("__l.*") +: rightValueCols.map(col): _*)
  }
}
