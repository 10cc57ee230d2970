package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe distinct aggregation by salting (the aggregation-side
  * companion of [[SaltedJoin]]).
  *
  * `count(DISTINCT v)` by a low-cardinality key shuffles every (key, v)
  * pair to one reducer per key — with 5 keys over 100 TB, 5 reducers do
  * all the work. Salting derives a fan-out key FROM THE VALUE
  * (`pmod(hash(v), salts)`), so each of the key's `salts` sub-groups
  * holds a disjoint slice of the value space: per-slice distinct counts
  * are exact and their SUM is the exact global distinct count. Two
  * ordinary hash aggregates, each with `key×salts` parallelism, same
  * answer. (Value-derived salt is what makes the counts addable —
  * a random salt would double-count values straddling salts.)
  */
object SaltedAgg {

  def saltedCountDistinct(df: DataFrame, groupCols: Seq[String], value: Column,
      resultName: String, salts: Int = 16): DataFrame = {
    val keyCols = groupCols.map(col)
    df
      .withColumn("__salt", pmod(hash(value), lit(salts)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(countDistinct(value).as("__partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__partial")).as(resultName))
  }
}
