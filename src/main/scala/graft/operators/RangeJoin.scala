package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join, bucketized into an equi-join.
  *
  * Beyond-reference operator (builder prompt's custom-operator list). The
  * naive phrasing — `points JOIN ranges ON key equal AND t BETWEEN s AND e`
  * — plans as a broadcast-nested-loop or a sort-merge over the key with a
  * residual range scan per key group; for hot keys that is quadratic. Here
  * time is diced into fixed buckets: each interval row is replicated into
  * every bucket it overlaps, each point belongs to exactly one bucket, and
  * the join becomes a plain hash-shuffle equi-join on (key, bucket) with
  * the containment predicate as a residual filter.
  *
  * Pick `bucketMs` near the typical interval width: replication factor is
  * `ceil(width / bucketMs) + 1`, and a bucket only holds co-keyed activity
  * from the same time slice, so skew stays bounded.
  *
  * Column names of `points` and `ranges` must be disjoint (pre-alias).
  */
object RangeJoin {

  /** [[pointInRange]] with `bucketMs` derived from the MEASURED interval
    * widths — the knob follows the data the way ANN probe geometry follows
    * index statistics, instead of being re-tuned by hand per dataset. The
    * median width keeps the replication factor at ~2–3 for any unimodal
    * width distribution; one small planning aggregate over the ranges side
    * computes it (at extreme scale, run it over a deterministic sample —
    * the knob only shapes the plan, never the result). */
  def pointInRangeAuto(
      points: DataFrame,
      ranges: DataFrame,
      pointKey: String,
      rangeKey: String,
      timeCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    val row = ranges
      .select(percentile_approx(
        expr(s"unix_millis($endCol) - unix_millis($startCol)"),
        lit(0.5), lit(10000)).as("w"))
      .head()
    // Empty ranges (or all-null bounds) → percentile_approx yields NULL;
    // degrade to a 1-hour bucket instead of an NPE — the join is then
    // trivially empty whatever the bucketing.
    val width = if (row.isNullAt(0)) 3600000L else row.getLong(0)
    pointInRange(points, ranges, pointKey, rangeKey, timeCol, startCol, endCol,
      bucketMs = math.max(1L, width))
  }

  def pointInRange(
      points: DataFrame,
      ranges: DataFrame,
      pointKey: String,
      rangeKey: String,
      timeCol: String,
      startCol: String,
      endCol: String, // exclusive
      bucketMs: Long): DataFrame = {
    val p = points.withColumn("__b", expr(s"unix_millis($timeCol) div $bucketMs"))
    val r = ranges.withColumn("__bs", expr(s"unix_millis($startCol) div $bucketMs"))
      .withColumn("__be", expr(s"(unix_millis($endCol) - 1) div $bucketMs"))
      .filter(col("__be") >= col("__bs"))
      .withColumn("__b", explode(sequence(col("__bs"), col("__be"))))
      .drop("__bs", "__be")
    p.join(r, p(pointKey) === r(rangeKey) && p("__b") === r("__b"))
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("__b")
  }
}
