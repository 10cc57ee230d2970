package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Approximate aggregates must track the exact answers within their
  * configured error bounds on the driver corpus. */
class ApproxStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("HLL distinct and quantile sketches stay within error bounds") {
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val approx = OlapQueries.approxStats(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("users"),
        expr("percentile(value, 0.5)").as("median"),
        expr("percentile(value, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, (users, median, p95)) =>
      val (aU, aM, aP) = approx(k)
      // rsd 0.02 → generous 10% envelope; quantile sketch accuracy 1/10000
      assert(math.abs(aU - users).toDouble / users < 0.10, s"$k users: $aU vs $users")
      assert(math.abs(aM - median) / math.max(math.abs(median), 1e-9) < 0.05,
        s"$k median: $aM vs $median")
      assert(math.abs(aP - p95) / math.max(math.abs(p95), 1e-9) < 0.05,
        s"$k p95: $aP vs $p95")
    }
  }
}
