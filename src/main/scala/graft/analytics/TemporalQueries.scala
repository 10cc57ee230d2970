package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.analytics.Views.moneySum
import graft.operators.{AsOfJoin, RangeJoin}

/** Temporal operators as driver queries. */
object TemporalQueries {

  /** As-of join: each event picks up the user's latest order-day stats at
    * or before the event time. Right side is pre-aggregated to one row per
    * (customer, day) so the match is unique — the determinism requirement
    * any ASOF engine shares. Oracle: DuckDB's native ASOF LEFT JOIN. */
  def asofOrderStats(spark: SparkSession, dir: String): DataFrame = {
    val dayOrders = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(
        count(lit(1)).as("day_orders"),
        moneySum(col("o_totalprice")).as("day_total"))
    val ev = Tables.events(spark, dir).select("event_id", "user_id", "ts")
    AsOfJoin.leftAsOf(ev, dayOrders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate")
      .select(
        col("event_id"), col("user_id"), col("ts"),
        col("o_orderdate").as("matched_date"),
        col("day_orders"), col("day_total"))
  }

  /** Range join: every event of a user within one hour after one of that
    * user's error events — point-in-interval containment bucketized to an
    * equi-join ([[RangeJoin]]). Oracle: the plain inequality join in DuckDB. */
  def eventsNearErrors(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val points = ev.select(
      col("event_id").as("probe_id"), col("user_id"), col("ts"))
    val ranges = ev.filter(col("event_type") === "error").select(
      col("event_id").as("anchor_id"),
      col("user_id").as("r_user"),
      col("ts").as("win_start"),
      (col("ts") + expr("INTERVAL 1 HOUR")).as("win_end"))
    RangeJoin.pointInRange(points, ranges,
        pointKey = "user_id", rangeKey = "r_user",
        timeCol = "ts", startCol = "win_start", endCol = "win_end",
        bucketMs = 3600L * 1000)
      .select("probe_id", "anchor_id")
  }
}
