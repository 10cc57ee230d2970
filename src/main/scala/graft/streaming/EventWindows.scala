package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables

/** Event-time windowed aggregation — the idiomatic upgrade path the
  * reference leaves open (SURVEY ST11: no watermarks/windows anywhere, MVs
  * recomputed instead). Same query works batch and streaming; the streaming
  * form adds a watermark so state for closed windows is dropped — the thing
  * that makes a 100 TB/day stream aggregation bounded-memory.
  */
object EventWindows {

  /** Streaming (or batch) tumbling-window stats per event_type. Input needs
    * `ts: Timestamp`, `event_type: String`, `value: Double`. */
  def windowedEventStats(events: DataFrame, window: String = "1 hour",
      watermark: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(
        count(lit(1)).as("event_count"),
        // Exact decimal sum → double: order-independent, engine-portable.
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("event_count"), col("total_value"))
  }

  /** Batch phrasing over the testdata events table (driver query). Tumbling
    * 1-hour windows align with date_trunc('hour') — the DuckDB oracle. */
  def hourlyEventStats(spark: SparkSession, dir: String): DataFrame =
    windowedEventStats(Tables.events(spark, dir))
}
