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

  /** q178: HOPPING (sliding) windows — `window(ts, '1 hour' every
    * '30 minutes')`, the other windowed-aggregation shape Structured
    * Streaming serves (tumbling is q32, sessions q36). Each event lands
    * in exactly width/slide = 2 windows; Spark's `window()` explodes
    * per-row, so the plan is one scan + one hash-agg at 2× row fan-out —
    * no self-join, no range join, identical shape streaming or batch.
    * Output keys on epoch-micros of the window start: integer-exact on
    * both engines (the DuckDB oracle derives the two starts per event by
    * 30-minute epoch bucketing — Spark's window origin is the unix epoch,
    * a multiple of every slide, so the alignments agree). */
  def hoppingEventStats(spark: SparkSession, dir: String): DataFrame =
    hoppingEventStatsOf(Tables.events(spark, dir))

  /** Input-generic hopping form — batch or stream (streams add the
    * watermark so closed windows' state drops; each event holds state in
    * exactly 2 concurrent windows, so memory is 2× the tumbling case,
    * never unbounded). */
  def hoppingEventStatsOf(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(org.apache.spark.sql.functions
          .window(col("ts"), "1 hour", "30 minutes"),
        col("event_type"))
      .agg(
        count(lit(1)).as("event_count"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("event_count"), col("total_value"))
  }

  /** Stream-stream interval join — the streaming face of the batch range
    * join ([[graft.analytics.TemporalQueries.eventsNearErrors]]): each
    * probe event pairs with anchor events of the same user whose timestamp
    * lies in (probe.ts − maxLag, probe.ts]. BOTH sides carry watermarks and
    * the join condition bounds event-time distance, so Spark can expire
    * buffered rows once no future partner can match — without both, join
    * state grows without bound at stream scale. Inputs need
    * `user_id, ts, event_id` (+ `event_type` on the anchor side upstream).
    * Works identically on batch frames (watermark is a no-op there). */
  def intervalJoin(probes: DataFrame, anchors: DataFrame,
      maxLag: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    intervalJoinOf(probes, anchors, maxLag, watermark, "inner")

  /** LEFT OUTER stream-stream interval join: every probe survives; one
    * with no same-user anchor in (p_ts − maxLag, p_ts] emits NULL anchor
    * columns. The outer semantics are WATERMARK-DRIVEN in streams: the
    * null row for an unmatched probe can only be emitted once the
    * anchor-side watermark proves no partner can still arrive, so
    * results trail the watermark by design (Spark's outer-join contract)
    * — while a batch run of the same plan emits nulls immediately. State
    * stays bounded for exactly the inner join's reason: both sides carry
    * watermarks and the condition bounds event-time distance. */
  def intervalJoinOuter(probes: DataFrame, anchors: DataFrame,
      maxLag: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    intervalJoinOf(probes, anchors, maxLag, watermark, "left_outer")

  private def intervalJoinOf(probes: DataFrame, anchors: DataFrame,
      maxLag: String, watermark: String, joinType: String): DataFrame = {
    val p0 = probes.select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("probe_id"))
    val a0 = anchors.select(col("user_id"), col("ts").as("a_ts"), col("event_id").as("anchor_id"))
    val p = if (p0.isStreaming) p0.withWatermark("p_ts", watermark) else p0
    val a = if (a0.isStreaming) a0.withWatermark("a_ts", watermark) else a0
    p.join(a,
      p("user_id") === a("user_id") &&
        a("a_ts") <= p("p_ts") &&
        a("a_ts") > p("p_ts") - expr(s"INTERVAL $maxLag"),
      joinType)
      .select(p("user_id"), col("probe_id"), col("anchor_id"),
        col("p_ts"), col("a_ts"))
  }
}
