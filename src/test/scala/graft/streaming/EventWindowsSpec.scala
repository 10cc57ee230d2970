package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

final case class Ev(ts: Timestamp, event_type: String, value: Double)

class EventWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("windowedEventStats aggregates tumbling windows over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventWindows.windowedEventStats(input.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Ev(t("2024-01-01 10:05:00"), "click", 1.0),
        Ev(t("2024-01-01 10:55:00"), "click", 2.0),
        Ev(t("2024-01-01 11:05:00"), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)))
      assert(rows.contains(("2024-01-01 11:00:00.0", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped from closed windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventWindows.windowedEventStats(input.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_late")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(Ev(t("2024-01-01 10:05:00"), "click", 1.0))
      q.processAllAvailable()
      // Advance event time far past the 10:00 window + watermark…
      input.addData(Ev(t("2024-01-01 12:00:00"), "click", 1.0))
      q.processAllAvailable()
      // …then a very late event for the 10:00 window: must be ignored.
      input.addData(Ev(t("2024-01-01 10:10:00"), "click", 100.0))
      q.processAllAvailable()
      val tenOclock = spark.table("win_late").collect()
        .filter(_.getTimestamp(0).toString.startsWith("2024-01-01 10:00"))
        .map(r => (r.getLong(2), r.getDouble(3)))
      assert(tenOclock.forall { case (c, v) => c == 1L && v == 1.0 })
    } finally q.stop()
  }

  test("batch phrasing equals streaming phrasing on the same data") {
    val batch = Seq(
      Ev(t("2024-01-01 10:05:00"), "click", 1.0),
      Ev(t("2024-01-01 10:55:00"), "click", 2.0),
      Ev(t("2024-01-01 11:05:00"), "view", 5.0)).toDF()
    val out = EventWindows.windowedEventStats(batch).collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out === Set(
      ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 11:00:00.0", "view", 1L, 5.0)))
  }
}
