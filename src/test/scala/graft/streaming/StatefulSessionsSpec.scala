package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("late event before the open session start does not merge into it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = StatefulSessions.sessionize(
      input.toDS().withWatermark("ts", "3 hours"), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("late_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(SessionEvent(1L, t("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // 2h earlier, inside the watermark: its own (immediately closed)
      // session, NOT an extension of the 10:00 session.
      input.addData(SessionEvent(1L, t("2024-01-01 08:00:00"), 5.0))
      q.processAllAvailable()
      val closed = spark.table("late_out").as[ClosedSession].collect()
      assert(closed.length === 1)
      assert(closed(0).session_start === t("2024-01-01 08:00:00"))
      assert(closed(0).session_events === 1L)
      // the open 10:00 session is untouched (closes later via timeout)
      input.addData(SessionEvent(2L, t("2024-01-01 20:00:00"), 0.0))
      q.processAllAvailable()
      input.addData(SessionEvent(2L, t("2024-01-01 21:00:00"), 0.0))
      q.processAllAvailable()
      val ten = spark.table("late_out").as[ClosedSession].collect()
        .filter(s => s.user_id == 1L && s.session_start == t("2024-01-01 10:00:00"))
      assert(ten.length === 1)
      assert(ten(0).session_events === 1L && ten(0).session_value === 1.0)
    } finally q.stop()
  }

  test("sessions close on in-batch gap and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val sessions = StatefulSessions.sessionize(
      input.toDS().withWatermark("ts", "10 minutes"), gapMs = 30L * 60 * 1000)
    val q = sessions.writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // Two events 5 min apart (one session), then an event 2 hours later:
      // the in-batch gap closes session 1 immediately.
      input.addData(
        SessionEvent(1L, t("2024-01-01 10:00:00"), 1.0),
        SessionEvent(1L, t("2024-01-01 10:05:00"), 2.0),
        SessionEvent(1L, t("2024-01-01 12:00:00"), 4.0))
      q.processAllAvailable()
      val first = spark.table("sessions_out").as[ClosedSession].collect()
      assert(first.length === 1)
      assert(first(0).session_start === t("2024-01-01 10:00:00"))
      assert(first(0).session_end === t("2024-01-01 10:05:00"))
      assert(first(0).session_events === 2L)
      assert(first(0).session_value === 3.0)

      // Advance the watermark far past 12:00 + gap → timeout closes the
      // open session without any new event for user 1.
      input.addData(SessionEvent(2L, t("2024-01-01 15:00:00"), 9.0))
      q.processAllAvailable()
      input.addData(SessionEvent(2L, t("2024-01-01 15:01:00"), 1.0))
      q.processAllAvailable()
      val all = spark.table("sessions_out").as[ClosedSession].collect()
      val u1 = all.filter(_.user_id == 1L)
      assert(u1.length === 2)
      val timedOut = u1.maxBy(_.session_start.getTime)
      assert(timedOut.session_start === t("2024-01-01 12:00:00"))
      assert(timedOut.session_events === 1L)
    } finally q.stop()
  }
}
