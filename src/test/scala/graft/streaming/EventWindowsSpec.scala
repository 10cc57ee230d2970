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

  test("hopping windows: each event lands in exactly two windows, streaming") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventWindows.hoppingEventStatsOf(input.toDF())
      .writeStream.format("memory").queryName("hop_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(Ev(t("2024-01-01 10:05:00"), "click", 1.5))
      q.processAllAvailable()
      val rows = spark.table("hop_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      def us(s: String) = t(s).getTime * 1000L
      assert(rows === Set(
        (us("2024-01-01 09:30:00"), "click", 1L, 1.5),
        (us("2024-01-01 10:00:00"), "click", 1L, 1.5)))
      // batch phrasing of the same row agrees exactly
      val batch = EventWindows.hoppingEventStatsOf(
        Seq(Ev(t("2024-01-01 10:05:00"), "click", 1.5)).toDF())
        .collect().map(r =>
          (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(batch === rows)
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

  test("stream-stream interval join pairs probes with in-window anchors") {
    implicit val sqlCtx = spark.sqlContext
    val probes = MemoryStream[JoinEv]
    val anchors = MemoryStream[JoinEv]
    val q = EventWindows.intervalJoin(probes.toDF(), anchors.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append()).start()
    try {
      anchors.addData(
        JoinEv(7L, t("2024-01-01 10:00:00"), 100L),
        JoinEv(8L, t("2024-01-01 10:00:00"), 101L))
      // probe in-window (10:30, same user), out-of-window (11:30), and
      // wrong-user (user 9) — arriving in a LATER batch than the anchors,
      // which is exactly what the join state buffer exists for.
      probes.addData(
        JoinEv(7L, t("2024-01-01 10:30:00"), 200L),
        JoinEv(7L, t("2024-01-01 11:30:00"), 201L),
        JoinEv(9L, t("2024-01-01 10:30:00"), 202L))
      q.processAllAvailable()
      val got = spark.table("ssj_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("probe_id"),
          r.getAs[Long]("anchor_id"))).toSet
      assert(got === Set((7L, 200L, 100L)))
    } finally q.stop()
  }

  test("LEFT OUTER interval join emits null-anchor rows once the watermark closes them") {
    implicit val sqlCtx = spark.sqlContext
    val probes = MemoryStream[JoinEv]
    val anchors = MemoryStream[JoinEv]
    val q = EventWindows.intervalJoinOuter(probes.toDF(), anchors.toDF(),
      "1 hour", "2 hours")
      .writeStream.format("memory").queryName("ssjo_out")
      .outputMode(OutputMode.Append()).start()
    try {
      anchors.addData(JoinEv(7L, t("2024-01-01 10:00:00"), 100L))
      probes.addData(
        JoinEv(7L, t("2024-01-01 10:30:00"), 200L), // matches anchor 100
        JoinEv(9L, t("2024-01-01 10:30:00"), 202L)) // no partner ever
      q.processAllAvailable()
      // the unmatched probe's null row is withheld until the watermark
      // proves no partner can arrive — advance both sides well past it
      anchors.addData(JoinEv(1L, t("2024-01-01 20:00:00"), 900L))
      probes.addData(JoinEv(1L, t("2024-01-01 20:00:00"), 901L))
      q.processAllAvailable()
      anchors.addData(JoinEv(1L, t("2024-01-02 08:00:00"), 910L))
      probes.addData(JoinEv(1L, t("2024-01-02 08:00:00"), 911L))
      q.processAllAvailable()
      val got = spark.table("ssjo_out").collect()
        .map(r => (r.getAs[Long]("probe_id"),
          Option(r.getAs[java.lang.Long]("anchor_id")))).toSet
      assert(got.contains((200L, Some(100L))))
      assert(got.contains((202L, None)), s"unmatched probe missing: $got")
    } finally q.stop()
    // batch phrasing of the same outer join emits the null row immediately
    val batch = EventWindows.intervalJoinOuter(
      Seq(JoinEv(9L, t("2024-01-01 10:30:00"), 202L)).toDF(),
      Seq(JoinEv(7L, t("2024-01-01 10:00:00"), 100L)).toDF())
      .collect().map(r => (r.getAs[Long]("probe_id"),
        Option(r.getAs[java.lang.Long]("anchor_id"))))
    assert(batch.toSeq === Seq((202L, None)))
  }

  test("interval join batch phrasing matches the q40 range-join semantics") {
    val probes = Seq(
      JoinEv(7L, t("2024-01-01 10:30:00"), 200L),
      JoinEv(7L, t("2024-01-01 10:00:00"), 201L), // boundary: p_ts == a_ts → match
      JoinEv(7L, t("2024-01-01 11:00:00"), 202L)  // boundary: p_ts == a_ts + 1h → no match
    ).toDF()
    val anchors = Seq(JoinEv(7L, t("2024-01-01 10:00:00"), 100L)).toDF()
    val got = EventWindows.intervalJoin(probes, anchors).collect()
      .map(r => r.getAs[Long]("probe_id")).toSet
    assert(got === Set(200L, 201L))
  }
}

final case class JoinEv(user_id: Long, ts: Timestamp, event_id: Long)
