package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("leftAsOf picks the latest right row at or before each left time") {
    val quotes = Seq(
      ("A", t("2024-01-01 10:00:00"), 100.0),
      ("A", t("2024-01-01 10:05:00"), 101.0),
      ("A", t("2024-01-01 10:10:00"), 99.0),
      ("B", t("2024-01-01 10:02:00"), 50.0)
    ).toDF("sym", "qt", "price")
    val trades = Seq(
      (1L, "A", t("2024-01-01 10:03:00")), // → 10:00 quote
      (2L, "A", t("2024-01-01 10:05:00")), // → 10:05 quote (<= inclusive)
      (3L, "A", t("2024-01-01 11:00:00")), // → 10:10 quote
      (4L, "B", t("2024-01-01 10:00:00")), // → no match
      (5L, "C", t("2024-01-01 10:00:00"))  // key absent on right
    ).toDF("trade_id", "sym", "tt")

    val out = AsOfJoin.leftAsOf(trades, quotes, "sym", "sym", "tt", "qt")
      .orderBy("trade_id").collect()
    assert(out.length === 5)
    assert(out(0).getAs[Double]("price") === 100.0)
    assert(out(1).getAs[Double]("price") === 101.0)
    assert(out(2).getAs[Double]("price") === 99.0)
    assert(out(3).isNullAt(out(3).fieldIndex("price")))
    assert(out(4).isNullAt(out(4).fieldIndex("price")))
    // matched right time is carried through
    assert(out(2).getAs[Timestamp]("qt") === t("2024-01-01 10:10:00"))
    // left columns intact
    assert(out.map(_.getAs[String]("sym")).toSeq === Seq("A", "A", "A", "B", "C"))
  }

  test("matched right row is taken atomically — nulls preserved, no mixing") {
    // Right rows interleave nulls across value columns: carrying columns
    // independently would smear bid from one row and ask from another, and
    // would resurrect a stale non-null over a legitimate null.
    val quotes = Seq(
      ("A", t("2024-01-01 10:00:00"), Option(100.0), Option(101.0)),
      ("A", t("2024-01-01 10:05:00"), Option.empty[Double], Option(102.0)),
      ("A", t("2024-01-01 10:10:00"), Option(99.0), Option.empty[Double])
    ).toDF("sym", "qt", "bid", "ask")
    val trades = Seq(
      (1L, "A", t("2024-01-01 10:06:00")), // → 10:05 row: bid null, ask 102
      (2L, "A", t("2024-01-01 10:11:00"))  // → 10:10 row: bid 99, ask null
    ).toDF("trade_id", "sym", "tt")

    val out = AsOfJoin.leftAsOf(trades, quotes, "sym", "sym", "tt", "qt")
      .orderBy("trade_id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("bid")))
    assert(out(0).getAs[Double]("ask") === 102.0)
    assert(out(1).getAs[Double]("bid") === 99.0)
    assert(out(1).isNullAt(out(1).fieldIndex("ask")))
  }

  test("single shuffle: one Exchange and one Window in the plan") {
    val quotes = Seq(("A", t("2024-01-01 10:00:00"), 1.0)).toDF("sym", "qt", "v")
    val trades = Seq((1L, "A", t("2024-01-01 10:03:00"))).toDF("id", "sym", "tt")
    val plan = AsOfJoin.leftAsOf(trades, quotes, "sym", "sym", "tt", "qt")
      .queryExecution.optimizedPlan.toString
    val windows = "(?m)^\\s*[+:]?-?\\s*Window ".r.findAllIn(plan).size
    assert(windows <= 1, s"expected the per-column windows to collapse:\n$plan")
  }
}
