package graft.operators

import java.sql.Timestamp

import scala.util.Random

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketized point-in-range equals brute force on random data") {
    val rnd = new Random(321)
    val base = 1700000000000L
    val points = (1 to 300).map { i =>
      (i.toLong, rnd.nextInt(5).toLong, new Timestamp(base + rnd.nextInt(1000000) * 100L))
    }
    val ranges = (1 to 60).map { i =>
      val s = base + rnd.nextInt(1000000) * 100L
      (1000L + i, rnd.nextInt(5).toLong, new Timestamp(s),
        new Timestamp(s + 1000L + rnd.nextInt(5000000)))
    }
    val pDf = points.toDF("pid", "k", "t")
    val rDf = ranges.toDF("rid", "rk", "s", "e")

    // bucket width deliberately smaller than many ranges → replication path
    val got = RangeJoin.pointInRange(pDf, rDf, "k", "rk", "t", "s", "e",
        bucketMs = 600000L)
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val expected = (for {
      (pid, k, t) <- points
      (rid, rk, s, e) <- ranges
      if k == rk && !t.before(s) && t.before(e)
    } yield (pid, rid)).toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("auto-tuned bucket width matches brute force and tracks the data") {
    val rnd = new Random(99)
    val base = 1700000000000L
    val points = (1 to 200).map { i =>
      (i.toLong, rnd.nextInt(4).toLong, new Timestamp(base + rnd.nextInt(500000) * 100L))
    }
    // widths clustered around ~20 min → derived bucket lands near that,
    // independent of any hand-set constant
    val ranges = (1 to 40).map { i =>
      val s = base + rnd.nextInt(500000) * 100L
      (1000L + i, rnd.nextInt(4).toLong, new Timestamp(s),
        new Timestamp(s + 1000000L + rnd.nextInt(400000)))
    }
    val pDf = points.toDF("pid", "k", "t")
    val rDf = ranges.toDF("rid", "rk", "s", "e")
    val got = RangeJoin.pointInRangeAuto(pDf, rDf, "k", "rk", "t", "s", "e")
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (pid, k, t) <- points
      (rid, rk, s, e) <- ranges
      if k == rk && !t.before(s) && t.before(e)
    } yield (pid, rid)).toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("empty and degenerate ranges produce no matches") {
    val pDf = Seq((1L, 1L, new Timestamp(1000L))).toDF("pid", "k", "t")
    val rDf = Seq((9L, 1L, new Timestamp(2000L), new Timestamp(2000L)))
      .toDF("rid", "rk", "s", "e") // zero-width [s, s)
    val out = RangeJoin.pointInRange(pDf, rDf, "k", "rk", "t", "s", "e", 1000L)
    assert(out.count() === 0)
  }
}
