package graft.props

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.AsOfJoin
import graft.table.GraftTable

/** Seeded randomized invariants (deterministic across runs):
  *  - MERGE replay idempotence — the property that makes the at-least-once
  *    delivery of the streaming path safe (reference's design argument,
  *    docs/technical-docs.md:550-589).
  *  - As-of join vs an in-memory brute force on random data.
  */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  test("merge replay is idempotent: applying a batch twice = once") {
    val rnd = new Random(1234)
    for (trial <- 1 to 3) {
      val base = (1L to 50L).map(i => (i, rnd.nextInt(1000), rnd.nextDouble()))
        .toDF("id", "v", "w")
      val batch = (1L to 70L).filter(_ => rnd.nextBoolean())
        .map(i => (i, rnd.nextInt(1000), rnd.nextDouble()))
        .toDF("id", "v", "w")

      val once = GraftTable.create(spark, tmpDir(s"idem-a$trial"), base)
      once.merge(batch, "id")
      val twice = GraftTable.create(spark, tmpDir(s"idem-b$trial"), base)
      twice.merge(batch, "id")
      val replay = twice.merge(batch, "id") // at-least-once redelivery

      val a = once.read().orderBy("id").collect().toSeq
      val b = twice.read().orderBy("id").collect().toSeq
      assert(a === b, s"trial $trial: replayed merge diverged")
      // and the replay was a no-op in the metrics too (changedOnly)
      assert(replay.metrics("numTargetRowsUpdated") === 0)
      assert(replay.metrics("numTargetRowsInserted") === 0)
    }
  }

  test("delete replay is idempotent") {
    val rnd = new Random(99)
    val base = (1L to 60L).map(i => (i, rnd.nextInt(10))).toDF("id", "v")
    val t = GraftTable.create(spark, tmpDir("idem-del"), base)
    t.delete(col("v") < 3)
    val after1 = t.read().orderBy("id").collect().toSeq
    val c = t.delete(col("v") < 3)
    assert(t.read().orderBy("id").collect().toSeq === after1)
    assert(c.metrics("numDeletedRows") === 0)
  }

  test("asof join matches brute force on random keyed series") {
    val rnd = new Random(777)
    val rights = (1 to 200).map { i =>
      (s"k${rnd.nextInt(8)}", new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), i.toDouble)
    }.distinct
    // unique per (key, time)
    val rightRows = rights.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val lefts = (1 to 150).map { i =>
      (i.toLong, s"k${rnd.nextInt(10)}", new Timestamp(1700000000000L + rnd.nextInt(110000) * 1000L))
    }
    val rightDf = rightRows.toDF("k", "t", "price")
    val leftDf = lefts.toDF("id", "k", "t")

    val got = AsOfJoin.leftAsOf(leftDf, rightDf, "k", "k", "t", "t")
      .select("id", "price").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    val byKey = rightRows.groupBy(_._1)
    lefts.foreach { case (id, k, t) =>
      val expected = byKey.get(k).flatMap { rs =>
        val eligible = rs.filter(!_._2.after(t))
        if (eligible.isEmpty) None else Some(eligible.maxBy(_._2.getTime)._3)
      }
      assert(got(id) === expected, s"left row $id key $k time $t")
    }
  }
}
