package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of left rows share one hot key.
    val left = (1L to 2000L).map(i =>
      (i, if (i % 10 == 0) s"k${i % 7}" else "hot", i.toDouble)).toDF("id", "k", "v")
    val right = Seq(("hot", 1), ("k0", 2), ("k3", 3), ("missing", 4)).toDF("k", "dim")

    val plain = left.join(right, Seq("k")).select("id", "dim")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val salted = SaltedJoin.innerSalted(left, right, "k", 8, col("id"))
      .select("id", "dim")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
  }

  test("hot key actually spreads across salts") {
    val left = (1L to 1000L).map(i => (i, "hot")).toDF("id", "k")
    val salts = left.withColumn("__salt", pmod(hash(col("id")), lit(8)))
      .groupBy("__salt").count().collect()
    assert(salts.length === 8)
    // roughly uniform: no salt holds more than half the hot key
    assert(salts.map(_.getLong(1)).max < 500)
  }
}
