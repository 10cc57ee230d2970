package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.GraftOps

import graft.SparkSpec
import graft.Tables

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("topKPerKey equals the row_number window phrasing") {
    val o = Tables.orders(spark, dir)
    val tiebroken = struct(col("o_totalprice"), col("o_orderkey"))
    val got = GraftOps.topKPerKey(o, Seq("o_custkey"), tiebroken, k = 3)
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), desc("o_orderkey"))
    val expected = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("ascending order and groups smaller than k") {
    val df = Seq((1L, 5.0), (1L, 1.0), (1L, 3.0), (2L, 9.0)).toDF("k", "v")
    val got = GraftOps.topKPerKey(df, Seq("k"), col("v"), k = 2,
        descending = false)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === Set((1L, 1.0), (1L, 3.0), (2L, 9.0)))
  }

  test("null order values rank last") {
    val df = Seq((1L, Some(5.0)), (1L, None), (1L, Some(3.0)))
      .toDF("k", "v")
    val got = GraftOps.topKPerKey(df, Seq("k"), col("v"), k = 2)
      .collect().map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1))).toSet
    assert(got === Set(Some(5.0), Some(3.0)))
  }

  test("plan uses TopKPerKeyExec with a single exchange and no sort") {
    val o = Tables.orders(spark, dir)
    val plan = GraftOps.topKPerKey(o, Seq("o_custkey"),
        col("o_totalprice"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Sort "), s"bounded-heap operator must not sort:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }

  test("partial heap pass runs below the exchange (map-side combine shape)") {
    val o = Tables.orders(spark, dir)
    val plan = GraftOps.topKPerKey(o, Seq("o_custkey"),
        col("o_totalprice"), k = 3)
      .queryExecution.executedPlan.toString
    // two heap operators — partial (pre-exchange) and final — so the
    // shuffle carries per-map-partition top-ks, not every input row
    assert("TopKPerKey".r.findAllIn(plan).size >= 2, plan)
  }

  test("partial key cap preserves results (overflow passthrough)") {
    // Cap the partial pass at ONE tracked key per partition: rows of
    // every other key must flow through to the final pass untouched and
    // the answer must stay exact.
    spark.conf.set("spark.graft.topk.partialMaxKeys", "1")
    try {
      val df = Seq((1L, 5.0), (2L, 9.0), (1L, 1.0), (3L, 2.0), (2L, 7.0),
          (3L, 8.0), (1L, 3.0))
        .toDF("k", "v").coalesce(1)
      val got = GraftOps.topKPerKey(df, Seq("k"), col("v"), k = 1)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got === Set((1L, 5.0), (2L, 9.0), (3L, 8.0)))
    } finally spark.conf.unset("spark.graft.topk.partialMaxKeys")
  }

  test("mixed-direction multi-column order equals the window phrasing") {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val expected = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    GraftOps.enableTopKRewrite(spark)
    val q = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val got = q.select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }
}
