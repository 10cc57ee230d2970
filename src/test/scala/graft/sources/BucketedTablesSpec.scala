package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class BucketedTablesSpec extends SparkSpec {

  test("join of co-bucketed tables has no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Force a sort-merge join so the exchange (or its absence) is visible.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      BucketedTables.writeBucketed(Tables.customer(spark, dir),
        "b_customer", "c_custkey", 4, tmpDir("bt-cust"))
      BucketedTables.writeBucketed(
        Tables.orders(spark, dir).withColumnRenamed("o_custkey", "c_custkey"),
        "b_orders", "c_custkey", 4, tmpDir("bt-ord"))

      val joined = spark.table("b_customer")
        .join(spark.table("b_orders"), "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // correctness unchanged vs the shuffled join
      val expected = Tables.customer(spark, dir).join(
        Tables.orders(spark, dir).withColumnRenamed("o_custkey", "c_custkey"),
        "c_custkey").count()
      assert(joined.count() === expected)

      // bucketed group-by on the key also skips the exchange
      val aggPlan = spark.table("b_orders").groupBy("c_custkey")
        .agg(count(lit(1))).queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"),
        s"bucketed agg must not shuffle:\n$aggPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_customer")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
