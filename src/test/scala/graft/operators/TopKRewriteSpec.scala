package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.GraftOps

import graft.SparkSpec

/** The row_number ≤ k optimizer rule must swap in the heap operator
  * exactly when safe, and never change results. */
class TopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 40.0),
    ("b", 5L, 5.0), ("b", 6L, 15.0),
    ("c", 7L, 1.0)
  ).toDF("k", "id", "v")

  private def topkIdiom(k: Int) = {
    val w = Window.partitionBy("k").orderBy(desc("v"), desc("id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  test("rewrites the row_number idiom to the heap operator, same rows") {
    val expected = topkIdiom(2).collect().toSet // before enabling the rule
    GraftOps.enableTopKRewrite(spark)
    val q = topkIdiom(2)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerKey"), s"no heap operator in:\n$physical")
    assert(!physical.contains("Window"), s"window survived in:\n$physical")
    assert(!physical.contains("Sort"), s"sort survived in:\n$physical")
    assert(q.collect().toSet === expected)
  }

  test("rn = 1 (latest-per-key compaction) also rewrites") {
    GraftOps.enableTopKRewrite(spark)
    val w = Window.partitionBy("k").orderBy(desc("v"), desc("id"))
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("a", 4L), ("b", 6L), ("c", 7L)))
  }

  test("q69's tf-idf top-terms plans through the heap operator") {
    GraftOps.enableTopKRewrite(spark)
    val q = graft.analytics.CorpusQueries.tfidfTopTerms(spark, "/root/testdata/sf0.001")
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerKey"), s"no heap operator in:\n$physical")
    // 500 docs, ≤5 terms each; every doc with ≥1 token is represented
    assert(q.select("doc_id").distinct().count() === 500)
    assert(q.groupBy("doc_id").count().agg(max("count")).head().getLong(0) <= 5)
  }

  test("no rewrite when rn stays in the output") {
    GraftOps.enableTopKRewrite(spark)
    val w = Window.partitionBy("k").orderBy(desc("v"), desc("id"))
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    val physical = q.queryExecution.executedPlan.toString
    assert(!physical.contains("TopKPerKey"), s"unsafe rewrite in:\n$physical")
    // and the window result is intact
    assert(q.collect().length === 5)
  }

  test("mixed sort directions rewrite and match the window rows") {
    // The (score DESC, id ASC) ranking is the dominant kNN/ANN shape
    // (q157/q214/q215); the generalized per-field comparator must
    // reproduce the window order exactly.
    val w = Window.partitionBy("k").orderBy(desc("v"), asc("id"))
    val expected = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn").collect().toSet
    GraftOps.enableTopKRewrite(spark)
    val mixed = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2).drop("rn")
    val physical = mixed.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerKey"), s"no heap operator in:\n$physical")
    assert(mixed.collect().toSet === expected)
  }

  test("no rewrite for rank-sensitive conditions (rn = 2)") {
    GraftOps.enableTopKRewrite(spark)
    val w2 = Window.partitionBy("k").orderBy(desc("v"), desc("id"))
    val rn2 = df.withColumn("rn", row_number().over(w2)).filter(col("rn") === 2).drop("rn")
    assert(!rn2.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(rn2.collect().length === 2) // rank-2 rows of a and b
  }

  test("SQL phrasing (subquery + WHERE rn <= k) also rewrites") {
    GraftOps.enableTopKRewrite(spark)
    df.createOrReplaceTempView("topk_sql_src")
    val q = spark.sql(
      """SELECT k, id, v FROM (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY v DESC, id DESC) AS rn
        |  FROM topk_sql_src) WHERE rn <= 2""".stripMargin)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerKey"), s"no heap operator in:\n$physical")
    assert(q.collect().toSet === topkIdiom(2).collect().toSet)
  }

  test("nullable ascending order rewrites and honors nulls-first") {
    GraftOps.enableTopKRewrite(spark)
    val withNulls = Seq(("a", 1L, Some(2.0)), ("a", 2L, None), ("a", 3L, Some(1.0)))
      .toDF("k", "id", "v")
    val w = Window.partitionBy("k").orderBy(asc("v"))
    val q = withNulls.withColumn("rn", row_number().over(w)).filter(col("rn") <= 1).drop("rn")
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // asc + default NullsFirst: the null row ranks first — the heap's
    // per-field comparator must follow the SortOrder's null ordering,
    // not a blanket nulls-last rule
    assert(q.collect().map(_.getLong(1)).toSeq === Seq(2L))
  }

  test("explicit nulls-last ascending rewrites and ranks nulls last") {
    GraftOps.enableTopKRewrite(spark)
    val withNulls = Seq(("a", 1L, Some(2.0)), ("a", 2L, None), ("a", 3L, Some(1.0)))
      .toDF("k", "id", "v")
    val w = Window.partitionBy("k").orderBy(asc_nulls_last("v"))
    val q = withNulls.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2).drop("rn")
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(q.collect().map(_.getLong(1)).toSet === Set(3L, 1L))
  }
}
