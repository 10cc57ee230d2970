package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.GraftTable

/** Delta's SQL time-travel clause on graft relations, through SQL ONLY:
  * `SELECT … FROM v VERSION AS OF n` / `TIMESTAMP AS OF ts` — served by
  * the injected [[org.apache.spark.sql.graftnative.GraftSqlParser]]
  * (active in the shared spec session via spark.sql.extensions). */
class SqlTimeTravelSpec extends SparkSpec {

  private lazy val s2 = spark

  test("VERSION AS OF and TIMESTAMP AS OF resolve for a USING graft view") {
    import s2.implicits._
    val root = tmpDir("sqltt")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .write.format("graft").save(root)
    val ts0 = GraftTable.forPath(s2, root).history()
      .filter(col("version") === 0L).select("timestamp").head().getTimestamp(0)
    Seq((4L, "d")).toDF("id", "s")
      .write.format("graft").mode("append").save(root)

    s2.sql(s"CREATE OR REPLACE TEMPORARY VIEW tt_t USING graft OPTIONS (path '$root')")
    assert(s2.sql("SELECT count(*) AS n FROM tt_t VERSION AS OF 0").head().getLong(0) === 3)
    assert(s2.sql("SELECT count(*) AS n FROM tt_t VERSION AS OF 1").head().getLong(0) === 4)
    // the clause composes with ordinary SQL around it
    assert(s2.sql(
      "SELECT max(id) FROM tt_t VERSION AS OF 0 WHERE s <> 'c'").head().getLong(0) === 2)
    // timestamp form: v0's commit instant serves v0 (session tz = UTC)
    val tsLit = new java.sql.Timestamp(ts0.getTime).toInstant
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime.toString.replace('T', ' ')
    assert(s2.sql(
      s"SELECT count(*) FROM tt_t TIMESTAMP AS OF '$tsLit'").head().getLong(0) === 3)
    // a bad version fails with the graft error, not a resolution mystery
    val e = intercept[Exception] {
      s2.sql("SELECT * FROM tt_t VERSION AS OF 99").collect()
    }
    assert(e.getMessage != null)
  }

  test("non-graft relations keep stock behavior (time travel still refused)") {
    import s2.implicits._
    Seq((1L, "x")).toDF("id", "s").createOrReplaceTempView("plain_view")
    intercept[Exception] {
      s2.sql("SELECT * FROM plain_view VERSION AS OF 0").collect()
    }
    // and plain reads through the graft parser are untouched
    assert(s2.sql("SELECT count(*) FROM plain_view").head().getLong(0) === 1)
  }

  test("parameterized SQL keeps working through the delegating parser") {
    // spark.sql(text, args) enters parsePlanWithParameters — the parser
    // must hand the parameter machinery through to the real parser
    assert(s2.sql("SELECT ? + 1 AS x", Array(41)).head().getInt(0) === 42)
    assert(s2.sql("SELECT :a || 'b' AS s", Map("a" -> "a")).head().getString(0) === "ab")
  }

  test("catalog table USING graft time-travels through SQL") {
    import s2.implicits._
    val root = tmpDir("sqlttcat")
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.format("graft").save(root)
    GraftTable.forPath(s2, root).append(Seq((3L, 30.0)).toDF("id", "v"))
    s2.sql("DROP TABLE IF EXISTS tt_cat")
    s2.sql(s"CREATE TABLE tt_cat USING graft OPTIONS (path '$root')")
    try {
      assert(s2.sql("SELECT count(*) FROM tt_cat VERSION AS OF 0").head().getLong(0) === 2)
      assert(s2.sql("SELECT count(*) FROM tt_cat").head().getLong(0) === 3)
    } finally s2.sql("DROP TABLE tt_cat")
  }
}
