package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.GraftTable

/** Delta's SQL DML and utility statements on graft relations, through SQL
  * ONLY — served by the injected
  * [[org.apache.spark.sql.graftnative.GraftSqlParser]]: `DELETE FROM`,
  * `UPDATE`, `MERGE INTO` (the canonical shapes), `OPTIMIZE`, `VACUUM`,
  * `DESCRIBE HISTORY`, `RESTORE TABLE`. The reference performs the same
  * mutations through Python Delta APIs (spark_delta_handler.py:160-289);
  * these are their user-facing SQL spellings. */
class SqlDmlSpec extends SparkSpec {

  private lazy val s2 = spark

  private def freshTable(tag: String, viewName: String): (GraftTable, String) = {
    import s2.implicits._
    val root = tmpDir(tag)
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("id", "s", "v").write.format("graft").save(root)
    s2.sql(s"CREATE OR REPLACE TEMPORARY VIEW $viewName USING graft OPTIONS (path '$root')")
    (GraftTable.forPath(s2, root), root)
  }

  test("DELETE FROM … WHERE, including qualified and no-WHERE forms") {
    import s2.implicits._
    val (t, _) = freshTable("sqldel", "del_t")
    val res = s2.sql("DELETE FROM del_t WHERE del_t.v > 25.0")
    assert(res.head().getLong(0) === 2) // num_affected_rows
    assert(t.read().select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    // CDF recorded the SQL delete like the API delete (q13's contract)
    val ch = t.readChanges(1, t.version).filter(col("_change_type") === "delete")
    assert(ch.count() === 2)
    // no WHERE deletes everything, as a logged commit
    s2.sql("DELETE FROM del_t")
    assert(t.read().count() === 0)
    assert(t.readVersion(1).count() === 2) // time travel still serves v1
  }

  test("UPDATE … SET … WHERE with alias-qualified references") {
    val (t, _) = freshTable("sqlupd", "upd_t")
    val res = s2.sql(
      "UPDATE upd_t SET v = upd_t.v * 2, s = concat(s, '!') WHERE upd_t.id <= 2")
    assert(res.head().getLong(0) === 2)
    val rows = t.read().orderBy("id").collect()
    assert(rows.map(_.getDouble(2)).toSeq === Seq(20.0, 40.0, 30.0, 40.0))
    assert(rows.map(_.getString(1)).toSeq === Seq("a!", "b!", "c", "d"))
  }

  test("UPDATE rejects a SET target that is not a column") {
    val (_, _) = freshTable("sqlupdbad", "updbad_t")
    val e = intercept[Exception] {
      s2.sql("UPDATE updbad_t SET nope = 1").collect()
    }
    assert(e.getMessage.contains("not a column"))
  }

  test("MERGE INTO upsert shape (UPDATE SET * + INSERT *)") {
    import s2.implicits._
    val (t, _) = freshTable("sqlmrg", "mrg_t")
    Seq((2L, "B", 200.0), (9L, "i", 90.0)).toDF("id", "s", "v")
      .createOrReplaceTempView("mrg_src")
    val res = s2.sql(
      """MERGE INTO mrg_t t USING mrg_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head()
    assert(res.getLong(0) === 2) // affected = updated + inserted
    assert(res.getLong(1) === 1 && res.getLong(3) === 1)
    val byId = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId === Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d", 9L -> "i"))
  }

  test("MERGE INTO insert-only and delete-matched shapes") {
    import s2.implicits._
    val (t, _) = freshTable("sqlmrg2", "mrg2_t")
    Seq((3L, "X", 0.0), (7L, "g", 70.0)).toDF("id", "s", "v")
      .createOrReplaceTempView("mrg2_src")
    // insert-only: id=3 exists and must NOT be updated
    val ins = s2.sql(
      """MERGE INTO mrg2_t t USING mrg2_src s ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head()
    assert(ins.getLong(3) === 1)
    val byId = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(3L) === "c" && byId(7L) === "g")
    // delete-matched: drop every key present in the source
    val del = s2.sql(
      """MERGE INTO mrg2_t t USING mrg2_src s ON t.id = s.id
        |WHEN MATCHED THEN DELETE""".stripMargin).head()
    assert(del.getLong(2) === 2)
    assert(t.read().select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 4L))
  }

  test("MERGE source can be an arbitrary query, and unsupported shapes fail clearly") {
    import s2.implicits._
    val (t, _) = freshTable("sqlmrg3", "mrg3_t")
    Seq((1L, "z", 1.0), (1L, "z", 1.0), (8L, "h", 80.0)).toDF("id", "s", "v")
      .createOrReplaceTempView("mrg3_src")
    // subquery source (dedup'd) through the same path
    s2.sql(
      """MERGE INTO mrg3_t t
        |USING (SELECT DISTINCT * FROM mrg3_src) s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(t.read().count() === 5)
    val e = intercept[UnsupportedOperationException] {
      s2.sql(
        """MERGE INTO mrg3_t t USING mrg3_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET t.s = s.s""".stripMargin)
    }
    assert(e.getMessage.contains("DataFrame API"))
    val e2 = intercept[UnsupportedOperationException] {
      s2.sql(
        """MERGE INTO mrg3_t t USING mrg3_src s ON t.id = s.id AND t.v > 0
          |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e2.getMessage.contains("MERGE requires ON"))
  }

  test("OPTIMIZE, with WHERE and ZORDER BY variants") {
    import s2.implicits._
    val (t, _) = freshTable("sqlopt", "opt_t")
    t.append(Seq((5L, "e", 50.0)).toDF("id", "s", "v"))
    t.append(Seq((6L, "f", 60.0)).toDF("id", "s", "v"))
    val before = t.read().orderBy("id").collect().toSeq
    s2.sql("OPTIMIZE opt_t").collect()
    assert(t.read().orderBy("id").collect().toSeq === before)
    s2.sql("OPTIMIZE opt_t ZORDER BY (id, v)").collect()
    assert(t.read().orderBy("id").collect().toSeq === before)
    s2.sql("OPTIMIZE opt_t WHERE id >= 4").collect()
    assert(t.read().orderBy("id").collect().toSeq === before)
  }

  test("DESCRIBE HISTORY, VACUUM RETAIN, RESTORE TABLE TO VERSION AS OF") {
    val (t, root) = freshTable("sqlhist", "hist_t")
    s2.sql("DELETE FROM hist_t WHERE id = 1")
    val hist = s2.sql("DESCRIBE HISTORY hist_t").collect()
    assert(hist.length === 2) // WRITE + DELETE, newest first
    assert(hist.head.getAs[String]("operation") === "DELETE")
    // restore back to v0 via SQL; the restored state is the full table
    s2.sql("RESTORE TABLE hist_t TO VERSION AS OF 0").collect()
    assert(t.read().count() === 4)
    // vacuum with explicit retention 0 drops the unreachable delete dirs
    val removed = s2.sql("VACUUM hist_t RETAIN 0.0 HOURS").head().getLong(0)
    assert(removed >= 0)
    assert(t.read().count() === 4) // live state untouched
    assert(GraftTable.forPath(s2, root).read().count() === 4)
  }

  test("table_changes TVF serves the change feed through SQL") {
    import s2.implicits._
    val (t, _) = freshTable("sqlcdf", "cdf_t")
    s2.sql("DELETE FROM cdf_t WHERE id = 2")
    val ch = s2.sql(
      "SELECT id, _change_type, _commit_version FROM table_changes('cdf_t', 1) ORDER BY id")
      .collect()
    assert(ch.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((2L, "delete", 1L)))
    // range form: [1,1] same; an APPEND commit serves synthesized inserts
    // (the initial WRITE is pre-CDF, as in Delta)
    assert(s2.sql("SELECT count(*) FROM table_changes('cdf_t', 1, 1)").head().getLong(0) === 1)
    t.append(Seq((9L, "i", 90.0)).toDF("id", "s", "v"))
    assert(s2.sql(
      "SELECT count(*) FROM table_changes('cdf_t', 2) WHERE _change_type = 'insert'")
      .head().getLong(0) === 1)
    // composes with joins/aggregates around it
    assert(s2.sql(
      """SELECT max(c.id) FROM table_changes('cdf_t', 1) c
        |JOIN (SELECT 2 AS k) j ON c.id = j.k""".stripMargin).head().getLong(0) === 2)
    // non-graft name keeps stock behavior (unknown TVF error)
    intercept[Exception] {
      s2.sql("SELECT * FROM table_changes('no_such_graft_table', 0)").collect()
    }
    // bad argument shape fails with the graft message
    val e = intercept[IllegalArgumentException] {
      s2.sql("SELECT * FROM table_changes('cdf_t', 'not_a_version')")
    }
    assert(e.getMessage.contains("integer literal"))
    assert(t.read().count() === 4)
  }

  test("non-graft tables keep stock DML behavior") {
    import s2.implicits._
    Seq((1L, "x")).toDF("id", "s").createOrReplaceTempView("plain_dml")
    // stock Spark refuses DELETE on a non-v2 relation — error preserved
    intercept[Exception] {
      s2.sql("DELETE FROM plain_dml WHERE id = 1").collect()
    }
    // and OPTIMIZE on a non-graft name is still a stock parse error
    intercept[Exception] {
      s2.sql("OPTIMIZE plain_dml").collect()
    }
  }
}
