package graft.sql

import graft.SparkSpec
import graft.table.GraftTable

/** Delta's `ALTER TABLE` SQL family on graft relations — the SQL
  * spellings of the metadata-commit operations (addColumn / dropColumn /
  * renameColumn / set-unset properties / constraints), routed by the
  * injected parser; stock Spark refuses all of these on temp views and
  * v1 tables. */
class SqlAlterSpec extends SparkSpec {

  private lazy val s2 = spark

  private def freshTable(tag: String, viewName: String): (GraftTable, String) = {
    import s2.implicits._
    val root = tmpDir(tag)
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "s", "v").write.format("graft").save(root)
    s2.sql(s"CREATE OR REPLACE TEMPORARY VIEW $viewName USING graft OPTIONS (path '$root')")
    (GraftTable.forPath(s2, root), root)
  }

  test("ADD COLUMNS, DROP COLUMN, RENAME COLUMN TO") {
    val (t, _) = freshTable("sqlalter", "alt_t")
    s2.sql("ALTER TABLE alt_t ADD COLUMNS (note STRING, score DOUBLE)").collect()
    assert(t.read().schema.fieldNames.toSeq === Seq("id", "s", "v", "note", "score"))
    // new columns read null over pre-evolution files
    assert(t.read().filter("note IS NULL").count() === 3)
    s2.sql("ALTER TABLE alt_t DROP COLUMN score").collect()
    assert(!t.read().schema.fieldNames.contains("score"))
    // IF EXISTS tolerates the already-gone name
    s2.sql("ALTER TABLE alt_t DROP COLUMN IF EXISTS score").collect()
    s2.sql("ALTER TABLE alt_t RENAME COLUMN note TO remark").collect()
    assert(t.read().schema.fieldNames.contains("remark"))
    // time travel still serves the original shape
    assert(t.readVersion(0).schema.fieldNames.toSeq === Seq("id", "s", "v"))
    // history records each DDL as its own commit
    val ops = t.history().collect().map(_.getAs[String]("operation")).toSeq
    assert(ops.take(4) === Seq("RENAME COLUMN", "DROP COLUMN", "ADD COLUMN", "ADD COLUMN"))
  }

  test("RENAME COLUMN routes metadata-only once column mapping is opted in") {
    val (t, _) = freshTable("sqlrenmo", "ren_t")
    // Delta's opt-in shape: flip the mapping mode via SET TBLPROPERTIES —
    // from then on SQL renames are metadata-only (no data rewrite)
    s2.sql("ALTER TABLE ren_t SET TBLPROPERTIES ('graft.columnMapping.mode' = 'name')")
      .collect()
    val dirsBefore = t.detail().head().getAs[Long]("numFiles")
    s2.sql("ALTER TABLE ren_t RENAME COLUMN s TO label").collect()
    assert(t.read().schema.fieldNames.toSeq === Seq("id", "label", "v"))
    assert(t.detail().head().getAs[Long]("numFiles") === dirsBefore)
    assert(t.columnMappingActive)
    // rows fully served under the new logical name
    assert(t.read().filter("label = 'b'").count() === 1)
    // an UN-opted table still takes the honest rewrite (numFiles changes
    // are allowed there; just assert the route produced the rename)
    val (t2, _) = freshTable("sqlrenrw", "ren_rw")
    s2.sql("ALTER TABLE ren_rw RENAME COLUMN s TO label").collect()
    assert(!t2.columnMappingActive)
    assert(t2.read().schema.fieldNames.toSeq === Seq("id", "label", "v"))
  }

  test("ALTER COLUMN … TYPE routes to the metadata-only widen") {
    import s2.implicits._
    val root = tmpDir("sqlwiden")
    Seq((1, 1.5f), (2, 2.5f)).toDF("k", "x")
      .write.format("graft").save(root)
    s2.sql(s"CREATE OR REPLACE TEMPORARY VIEW widen_t USING graft OPTIONS (path '$root')")
    val t = GraftTable.forPath(s2, root)
    val dirsBefore = t.detail().head().getAs[Long]("numFiles")
    s2.sql("ALTER TABLE widen_t ALTER COLUMN k TYPE BIGINT").collect()
    s2.sql("ALTER TABLE widen_t ALTER COLUMN x TYPE DOUBLE").collect()
    // metadata-only: no rewrite, history records the widens
    assert(t.detail().head().getAs[Long]("numFiles") === dirsBefore)
    assert(t.read().schema("k").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(t.history().collect().map(_.getAs[String]("operation")).take(2)
      .forall(_ == "WIDEN COLUMN"))
    // narrowing and non-type specs keep failing loudly
    intercept[Exception] {
      s2.sql("ALTER TABLE widen_t ALTER COLUMN k TYPE INT").collect()
    }
    intercept[Exception] {
      s2.sql("ALTER TABLE widen_t ALTER COLUMN k COMMENT 'nope'").collect()
    }
    // the widened table serves wide values over mixed-width files
    Seq((5000000000L, 3.5)).toDF("k", "x")
      .write.format("graft").mode("append").save(root)
    // a view resolved BEFORE the widen is stale: its int-typed relation
    // would misread long slots — the scan fails loudly, never truncates
    val stale = intercept[Exception] {
      s2.sql("SELECT k FROM widen_t ORDER BY k").collect()
    }
    assert(stale.getMessage.contains("re-create"))
    // re-resolving the view serves the wide values over mixed-width files
    s2.sql(s"CREATE OR REPLACE TEMPORARY VIEW widen_t USING graft OPTIONS (path '$root')")
    assert(s2.sql("SELECT k FROM widen_t ORDER BY k").as[Long].collect().toSeq
      === Seq(1L, 2L, 5000000000L))
  }

  test("CLUSTER BY routes to the clustering declaration; NONE clears it") {
    val (t, _) = freshTable("sqlcluster", "clu_t")
    s2.sql("ALTER TABLE clu_t CLUSTER BY (s, v)").collect()
    assert(t.clusteringColumns === Seq("s", "v"))
    s2.sql("ALTER TABLE clu_t CLUSTER BY NONE").collect()
    assert(t.clusteringColumns === Nil)
    // unknown columns refuse with the table's own diagnostic
    val e = intercept[IllegalArgumentException](
      s2.sql("ALTER TABLE clu_t CLUSTER BY (nope)").collect())
    assert(e.getMessage.contains("no such column"))
  }

  test("SET/UNSET TBLPROPERTIES round-trip through DESCRIBE DETAIL") {
    val (t, _) = freshTable("sqlprops", "prop_t")
    // note: 'owner' is reserved by Spark's own grammar — user keys only
    s2.sql("ALTER TABLE prop_t SET TBLPROPERTIES ('team' = 'data-eng', 'tier' = 'gold')")
      .collect()
    val props = s2.sql("DESCRIBE DETAIL prop_t").head()
      .getAs[Map[String, String]]("properties")
    assert(props("team") === "data-eng" && props("tier") === "gold")
    s2.sql("ALTER TABLE prop_t UNSET TBLPROPERTIES ('tier')").collect()
    val props2 = s2.sql("DESCRIBE DETAIL prop_t").head()
      .getAs[Map[String, String]]("properties")
    assert(props2.contains("team") && !props2.contains("tier"))
    // IF EXISTS (and plain) unset of an absent key is a no-op
    s2.sql("ALTER TABLE prop_t UNSET TBLPROPERTIES IF EXISTS ('nope')").collect()
    // SHOW TBLPROPERTIES lists them (and serves single-key lookups)
    val shown = s2.sql("SHOW TBLPROPERTIES prop_t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown("team") === "data-eng")
    assert(s2.sql("SHOW TBLPROPERTIES prop_t ('team')").head().getString(1) === "data-eng")
    // engine-managed namespaces are refused
    val e = intercept[Exception] {
      s2.sql("ALTER TABLE prop_t SET TBLPROPERTIES ('constraint.x' = '1=1')").collect()
    }
    assert(e.getMessage.contains("engine-managed"))
  }

  test("ADD CONSTRAINT validates and enforces; DROP CONSTRAINT releases") {
    import s2.implicits._
    val (t, _) = freshTable("sqlcons", "cons_t")
    s2.sql("ALTER TABLE cons_t ADD CONSTRAINT v_pos CHECK (v > 0)").collect()
    assert(t.constraints.keySet === Set("v_pos"))
    // writes violating the constraint are refused
    val bad = intercept[Exception] {
      t.append(Seq((9L, "x", -1.0)).toDF("id", "s", "v"))
    }
    assert(bad.getMessage.toLowerCase.contains("constraint"))
    // adding a constraint the existing snapshot violates is refused
    val e = intercept[Exception] {
      s2.sql("ALTER TABLE cons_t ADD CONSTRAINT v_big CHECK (v > 15)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("constraint") ||
      e.getMessage.toLowerCase.contains("violat"))
    s2.sql("ALTER TABLE cons_t DROP CONSTRAINT v_pos").collect()
    assert(t.constraints.isEmpty)
    t.append(Seq((9L, "x", -1.0)).toDF("id", "s", "v")) // now admitted
    assert(t.read().count() === 4)
    // DROP of an unknown name errors unless IF EXISTS
    intercept[Exception] {
      s2.sql("ALTER TABLE cons_t DROP CONSTRAINT nope").collect()
    }
    s2.sql("ALTER TABLE cons_t DROP CONSTRAINT IF EXISTS nope").collect()
  }

  test("non-graft relations keep stock ALTER behavior") {
    import s2.implicits._
    Seq((1L, "x")).toDF("id", "s").createOrReplaceTempView("plain_alter")
    // stock Spark refuses ALTER on a temp view — that error must surface
    intercept[Exception] {
      s2.sql("ALTER TABLE plain_alter ADD COLUMNS (c INT)").collect()
    }
  }

  test("a catalog database named 'delta' is not hijacked as a path") {
    // delta.`x` is the FOREIGN path address only when x looks like a
    // path ('/'-bearing) — delta-spark's isPathIdentifier rule. A bare
    // two-part name must keep resolving through the session catalog, or
    // tables in a database that happens to be called "delta" become
    // unreachable (their name would be read as a filesystem path).
    s2.sql("CREATE DATABASE IF NOT EXISTS delta")
    try {
      s2.sql("CREATE TABLE delta.plainevents (k BIGINT, s STRING) USING parquet")
      s2.sql("INSERT INTO delta.plainevents VALUES (1, 'a'), (2, 'b')")
      assert(s2.sql("SELECT count(*) FROM delta.plainevents")
        .head().getLong(0) === 2L)
      // the verbs the parser extension intercepts for delta.`path`
      // targets all fall through to stock Spark on the catalog table
      s2.sql("ALTER TABLE delta.plainevents SET TBLPROPERTIES ('team.owner' = 'x')")
      val props = s2.sql("SHOW TBLPROPERTIES delta.plainevents").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("team.owner").contains("x"))
      // DML interception: stock Spark refuses UPDATE on v1 parquet — the
      // error must be Spark's own (catalog resolution), never a foreign
      // _delta_log path probe against a "plainevents" filesystem path
      val err = intercept[Exception] {
        s2.sql("UPDATE delta.plainevents SET s = 'c' WHERE k = 1").collect()
      }
      assert(!err.getMessage.contains("_delta_log"), err.getMessage)
    } finally {
      s2.sql("DROP DATABASE IF EXISTS delta CASCADE")
    }
  }
}
