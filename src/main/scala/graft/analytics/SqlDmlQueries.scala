package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.table.GraftTable

/** Driver queries exercising the SQL DML/utility surface end-to-end: each
  * builds a [[GraftTable]] from the testdata `orders` parquet, mutates it
  * through `spark.sql` ONLY (the injected
  * [[org.apache.spark.sql.graftnative.GraftSqlParser]] routes the
  * statements), and returns a final state plain ANSI SQL reproduces — so
  * the DuckDB gate checks the SQL spellings of DELETE / UPDATE / MERGE /
  * RESTORE exactly as q10/q11/q113 check their DataFrame-API forms.
  * (Reference mutates through Python Delta APIs,
  * spark_delta_handler.py:160-289; Delta SQL is the user-facing form.) */
object SqlDmlQueries {

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-$tag-").toString

  private val fixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), GraftTable]()

  private def cached(dir: String, tag: String)(build: => GraftTable): GraftTable =
    fixtureCache.computeIfAbsent((dir, tag), _ => build)

  /** Register a LIVE graft relation view (`USING graft`) — the form the
    * SQL parser resolves DML targets through. ([[GraftTable.view]] pins a
    * snapshot for skipping-enabled SELECTs; DML needs the live table.) */
  private def graftView(spark: SparkSession, name: String, t: GraftTable): Unit =
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name " +
      s"USING graft OPTIONS (path '${t.root}')")

  /** q132: `DELETE FROM t WHERE o_orderstatus = 'F'` through SQL. */
  def sqlDelete(spark: SparkSession, dir: String): DataFrame = {
    val t = cached(dir, "sqldel") {
      val t0 = GraftTable.create(spark, freshDir("sqldel"), Tables.orders(spark, dir))
      graftView(spark, "graft_sqldel_orders", t0)
      spark.sql("DELETE FROM graft_sqldel_orders WHERE o_orderstatus = 'F'")
      t0
    }
    t.read()
  }

  /** q133: `UPDATE t SET … WHERE …` through SQL — a constant restamp plus
    * a computed reprice, both assignments in one pass. */
  def sqlUpdate(spark: SparkSession, dir: String): DataFrame = {
    val t = cached(dir, "sqlupd") {
      val t0 = GraftTable.create(spark, freshDir("sqlupd"), Tables.orders(spark, dir))
      graftView(spark, "graft_sqlupd_orders", t0)
      spark.sql(
        """UPDATE graft_sqlupd_orders
          |SET o_orderstatus = 'X', o_totalprice = o_totalprice * 2
          |WHERE o_orderpriority = '1-URGENT'""".stripMargin)
      t0
    }
    t.read()
  }

  /** q134: `MERGE INTO … WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
    * THEN INSERT *` through SQL — the q10 recipe (poisoned half-table
    * upserted back to the full source) with SQL as the entry point. */
  def sqlMerge(spark: SparkSession, dir: String): DataFrame = {
    val t = cached(dir, "sqlmrg") {
      val orders = Tables.orders(spark, dir)
      val base = orders.filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .withColumn("o_totalprice", lit(-1.0))
      val t0 = GraftTable.create(spark, freshDir("sqlmrg"), base)
      graftView(spark, "graft_sqlmrg_target", t0)
      orders.createOrReplaceTempView("graft_sqlmrg_source")
      spark.sql(
        """MERGE INTO graft_sqlmrg_target t USING graft_sqlmrg_source s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      t0
    }
    t.read()
  }

  /** q136: GENERAL `MERGE INTO` through SQL — the full Delta clause
    * surface in one statement: conditional matched DELETE, explicit
    * matched UPDATE SET, guarded NOT MATCHED INSERT with a column list,
    * and NOT MATCHED BY SOURCE UPDATE. One CDC-style source batch drives
    * all four branches; the final state is reproducible in plain ANSI SQL
    * (CASE + UNION ALL), so the DuckDB gate checks the row-level clause
    * semantics end to end. */
  def sqlMergeCdc(spark: SparkSession, dir: String): DataFrame = {
    val t = cached(dir, "sqlmrgcdc") {
      val orders = Tables.orders(spark, dir)
      val t0 = GraftTable.create(spark, freshDir("sqlmrgcdc"), orders)
      graftView(spark, "graft_sqlcdc_target", t0)
      // One source batch with an op column: every 'F' order is a delete,
      // every urgent non-'F' order re-prices (op 'u'), and a sampled set
      // of synthetic new keys inserts (op 'c').
      val deletes = orders.filter(col("o_orderstatus") === "F")
        .withColumn("op", lit("d"))
      val updates = orders.filter(col("o_orderstatus") =!= "F" &&
          col("o_orderpriority") === "1-URGENT")
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("op", lit("u"))
      val inserts = orders.filter(col("o_orderstatus") === "O" &&
          pmod(col("o_orderkey"), lit(97)) === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
        .withColumn("o_orderstatus", lit("N"))
        .withColumn("o_totalprice", lit(1.0))
        .withColumn("op", lit("c"))
      deletes.unionByName(updates).unionByName(inserts)
        .createOrReplaceTempView("graft_sqlcdc_source")
      spark.sql(
        """MERGE INTO graft_sqlcdc_target t USING graft_sqlcdc_source s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED AND s.op = 'd' THEN DELETE
          |WHEN MATCHED THEN UPDATE
          |  SET o_orderstatus = 'U', o_totalprice = s.o_totalprice
          |WHEN NOT MATCHED AND s.op = 'c' THEN INSERT
          |  (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
          |   o_orderpriority)
          |  VALUES (s.o_orderkey, s.o_custkey, s.o_orderstatus, s.o_totalprice,
          |   s.o_orderdate, s.o_orderpriority)
          |WHEN NOT MATCHED BY SOURCE AND t.o_orderstatus = 'P' THEN UPDATE
          |  SET o_orderpriority = '9-UNTOUCHED'""".stripMargin)
      t0
    }
    t.read()
  }

  /** q137: `COPY INTO` through SQL — idempotent bulk load of the source
    * parquet into an empty table; the statement runs TWICE and the
    * second run must be a no-op (the loaded-file ledger in the commit),
    * so the oracle equality also proves the idempotency contract. */
  def sqlCopyInto(spark: SparkSession, dir: String): DataFrame = {
    val t = cached(dir, "sqlcopy") {
      val t0 = GraftTable.create(spark, freshDir("sqlcopy"),
        Tables.orders(spark, dir).limit(0))
      graftView(spark, "graft_sqlcopy_orders", t0)
      val stmt = s"COPY INTO graft_sqlcopy_orders FROM '$dir' " +
        "FILEFORMAT = PARQUET PATTERN = 'orders.parquet'"
      spark.sql(stmt).collect()
      spark.sql(stmt).collect() // replay: must load nothing
      t0
    }
    t.read()
  }

  /** q135: `DELETE` then `RESTORE TABLE … TO VERSION AS OF 0` through SQL
    * — the q113 round-trip with SQL statements driving both steps. */
  def sqlRestore(spark: SparkSession, dir: String): DataFrame = {
    val t = cached(dir, "sqlrestore") {
      val t0 = GraftTable.create(spark, freshDir("sqlrst"), Tables.orders(spark, dir))
      graftView(spark, "graft_sqlrst_orders", t0)
      spark.sql("DELETE FROM graft_sqlrst_orders WHERE o_orderstatus = 'F'")
      spark.sql("RESTORE TABLE graft_sqlrst_orders TO VERSION AS OF 0")
      t0
    }
    t.read()
  }

  /** q186: column defaults end-to-end — evolve a column in, declare its
    * DEFAULT, and INSERT rows that omit it. Existing rows keep NULL (a
    * default never rewrites data — Delta's contract and why SET DEFAULT
    * is safe on a 100 TB table: one metadata commit, zero file IO); the
    * post-declaration inserts are filled by STOCK Spark insert
    * resolution reading the relation's CURRENT_DEFAULT field metadata —
    * the engine adds no insert path of its own. */
  def sqlColumnDefaults(spark: SparkSession, dir: String): DataFrame = {
    val t = cached(dir, "sqldef") {
      val t0 = GraftTable.create(spark, freshDir("sqldef"), Tables.nation(spark, dir))
      graftView(spark, "graft_sqldef_nation", t0)
      spark.sql("ALTER TABLE graft_sqldef_nation ADD COLUMNS (status STRING)")
      spark.sql(
        "ALTER TABLE graft_sqldef_nation ALTER COLUMN status SET DEFAULT 'active'")
      spark.sql(
        """INSERT INTO graft_sqldef_nation (n_nationkey, n_name, n_regionkey)
          |VALUES (900, 'ATLANTIS', 0), (901, 'LEMURIA', 1)""".stripMargin)
      t0
    }
    t.read()
  }
}
