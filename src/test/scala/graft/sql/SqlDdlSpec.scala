package graft.sql

import graft.SparkSpec

/** The reference's SQL DDL/DML surface (SURVEY S10/S11:
  * `spark_delta_handler.py:109-141` CREATE TABLE / INSERT INTO VALUES,
  * notebook cells 32-35) on Spark's built-in parquet catalog — nothing to
  * implement, but the capability is part of the parity contract, so it is
  * pinned by tests. */
class SqlDdlSpec extends SparkSpec {

  test("CREATE TABLE … USING parquet, INSERT INTO … VALUES, INSERT SELECT") {
    val loc = tmpDir("ddl-products")
    spark.sql("DROP TABLE IF EXISTS graft_products")
    spark.sql(
      s"""CREATE TABLE graft_products (
         |  id BIGINT, name STRING, price DOUBLE, stock_quantity INT, category STRING
         |) USING parquet LOCATION '$loc'""".stripMargin)
    // Multi-row literal insert (spark_delta_handler.py:127-141)
    spark.sql(
      """INSERT INTO graft_products VALUES
        |  (1, 'Laptop', 999.99, 10, 'tech'),
        |  (2, 'Mouse', 19.99, 0, 'tech')""".stripMargin)
    // Single-row insert (notebook cell 33)
    spark.sql("INSERT INTO graft_products VALUES (3, 'Desk', 149.0, 5, 'office')")
    assert(spark.table("graft_products").count() === 3)

    // INSERT INTO … SELECT (notebook cell 38's UNION-ALL source shape)
    spark.sql(
      """INSERT INTO graft_products
        |SELECT id + 100, concat(name, ' v2'), price * 2, stock_quantity, category
        |FROM graft_products WHERE id = 1""".stripMargin)
    val v2 = spark.sql(
      "SELECT name, price FROM graft_products WHERE id = 101").collect().head
    assert(v2.getString(0) === "Laptop v2")
    assert(v2.getDouble(1) === 1999.98)

    // The CASE bucketing MV query runs as plain SQL over the catalog table
    // (init-risingwave.sql:104-108).
    val statuses = spark.sql(
      """SELECT id, CASE WHEN stock_quantity = 0 THEN 'Out of Stock'
        |            WHEN stock_quantity < 10 THEN 'Low Stock'
        |            ELSE 'In Stock' END AS stock_status
        |FROM graft_products WHERE id <= 3 ORDER BY id""".stripMargin)
      .collect().map(_.getString(1)).toSeq
    assert(statuses === Seq("In Stock", "Out of Stock", "Low Stock"))
    spark.sql("DROP TABLE graft_products")
  }
}
