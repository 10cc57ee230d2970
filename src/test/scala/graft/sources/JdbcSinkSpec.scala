package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** What CAN be verified without a driver jar: the generated set-based
  * upsert statement (the semantic core of S15 — database.py:94-101's ON
  * CONFLICT contract) and the fail-fast guard for the missing driver. */
class JdbcSinkSpec extends AnyFunSuite {

  test("upsert SQL mirrors the reference's ON CONFLICT DO UPDATE contract") {
    val sql = JdbcSink.upsertSql("customers", "customers__stage",
      Seq("id", "first_name", "email"), Seq("id"))
    assert(sql ===
      "INSERT INTO customers (\"id\", \"first_name\", \"email\") " +
        "SELECT \"id\", \"first_name\", \"email\" FROM customers__stage " +
        "ON CONFLICT (\"id\") DO UPDATE SET \"first_name\" = EXCLUDED.\"first_name\", " +
        "\"email\" = EXCLUDED.\"email\"")
  }

  test("composite keys and key-only tables") {
    val sql = JdbcSink.upsertSql("oi", "oi__stage",
      Seq("order_id", "product_id"), Seq("order_id", "product_id"))
    assert(sql.endsWith("ON CONFLICT (\"order_id\", \"product_id\") DO NOTHING"))
    intercept[IllegalArgumentException] {
      JdbcSink.upsertSql("t", "s", Seq("a"), Seq("missing"))
    }
    intercept[IllegalArgumentException] {
      JdbcSink.upsertSql("t", "s", Seq("a"), Nil)
    }
  }

  test("missing driver fails fast with a clear message") {
    val e = intercept[UnsupportedOperationException] {
      JdbcSink.requireDriver("org.postgresql.Driver")
    }
    assert(e.getMessage.contains("driver jar"))
  }
}
