package graft

/** Driver-contract smoke: `entry` yields rows and every declared query runs
  * at sf0.001 — catches a broken queries-map entry before the external
  * gate does. Oracle equivalence is checked by tools/check_oracle.py. */
class SparkEntrySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("entry (flagship customer_order_summary) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("every declared query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
