package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. One session per suite; small
  * shuffle-partition count so tiny-fixture tests don't schedule 200 tasks. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    // Same extension surface as Verify/Bench (functions, planner strategy,
    // optimizer rules, and the SQL time-travel parser — the parser can ONLY
    // bind here: spark.sql.extensions is a static conf read at context
    // creation). Specs therefore run what production sessions run.
    .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // INT96 (Spark's legacy default) writes NO footer statistics —
    // standard TIMESTAMP_MICROS restores min/max for timestamp columns,
    // powering both graft dir-stats and exported Delta per-file stats.
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    // Session is shared across suites in one JVM (sbt forks once per Test
    // run); don't stop it here or later suites fail.
    super.afterAll()
  }

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
