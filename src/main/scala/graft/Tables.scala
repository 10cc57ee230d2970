package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata star schema (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives `(spark, sfDir)` and reads
  * its inputs through these helpers so the scan always goes through the
  * vectorized Parquet reader with Catalyst pushdown/pruning intact.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")

  /** `events.parquet` has stored `ts` as parquet TIMESTAMP(NANOS) (readable
    * only via `spark.sql.legacy.parquet.nanosAsLong`, set in every session
    * builder here) and, in newer generations, as TIMESTAMP(MICROS,
    * isAdjustedToUTC=false), which Spark surfaces as TimestampNTZ. Normalize
    * both to TimestampType so downstream instant functions (`unix_millis`,
    * `to_utc_timestamp`, …) resolve: nanos via integral division — `ts div
    * 1000`, because a double-valued `/1000` loses precision beyond 2^53 ns
    * (~epoch 2024 is ~1.7e18 ns) — and NTZ via a cast, which under the
    * engine-wide UTC session timezone maps each naive value to the same
    * wall-clock instant the oracle reads. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
