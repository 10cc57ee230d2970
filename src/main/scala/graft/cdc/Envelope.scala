package graft.cdc

import org.apache.spark.sql.types._

/** Debezium CDC data model, re-declared as Spark schemas.
  *
  * Mirrors the reference's envelope (`/root/reference/shared/models.py:41-88`
  * and `consumer/spark-streaming/spark_streaming.py:43-87`): a Kafka record
  * whose JSON value wraps `{payload: {before, after, source, op, ts_ms}}`.
  * `before`/`after` are kept as raw JSON strings (the reference does the
  * same "for flexibility", spark_streaming.py:59-60) — Spark's `from_json`
  * re-serializes object-valued fields declared StringType, so the inner
  * payloads survive verbatim for later per-table parsing.
  */
object Envelope {

  /** Debezium `source` block (spark_streaming.py:44-55). */
  val sourceSchema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("connector", StringType),
    StructField("name", StringType),
    StructField("ts_ms", LongType),
    StructField("snapshot", StringType),
    StructField("db", StringType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("txId", LongType),
    StructField("lsn", LongType)))

  /** `payload` block: op ∈ c/u/d/r, envelope ts_ms is epoch-millis. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("before", StringType),
    StructField("after", StringType),
    StructField("source", sourceSchema),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Full message value (spark_streaming.py:43-68). */
  val messageSchema: StructType = StructType(Seq(
    StructField("payload", payloadSchema)))

  /** The `cdc_events` append-only audit-log schema — 15 columns, exactly the
    * reference's (spark_streaming.py:70-87; init-scripts/datalake-init.sql:11-24). */
  val auditSchema: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("source_table", StringType),
    StructField("operation", StringType),
    StructField("operation_name", StringType),
    StructField("before_data", StringType),
    StructField("after_data", StringType),
    StructField("kafka_topic", StringType),
    StructField("kafka_partition", IntegerType),
    StructField("kafka_offset", LongType),
    StructField("event_timestamp", TimestampType),
    StructField("processed_at", TimestampType),
    StructField("source_db", StringType),
    StructField("source_schema", StringType),
    StructField("source_lsn", LongType),
    StructField("source_txid", LongType)))

  /** Raw-record shape our file/memory streaming source delivers — the exact
    * column set Spark's Kafka source would (spark_streaming.py:187-198);
    * swapping back to `format("kafka")` is a one-line change in production. */
  val kafkaRecordSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType)))

  /** Business-table schemas as parsed from Debezium JSON: timestamps arrive
    * as epoch-**micros** Longs (FIXTURES.md §A; database.py:20-27) and are
    * converted to TimestampType by [[Parse.typedSnapshotRows]]. */
  val tableJsonSchemas: Map[String, StructType] = Map(
    "customers" -> StructType(Seq(
      StructField("id", LongType),
      StructField("first_name", StringType),
      StructField("last_name", StringType),
      StructField("email", StringType),
      StructField("phone", StringType),
      StructField("created_at", LongType),
      StructField("updated_at", LongType))),
    "products" -> StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("description", StringType),
      StructField("price", DoubleType),
      StructField("stock_quantity", IntegerType),
      StructField("category", StringType),
      StructField("created_at", LongType),
      StructField("updated_at", LongType))),
    "orders" -> StructType(Seq(
      StructField("id", LongType),
      StructField("customer_id", LongType),
      StructField("order_date", LongType),
      StructField("status", StringType),
      StructField("total_amount", DoubleType),
      StructField("shipping_address", StringType),
      StructField("created_at", LongType),
      StructField("updated_at", LongType))),
    "order_items" -> StructType(Seq(
      StructField("id", LongType),
      StructField("order_id", LongType),
      StructField("product_id", LongType),
      StructField("quantity", IntegerType),
      StructField("unit_price", DoubleType),
      StructField("created_at", LongType))))

  /** Epoch-micros columns per table (Debezium temporal encoding). */
  val microsTimestampCols: Map[String, Seq[String]] = Map(
    "customers" -> Seq("created_at", "updated_at"),
    "products" -> Seq("created_at", "updated_at"),
    "orders" -> Seq("order_date", "created_at", "updated_at"),
    "order_items" -> Seq("created_at"))

  val tableNames: Seq[String] = Seq("customers", "products", "orders", "order_items")
}
