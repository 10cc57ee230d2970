package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.Tables
import graft.cdc.Parse

/** Oracle-checked phrasings of the scalar-expression surface (SURVEY §2.2 /
  * §2.8) over the `events` table — the JSON parse, concat, cast, CASE,
  * date_trunc, date_format, epoch conversion and coalesce family the
  * reference uses in its streaming transform and views. All plain
  * `functions._` columns: whole-stage-codegen'd end to end. */
object ScalarQueries {

  /** P1/P3: typed JSON field extraction with `from_json`
    * (spark_streaming.py:211-219, 332-341). */
  def jsonParse(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        from_json(col("props"), schema).getField("k").as("k"))
  }

  /** P5-P8, P12-P14: one projection through the whole scalar family —
    * concat_ws event key (spark_streaming.py:228-231), CASE op decode
    * (:236-243), date_trunc (init-risingwave.sql:75), date_format
    * (spark_delta_handler.py:138-139), epoch-millis conversion (:233),
    * coalesce (init-risingwave.sql:91). */
  def scalarSurface(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      concat_ws("-", col("event_type"), col("user_id")).as("event_key"),
      Parse.opName(
        when(col("event_type") === "signup", "c")
          .when(col("event_type") === "purchase", "u")
          .when(col("event_type") === "error", "d")
          .otherwise("r")).as("op_name"),
      date_trunc("hour", col("ts")).as("ts_hour"),
      date_format(col("ts"), "yyyy-MM-dd").as("ts_day"),
      unix_millis(col("ts")).as("ts_ms"),
      coalesce(col("value"), lit(0.0)).as("value_filled"))

  /** A7: count-by-value over the op-decode — events per (type, op-name)
    * (notebook cell 15; datalake-init.sql:116-125 cdc_statistics shape:
    * count + min/max event time per group). */
  def eventStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("event_count"),
        min(col("ts")).as("first_seen"),
        max(col("ts")).as("last_seen"),
        countDistinct(col("user_id")).as("distinct_users"))
      .orderBy(col("event_type"))
}
