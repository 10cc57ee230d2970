package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.Tables

/** Source/sink format surface beyond parquet: CSV and JSON round-trips with
  * explicit schemas (the engine's ingest/export paths; the reference's data
  * interchange is JSON throughout — Debezium envelopes, JSONB columns). */
class SourceFormatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("CSV round-trip with explicit schema and header") {
    val out = tmpDir("fmt-csv")
    val src = Tables.nation(spark, dir)
    src.write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val back = spark.read.schema(schema).option("header", "true").csv(out)
    assert(back.orderBy("n_nationkey").collect().toSeq ===
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("JSON-lines round-trip preserves types under explicit schema") {
    val out = tmpDir("fmt-json")
    val src = Tables.region(spark, dir)
      .withColumn("tags", array(lit("a"), lit("b")))
      .withColumn("meta", struct(lit(1L).as("x"), lit("y").as("s")))
    src.write.mode("overwrite").json(out)
    val back = spark.read.schema(src.schema).json(out)
    assert(back.orderBy("r_regionkey").collect().toSeq ===
      src.orderBy("r_regionkey").collect().toSeq)
    assert(back.schema("meta").dataType.isInstanceOf[StructType])
  }
}
