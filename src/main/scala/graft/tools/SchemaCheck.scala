package graft.tools
import org.apache.spark.sql.SparkSession
object SchemaCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- Seq("events", "orders", "lineitem", "embeddings")) {
      println(s"== $t")
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").printSchema()
    }
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").selectExpr("min(ts)", "max(ts)", "typeof(min(ts))").show(false)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").selectExpr("size(embedding)").distinct().show()
    spark.stop()
  }
}
