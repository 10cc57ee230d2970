package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // Run the driver gate with the full extension surface active: the
      // row_number-to-TopKPerKey optimizer rule and the injected SQL
      // functions then face the same DuckDB oracles as everything else.
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // INT96 (Spark's legacy default) writes NO footer statistics —
      // standard TIMESTAMP_MICROS restores min/max for timestamp columns,
      // powering both graft dir-stats and exported Delta per-file stats.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter: SPARK_GRAFT_VERIFY_ONLY=q149,q150 dumps just
    // those queries. The driver never sets it, so the gate stays complete.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try {
        // Timestamp OUTPUTS dump as NTZ: TIMESTAMP_MICROS marks
        // TimestampType isAdjustedToUTC=true, which the driver's
        // comparator reads tz-AWARE while the DuckDB oracle side is
        // naive. NTZ under the UTC session zone is the same wall-clock
        // with the naive physical annotation INT96 used to read as —
        // result bytes match every prior round.
        val df = fn(spark, sfDir)
        val ntz = df.schema.fields.foldLeft(df) { (d, f) =>
          if (f.dataType == org.apache.spark.sql.types.TimestampType)
            d.withColumn(f.name, org.apache.spark.sql.functions.col(s"`${f.name}`")
              .cast(org.apache.spark.sql.types.TimestampNTZType))
          else d
        }
        ntz.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
