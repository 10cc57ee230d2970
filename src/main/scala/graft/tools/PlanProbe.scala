package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the formatted executed plan of named driver queries —
  * the `.explain("formatted")` audit loop (pushdown reaching the scan,
  * broadcast vs shuffle joins, WholeStageCodegen spans) without writing a
  * throwaway main each time.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.tools.PlanProbe q7_revenue_per_nation …"
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      // Stage surfaces for queries that collect internally (their outer
      // plan is just the local result frame).
      if (name == "q216_sketch_stage") {
        println(s"=== $name ===")
        graft.analytics.CorpusQueries.kmvSketchStageFor(spark, sfDir)
          .explain("formatted")
      } else if (name == "q215_candidate_stage") {
        println(s"=== $name ===")
        graft.sim.Similarity.lshCandidateStageFor(spark, sfDir)
          .explain("formatted")
      } else graft.SparkEntry.queries.get(name) match {
        case None => println(s"=== $name: no such query ===")
        case Some(fn) =>
          println(s"=== $name ===")
          fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
