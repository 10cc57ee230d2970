package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage timings for the near-dup pipelines. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.Tables.documents(spark, sfDir)
    val sh = time("shingle-stage") {
      val p = java.nio.file.Files.createTempDirectory("probe-sh-").toString
      graft.dedup.Dedup.docShingles(docs, 3).write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    println("PROBE shingles=" + time("count-sh")(sh.count()))
    val sig = time("signatures") {
      val s = graft.dedup.Dedup.signaturesFromShingles(sh, 32, 42L)
      s.count(); s
    }
    val cand = time("candidates") {
      val c = graft.dedup.Dedup.minhashCandidates(sig, 32, 8)
      println("PROBE cand=" + c.count()); c
    }
    time("verify") {
      println("PROBE pairs=" + graft.dedup.Dedup
        .minhashNearDups(docs, 3, 32, 8, 0.5).count())
    }
    spark.stop()
  }
}
