package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Dev probe: does the PPJoin positional filter actually prune candidate
  * pairs at a given SF/threshold, and what does each stage cost? */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val t = args.lift(1).map(_.toDouble).getOrElse(0.8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ppjoin] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sh = Dedup.docShingleHashes(docs, 3)
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
    val prefix = sh.join(dfreq, "h")
      .withColumn("rn", row_number().over(w.orderBy("df", "h")))
      .withColumn("sz", count(lit(1)).over(w))
      .filter(col("rn") <= col("sz") - ceil(lit(t) * col("sz")) + 1)
      .select("h", "doc_id", "sz", "rn")
      .cache()
    println("[ppjoin] prefix rows: " + time("prefix")(prefix.count()))
    val joined = prefix.select(col("h"), col("doc_id").as("a_id"),
        col("sz").as("a_sz"), col("rn").as("a_rn"))
      .join(prefix.select(col("h"), col("doc_id").as("b_id"),
        col("sz").as("b_sz"), col("rn").as("b_rn")), Seq("h"))
      .filter(col("a_id") < col("b_id") &&
        col("b_sz") >= ceil(lit(t) * col("a_sz")) &&
        col("a_sz") >= ceil(lit(t) * col("b_sz")))
    println("[ppjoin] match rows (pre-positional): " + time("match")(joined.count()))
    val pos = joined.filter(
      least(col("a_rn"), col("b_rn")) +
        least(col("a_sz") - col("a_rn"), col("b_sz") - col("b_rn")) >=
        ceil(lit(t / (1.0 + t)) * (col("a_sz") + col("b_sz"))))
    println("[ppjoin] match rows (post-positional): " + time("pos")(pos.count()))
    println("[ppjoin] pairs pre:  " + time("pairs pre")(
      joined.select("a_id", "b_id").distinct().count()))
    println("[ppjoin] pairs post: " + time("pairs post")(
      pos.select("a_id", "b_id").distinct().count()))
    spark.stop()
  }
}
