package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Dev probe: candidate volume + time of the prefix-filtered exact-jaccard
  * pipeline (vs the retired df-cap generator's ~1.1M candidates at sf0.1). */
object JaccProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[jaccprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warmup")(docs.count())
    val t = 0.5
    val sh = Dedup.docShingleHashes(docs, 3)
    println("[jaccprobe] shingle rows: " + time("shingle count")(sh.count()))
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
    val prefix = sh.join(dfreq, "h")
      .withColumn("rn", row_number().over(w.orderBy("df", "h")))
      .withColumn("sz", count(lit(1)).over(w))
      .filter(col("rn") <= col("sz") - ceil(lit(t) * col("sz")) + 1)
      .select("h", "doc_id", "sz")
    println("[jaccprobe] prefix rows: " + time("prefix")(prefix.count()))
    val cand = prefix.select(col("h"), col("doc_id").as("a_id"), col("sz").as("a_sz"))
      .join(prefix.select(col("h"), col("doc_id").as("b_id"), col("sz").as("b_sz")), Seq("h"))
      .filter(col("a_id") < col("b_id") &&
        col("b_sz") >= ceil(lit(t) * col("a_sz")) &&
        col("a_sz") >= ceil(lit(t) * col("b_sz")))
      .select("a_id", "b_id")
    println("[jaccprobe] cand pre-dedup: " + time("cand join")(cand.count()))
    println("[jaccprobe] cand distinct: " + time("cand distinct")(cand.distinct().count()))
    time("full current impl")(
      Dedup.ngramJaccardPairs(docs, 3, t).write.format("noop").mode("overwrite").save())
    time("full again")(
      Dedup.ngramJaccardPairs(docs, 3, t).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
