package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Dev probe: where does the df-capped exact-jaccard time go? */
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
    val sh = Dedup.docShingles(docs, 3)
    time("shingles compute")(sh.write.format("noop").mode("overwrite").save())
    println("[jaccprobe] shingle rows: " + time("shingle count")(sh.count()))
    val rare = sh.groupBy("shingle").agg(count(lit(1)).as("df")).filter(col("df") <= 20)
    println("[jaccprobe] rare shingles: " + time("df cap")(rare.count()))
    val pruned = sh.join(rare, "shingle")
    println("[jaccprobe] pruned rows: " + time("prune join")(pruned.count()))
    val a = pruned.select(col("shingle"), col("doc_id").as("a_id"))
    val b = pruned.select(col("shingle"), col("doc_id").as("b_id"))
    val cand = a.join(b, Seq("shingle")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
    println("[jaccprobe] cand pre-distinct: " + time("cand join")(cand.count()))
    println("[jaccprobe] cand distinct: " + time("cand distinct")(cand.distinct().count()))
    time("full current impl")(
      Dedup.ngramJaccardPairs(docs, 3, 0.5, 20).write.format("noop").mode("overwrite").save())
    time("full again")(
      Dedup.ngramJaccardPairs(docs, 3, 0.5, 20).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
