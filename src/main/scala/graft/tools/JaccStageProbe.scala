package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Dev probe: cumulative noop-timed stages of the prefix-filter jaccard. */
object JaccStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    docs.count()
    val t = 0.5
    // warm everything once
    time("full warm")(noop(Dedup.ngramJaccardPairs(docs, 3, t)))
    val sh0 = Dedup.docShingleHashes(docs, 3)
    time("a: shingles noop")(noop(sh0))
    val sh = time("a2: stage write+read")(
      { val p = java.nio.file.Files.createTempDirectory("jprobe-").toString + "/sh"
        sh0.write.mode("overwrite").parquet(p); spark.read.parquet(p) })
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    time("b: +dfreq")(noop(dfreq))
    val w = Window.partitionBy("doc_id")
    val prefix = sh.join(dfreq, "h")
      .withColumn("rn", row_number().over(w.orderBy("df", "h")))
      .withColumn("sz", count(lit(1)).over(w))
      .filter(col("rn") <= col("sz") - ceil(lit(t) * col("sz")) + 1)
      .select("h", "doc_id", "sz")
    time("c: +window prefix")(noop(prefix))
    val cand = prefix.select(col("h"), col("doc_id").as("a_id"), col("sz").as("a_sz"))
      .join(prefix.select(col("h"), col("doc_id").as("b_id"), col("sz").as("b_sz")), Seq("h"))
      .filter(col("a_id") < col("b_id") &&
        col("b_sz") >= ceil(lit(t) * col("a_sz")) &&
        col("a_sz") >= ceil(lit(t) * col("b_sz")))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n"))
      .select("a_id", "b_id")
    time("d: +cand pairs")(noop(cand))
    val sets = Dedup.docShingleSets(docs, 3)
    val out = cand
      .join(sets.select(col("doc_id").as("a_id"), col("shset").as("a_set")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("shset").as("b_set")), "b_id")
      .withColumn("common", size(array_intersect(col("a_set"), col("b_set"))))
      .withColumn("jaccard", col("common").cast("double")
        / (size(col("a_set")) + size(col("b_set")) - col("common")))
      .filter(col("jaccard") >= t)
      .select("a_id", "b_id", "jaccard")
    time("e: +verify (full, unstaged sh)")(noop(out))
    time("full again")(noop(Dedup.ngramJaccardPairs(docs, 3, t)))

    // Gate-flip check: the staging gate keys on REAL leaf-scan bytes × the
    // measured expansion ceiling, so replicating the corpus k× moves the
    // physical estimate k× — the flip lands where staged bytes actually
    // cross the threshold, independent of what the optimizer guesses for
    // the explode. Threshold pinned at 3× the single-copy estimate: k=1,2
    // must stay unstaged, k=4,8 must stage.
    val one = Dedup.stagedBytesEstimate(Dedup.docShingleHashes(docs, 3))
    spark.conf.set("spark.graft.stage.threshold", (one * 3).toString)
    Seq(1, 2, 4, 8).foreach { k =>
      val rep = Seq.fill(k)(docs).reduce(_ unionByName _)
      val est = Dedup.stagedBytesEstimate(Dedup.docShingleHashes(rep, 3))
      val staged = est >= BigInt(spark.conf.get("spark.graft.stage.threshold"))
      println(s"[gate] k=$k physicalEstimate=$est threshold=${one * 3} staged=$staged")
      assert(staged == (k >= 4), s"gate flipped at the wrong size (k=$k)")
    }
    spark.conf.unset("spark.graft.stage.threshold")
    println("[gate] flip at the intended physical size: OK")
    spark.stop()
  }
}
