package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sim.Similarity

/** Dev probe: where does the banded-LSH near-dup time go? */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lshprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warmup count")(emb.count())
    val banded = Similarity.withLshBands(emb, 16, 8, 64, 42L)
    time("banded compute")(banded.write.format("noop").mode("overwrite").save())
    val probes = banded.select(col("band"),
      explode(array((col("bucket") +: (0 until 8).map(i =>
        col("bucket").bitwiseXOR(lit(1L << i)))): _*)).as("bucket"),
      col("vec_id").as("a_id"))
    val b = banded.select(col("band"), col("bucket"), col("vec_id").as("b_id"))
    val cand = probes.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id")).select("a_id", "b_id")
    println("[lshprobe] candidates pre-distinct: " + time("cand join")(cand.count()))
    val candD = cand.distinct()
    println("[lshprobe] candidates distinct: " + time("cand distinct")(candD.count()))
    time("full pipeline")(
      Dedup.embeddingNearDupsLsh(emb, 0.5).write.format("noop").mode("overwrite").save())
    time("full pipeline again")(
      Dedup.embeddingNearDupsLsh(emb, 0.5).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
