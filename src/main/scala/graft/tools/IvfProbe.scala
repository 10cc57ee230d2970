package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sim.Similarity

/** Dev probe: IVF recall vs brute force across (k, nprobe) configs. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val brute = Similarity.bruteForceTopK(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    for (k <- Seq(8, 16); nprobe <- Seq(k / 2, k * 5 / 8, k * 3 / 4, k * 7 / 8)) {
      val cents = Similarity.trainCentroids(emb, k = k, iters = 3)
      val got = Similarity.ivfTopK(emb, cents, 0L, 10, nprobe = nprobe)
        .collect().map(_.getLong(0)).toSet
      println(s"[ivfprobe] k=$k nprobe=$nprobe overlap=${(got & brute).size}/10")
    }
    spark.stop()
  }
}
