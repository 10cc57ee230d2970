package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sim.{Pq, Similarity}

/** Dev probe: top-10 recall of the driver ANN queries (IVF / PQ / IVF+PQ,
  * with the exact index parameters CorpusQueries uses) vs the exact cosine
  * ranking, sweeping nprobe and shortlist — evidence for holding
  * q44/q48/q64 to the exact oracle (VERDICT r2 #2). */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val exact = Similarity.bruteForceTopK(emb, 0L, 10)
        .collect().map(_.getLong(0)).toSet
      val centroids = Similarity.trainCentroids(emb, k = 8, iters = 3)
      val assigned = Similarity.assignToCentroids(emb, centroids)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val model = Pq.train(emb, m = 8, k = 16, iters = 3, dim = 64)
      val codes = Pq.encode(emb, model)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      for (nprobe <- Seq(6, 7, 8)) {
        val got = Similarity.ivfTopK(emb, centroids, 0L, 10, nprobe = nprobe)
          .collect().map(_.getLong(0)).toSet
        println(s"[ann] $dir n=$n ivf nprobe=$nprobe recall=${(got & exact).size}/10")
      }
      for (shortlist <- Seq(64, 128, 256)) {
        val got = Pq.topK(emb, codes, model, 0L, 10, shortlist = shortlist)
          .collect().map(_.getLong(0)).toSet
        println(s"[ann] $dir n=$n pq shortlist=$shortlist recall=${(got & exact).size}/10")
      }
      for (nprobe <- Seq(6, 7, 8); shortlist <- Seq(64, 128, 256)) {
        val got = Pq.ivfPqTopK(emb, centroids, assigned, codes, model, 0L, 10,
          nprobe = nprobe, shortlist = shortlist)
          .collect().map(_.getLong(0)).toSet
        println(s"[ann] $dir n=$n ivfpq nprobe=$nprobe shortlist=$shortlist " +
          s"recall=${(got & exact).size}/10")
      }
      assigned.unpersist(); codes.unpersist()
    }
    spark.stop()
  }
}
