package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sim.{Pq, Similarity}

/** Dev probe: PQ / IVF+PQ top-10 recall across codebook geometries (m, k)
  * and shortlist sizes — picks the config that holds full recall on the
  * gaussian-noise driver corpus (PQ's worst case) at every test SF. */
object PqConfigProbe {
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
      for ((m, k) <- Seq((8, 64), (8, 128), (8, 256), (16, 16), (16, 64))) {
        val model = Pq.train(emb, m = m, k = k, iters = 3, dim = 64)
        val codes = Pq.encode(emb, model)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        for (shortlist <- Seq(64, 128, 256)) {
          val got = Pq.topK(emb, codes, model, 0L, 10, shortlist = shortlist)
            .collect().map(_.getLong(0)).toSet
          println(s"[pqcfg] $dir n=$n pq m=$m k=$k shortlist=$shortlist " +
            s"recall=${(got & exact).size}/10")
          val got2 = Pq.ivfPqTopK(emb, centroids, assigned, codes, model, 0L, 10,
            nprobe = 7, shortlist = shortlist)
            .collect().map(_.getLong(0)).toSet
          println(s"[pqcfg] $dir n=$n ivfpq nprobe=7 m=$m k=$k shortlist=$shortlist " +
            s"recall=${(got2 & exact).size}/10")
        }
        codes.unpersist()
      }
      assigned.unpersist()
    }
    spark.stop()
  }
}
