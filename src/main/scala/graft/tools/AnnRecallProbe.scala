package graft.tools

import org.apache.spark.sql.SparkSession

import graft.analytics.CorpusQueries
import graft.analytics.CorpusQueries.AnnParams
import graft.sim.{Pq, Similarity}

/** Dev probe: top-10 recall of the driver ANN queries (IVF / PQ / IVF+PQ)
  * vs the exact cosine ranking, sweeping nprobe and shortlist AROUND the
  * shared production parameters ([[CorpusQueries.AnnParams]] — consumed,
  * not re-stated, so the probe cannot drift from the queries it vouches
  * for). This sweep is the evidence that holds q44/q48/q64 to the exact
  * cosine oracle. */
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
      val idx = CorpusQueries.annIndex(spark, dir)
      for (nprobe <- Seq(AnnParams.nprobe - 1, AnnParams.nprobe)) {
        val got = Similarity.ivfTopK(emb, idx.centroids, 0L, 10, nprobe = nprobe,
          assigned = Some(idx.assigned))
          .collect().map(_.getLong(0)).toSet
        println(s"[ann] $dir n=$n ivf nprobe=$nprobe recall=${(got & exact).size}/10")
      }
      for (shortlist <- Seq(AnnParams.shortlist / 2, AnnParams.shortlist)) {
        val got = Pq.topK(emb, idx.codes, idx.model, 0L, 10, shortlist = shortlist)
          .collect().map(_.getLong(0)).toSet
        println(s"[ann] $dir n=$n pq shortlist=$shortlist recall=${(got & exact).size}/10")
      }
      for (nprobe <- Seq(AnnParams.nprobe - 1, AnnParams.nprobe);
           shortlist <- Seq(AnnParams.shortlist / 2, AnnParams.shortlist)) {
        val got = Pq.ivfPqTopK(emb, idx.centroids, idx.assigned, idx.codes, idx.model,
          0L, 10, nprobe = nprobe, shortlist = shortlist)
          .collect().map(_.getLong(0)).toSet
        println(s"[ann] $dir n=$n ivfpq nprobe=$nprobe shortlist=$shortlist " +
          s"recall=${(got & exact).size}/10")
      }
    }
    spark.stop()
  }
}
