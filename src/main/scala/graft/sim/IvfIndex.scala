package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED form of the IVF+PQ index — what an indexing job writes
  * next to a 100 TB corpus so queries never touch the raw table except to
  * rerank a shortlist.
  *
  * Layout: one parquet table of (vec_id, codes, norm) hive-partitioned by
  * `centroid_id`. A probe lists only the `nprobe` partition directories
  * nearest the query (partition PRUNING, not filtering — the other
  * (k − nprobe)/k of the index is never opened, which is the entire point
  * of an inverted file), ADC-scores the ~16×-compressed codes inside them,
  * and reranks the shortlist exactly against the raw vectors by id — a
  * point-lookup join against the (id-clustered) corpus at scale.
  *
  * The in-memory [[Pq.ivfPqTopK]] is the same dataflow with a persisted
  * DataFrame standing in for the directory layout; this is the on-disk
  * production shape, and IvfIndexSpec asserts both that the plan's
  * partition count is `nprobe` and that results match the exact ranking.
  */
object IvfIndex {

  /** Build and persist the index: PQ-encode every vector and write the
    * codes partitioned by coarse-quantizer cell. One shuffle-free pass
    * over the corpus (the assignment join broadcasts k×dim centroids). */
  def write(emb: DataFrame, centroids: DataFrame, model: Pq.Model, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val assigned = Similarity.assignToCentroids(emb, centroids,
      idCol = idCol, vecCol = vecCol)
      .select("vec_id", "centroid_id")
    Pq.encode(emb, model, idCol, vecCol)
      .join(assigned, "vec_id")
      .write.mode("overwrite")
      .partitionBy("centroid_id")
      .parquet(path)
  }

  /** Incrementally index NEW vectors into an existing layout — the
    * steady-state indexing job (a full rebuild per ingest batch would scan
    * the corpus): assign the batch to the EXISTING centroids, PQ-encode
    * with the EXISTING codebooks, and append into the same
    * centroid-partitioned layout (dynamic partition overwrite is not
    * needed — append adds files inside each cell dir). Centroids/codebooks
    * drift from the true k-means of the grown corpus; the standard
    * practice this models is periodic re-training while incremental
    * appends carry the interval. */
  def append(newVecs: DataFrame, centroids: DataFrame, model: Pq.Model, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val assigned = Similarity.assignToCentroids(newVecs, centroids,
      idCol = idCol, vecCol = vecCol)
      .select("vec_id", "centroid_id")
    Pq.encode(newVecs, model, idCol, vecCol)
      .join(assigned, "vec_id")
      .write.mode("append")
      .partitionBy("centroid_id")
      .parquet(path)
  }

  /** Probe the persisted index: prune to the `nprobe` nearest cells via an
    * IN-list partition predicate (resolved against directory names at
    * planning — no data read outside them), then ADC-shortlist + exact
    * rerank. `centroids` is driver-resident index metadata (k×dim doubles),
    * exactly like the PQ codebooks. */
  def probe(spark: SparkSession, path: String, emb: DataFrame, model: Pq.Model,
      centroids: Array[(Long, Array[Double])], query: Seq[Double], k: Int,
      nprobe: Int, shortlist: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      excludeId: Option[Long] = None): DataFrame = {
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    def cos(c: Array[Double]): Double = {
      var dot = 0.0; var nc = 0.0; var i = 0
      while (i < c.length) { dot += c(i) * query(i); nc += c(i) * c(i); i += 1 }
      dot / (math.sqrt(nc) * qNorm)
    }
    val probed = centroids
      .sortBy { case (id, c) => (-cos(c), id) }
      .take(nprobe).map(_._1)
    val pruned = spark.read.parquet(path)
      .filter(col("centroid_id").isin(probed: _*))
    val codes = excludeId.fold(pruned)(id => pruned.filter(col("vec_id") =!= id))
      .select("vec_id", "codes", "norm")
    Pq.shortlistAndRerank(emb, codes, model, query, qNorm, k, shortlist, idCol, vecCol)
  }

  /** Collect the k×dim centroid table into the driver-resident metadata
    * form [[probe]] wants (bounded: k rows). */
  def localCentroids(centroids: DataFrame): Array[(Long, Array[Double])] =
    centroids.collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1).toArray))

  /** Index-quality statistics of a vector batch under the CURRENT coarse
    * quantizer: mean best-centroid cosine (quantization quality — falls
    * when the data distribution drifts away from the trained centroids)
    * and the max/mean cell-load ratio (imbalance — rises when drifting
    * data piles into few cells, which is what degrades probe pruning).
    * One assignment pass over the batch; k-bounded aggregate. */
  def assignmentStats(batch: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): (Double, Double) = {
    import org.apache.spark.sql.functions._
    val assigned = Similarity.assignToCentroids(batch, centroids,
      idCol = idCol, vecCol = vecCol)
    val cells = assigned.groupBy("centroid_id")
      .agg(count(lit(1)).as("n"), avg("centroid_score").as("s"))
      .collect()
    val total = cells.map(_.getAs[Long]("n")).sum.toDouble
    val meanScore = cells.map(r => r.getAs[Double]("s") * r.getAs[Long]("n")).sum / total
    val imbalance = cells.map(_.getAs[Long]("n")).max / (total / centroids.count())
    (meanScore, imbalance)
  }

  /** Re-train trigger — the [[graft.table.GraftTable.maybeMaterialize]]
    * pattern applied to index quality: periodic incremental [[append]]s
    * keep the interval cheap, and this decides when the interval ends.
    * Returns true when the new batch's mean quantization quality has
    * dropped below `minQualityRatio` of the base corpus's, or its cell
    * imbalance exceeds `maxImbalance` (a balanced quantizer loads cells
    * near 1×). */
  def needsRetrain(baseMeanScore: Double, batch: DataFrame, centroids: DataFrame,
      minQualityRatio: Double = 0.9, maxImbalance: Double = 4.0,
      idCol: String = "vec_id", vecCol: String = "embedding"): Boolean = {
    val (meanScore, imbalance) = assignmentStats(batch, centroids, idCol, vecCol)
    meanScore < baseMeanScore * minQualityRatio || imbalance > maxImbalance
  }
}
