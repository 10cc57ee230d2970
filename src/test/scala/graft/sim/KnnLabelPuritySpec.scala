package graft.sim

import graft.SparkSpec

/** kNN label purity — q157 semantics on a corpus with two tight cosine
  * clusters and one planted outlier: vectors 1–3 (label 0) point along x,
  * vectors 4–6 (label 1) along y, and vector 7 (label 0) sits INSIDE the
  * y cluster — at k=3 its neighbors all vote label 1, so label 0's
  * accuracy drops to 3/4, while each y-cluster vector still carries a
  * 2-of-3 label-1 majority (the outlier IS their top neighbor, the vote
  * absorbs it) and label 1 stays perfect.
  */
class KnnLabelPuritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Seq(
    (1L, Array(1.0f, 0.0f), 0),
    (2L, Array(0.9f, 0.1f), 0),
    (3L, Array(0.8f, 0.2f), 0),
    (4L, Array(0.0f, 1.0f), 1),
    (5L, Array(0.1f, 0.9f), 1),
    (6L, Array(0.2f, 0.8f), 1),
    (7L, Array(0.05f, 0.95f), 0)
  ).toDF("vec_id", "embedding", "label")

  private lazy val byLabel =
    Similarity.knnLabelPurity(emb, k = 3).collect()
      .map(r => r.getInt(0) -> r).toMap

  test("per-label accuracy reflects the planted outlier") {
    assert(byLabel(0).getAs[Long]("n") === 4L)
    assert(byLabel(0).getAs[Long]("correct") === 3L)
    assert(byLabel(0).getAs[Double]("accuracy") === 0.75)
    assert(byLabel(1).getAs[Long]("n") === 3L)
    assert(byLabel(1).getAs[Double]("accuracy") === 1.0)
  }

  test("every label appears exactly once in the report") {
    assert(byLabel.keySet === Set(0, 1))
  }

  // --- q214: the sampled + LSH-bucketed 100 TB shape -------------------

  /** 16-dim corpus with two sign-separated clusters: label 0 lives in the
    * all-positive orthant, label 1 in the all-negative one, so every sign
    * band agrees within a cluster and disagrees across — candidates are
    * exactly the intra-cluster pairs. Sampled queries (vec_id % 4 == 0)
    * are 4 (label 0) and 8 (label 1). */
  private lazy val emb16 = {
    def v(sign: Double, jitter: Double): Array[Float] =
      Array.tabulate(16)(i => (sign * (0.5 + jitter * (i + 1) / 100.0)).toFloat)
    Seq(
      (1L, v(+1, 0.1), 0), (2L, v(+1, 0.2), 0),
      (3L, v(+1, 0.3), 0), (4L, v(+1, 0.4), 0),
      (5L, v(-1, 0.1), 1), (6L, v(-1, 0.2), 1),
      (7L, v(-1, 0.3), 1), (8L, v(-1, 0.4), 1)
    ).toDF("vec_id", "embedding", "label")
  }

  test("sampled variant: purity over LSH candidates, sample rows only") {
    val rows = Similarity.knnLabelPuritySampled(emb16, k = 3)
      .collect().map(r => r.getInt(0) -> r).toMap
    // one sampled query per label, each voted pure by its own cluster
    assert(rows.keySet === Set(0, 1))
    assert(rows(0).getAs[Long]("n") === 1L)
    assert(rows(1).getAs[Long]("n") === 1L)
    assert(rows(0).getAs[Double]("accuracy") === 1.0)
    assert(rows(1).getAs[Double]("accuracy") === 1.0)
  }

  // --- q215: candidate recall of the LSH shape vs exact ranks ----------

  test("recall sweep quantifies candidate misses per (bands, bits)") {
    // A query whose TRUE nearest neighbor flips one sign (different band
    // signature → not a candidate) while a far same-orthant vector IS a
    // candidate: the sweep must report the miss, not flatter the LSH.
    val emb4 = Seq(
      (0L, Array(0.7f, 0.7f, 0.7f, 0.7f), 0),    // sampled query
      (1L, Array(0.9f, 0.9f, 0.9f, -0.01f), 0),  // true NN, dim-4 sign flip
      (2L, Array(0.01f, 0.01f, 0.01f, 0.99f), 0) // same orthant, far
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.lshRecallSweep(emb4, k = 1, configs = Seq((1, 4)))
      .collect().head
    assert(r.getAs[Long]("n_queries") === 1L)
    assert(r.getAs[Long]("exact_pairs") === 1L)
    assert(r.getAs[Long]("hits") === 0L)
    assert(r.getAs[Double]("recall_at_k") === 0.0)

    // On the sign-separated corpus every exact neighbor shares every
    // band, so recall is 1.0 at any config that fits the 16 dims.
    val full = Similarity.lshRecallSweep(emb16, k = 3,
      configs = Seq((2, 4), (4, 4))).collect()
    assert(full.length === 2)
    assert(full.forall(_.getAs[Long]("n_queries") === 2L))
    assert(full.forall(_.getAs[Long]("exact_pairs") === 6L))
    assert(full.forall(_.getAs[Double]("recall_at_k") === 1.0))
  }

  test("sampled variant plans NO cartesian/nested-loop join; exact does") {
    val sampledPlan = Similarity.knnLabelPuritySampled(emb16, k = 3)
      .queryExecution.executedPlan.toString
    assert(!sampledPlan.contains("CartesianProduct"), sampledPlan)
    assert(!sampledPlan.contains("BroadcastNestedLoopJoin"), sampledPlan)
    // contrast: the exact eval IS the quadratic shape (its contract)
    val exactPlan = Similarity.knnLabelPurity(emb16, k = 3)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("CartesianProduct") ||
      exactPlan.contains("BroadcastNestedLoopJoin"))
  }
}
