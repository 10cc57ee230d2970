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

  test("recall sweep surfaces per-query floor and candidate fan-out") {
    val r = Similarity.lshRecallSweep(emb16, k = 3, configs = Seq((2, 4)))
      .collect().head
    // both sampled queries find all 3 exact neighbors → floor = pooled
    assert(r.getAs[Double]("min_recall") === 1.0)
    assert(r.getAs[Double]("p10_recall") === 1.0)
    // fan-out = pre-dedup band-join pairs: each cluster is one bucket per
    // band (4 members, 1 sampled) → per band Σ qc·(ac−1) = 2·(1·3) = 6,
    // × 2 bands = 12
    assert(r.getAs[Long]("candidates") === 12L)
  }

  // --- centering: the all-positive-orthant degeneracy ------------------

  /** Axis-aligned signs put EVERY all-positive vector in bucket 2^bits−1
    * of every band — the equi-join silently becomes the quadratic pair
    * space. Mean-centered signs split each dimension at its corpus mean,
    * so structure inside the positive orthant is still discriminated. */
  test("all-positive embeddings: centered signs keep buckets bounded") {
    val allPos = Seq(
      (0L, Array(0.9f, 0.1f, 0.9f, 0.1f), 0),
      (1L, Array(0.1f, 0.9f, 0.1f, 0.9f), 1),
      (2L, Array(0.9f, 0.9f, 0.1f, 0.1f), 2),
      (3L, Array(0.1f, 0.1f, 0.9f, 0.9f), 3)
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.lshRecallSweep(allPos, k = 1, sampleMod = 1,
      configs = Seq((1, 4))).collect().head
    // raw signs: one bucket of 4 → fan-out 4·3 = 12; centered: every
    // vector gets a distinct signature → zero candidate pairs, and the
    // report SAYS so (recall 0, candidates 0) instead of flattering
    assert(r.getAs[Long]("candidates") === 0L)
    assert(r.getAs[Long]("hits") === 0L)
    assert(r.getAs[Double]("min_recall") === 0.0)
  }

  test("all-positive embeddings: centering still finds in-orthant clusters") {
    // two tight clusters INSIDE the positive orthant; raw signs cannot
    // tell them apart (single bucket), centered signs give one bucket
    // per cluster → intra-cluster candidates only, perfect recall
    def va(j: Float) = Array(0.9f + j, 0.9f + j, 0.1f + j, 0.1f + j)
    def vb(j: Float) = Array(0.1f + j, 0.1f + j, 0.9f + j, 0.9f + j)
    val clustered = Seq(
      (0L, va(0.00f), 0), (1L, va(0.01f), 0),
      (2L, vb(0.00f), 1), (3L, vb(0.01f), 1)
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.lshRecallSweep(clustered, k = 1, sampleMod = 1,
      configs = Seq((1, 4))).collect().head
    assert(r.getAs[Double]("recall_at_k") === 1.0)
    assert(r.getAs[Double]("min_recall") === 1.0)
    // 2 buckets of 2, every vector sampled → Σ qc·(ac−1) = 2·(2·1) = 4
    assert(r.getAs[Long]("candidates") === 4L)
  }

  test("q215 candidate stage plans ONE composite-key join, not per-band joins") {
    // Optimization-round-12 shape pin: both sides explode to
    // (id, bits, band, sg) rows and a single equi-join on the composite
    // key replaces the 16 per-band joins — a regression to per-leg joins
    // multiplies the join count back out.
    import org.apache.spark.sql.functions.col
    val v = emb16.select(col("vec_id"),
      col("embedding").cast("array<double>").as("vec"))
    // two bits-families (4 and 8), four (bits, band) legs in 16 dims
    val (mbs, _) = Similarity.lshCandidateStage(
      v, 4, Seq((1, 4), (2, 4), (2, 8)))
    val joins = mbs.queryExecution.optimizedPlan.collectWithSubqueries {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size === 1,
      s"expected ONE candidate join, got ${joins.size}")
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
