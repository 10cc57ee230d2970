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
}
