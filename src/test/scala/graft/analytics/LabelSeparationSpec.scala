package graft.analytics

import graft.SparkSpec

/** Label-centroid separation — q164 semantics on centroids with known
  * exact cosines: label 0 along x, label 1 along y (orthogonal, cosine
  * 0), label 2 along the diagonal (cosine 1/√2 to both).
  */
class LabelSeparationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Seq(
    (1L, Array(1.0f, 0.0f), 0),
    (2L, Array(1.0f, 0.0f), 0),
    (3L, Array(0.0f, 1.0f), 1),
    (4L, Array(0.0f, 1.0f), 1),
    (5L, Array(1.0f, 1.0f), 2),
    (6L, Array(1.0f, 1.0f), 2)
  ).toDF("vec_id", "embedding", "label")

  private lazy val byPair =
    CorpusQueries.labelSeparation(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r).toMap

  test("pairwise centroid cosines are exact") {
    assert(byPair.keySet === Set((0, 1), (0, 2), (1, 2)))
    assert(byPair((0, 1)).getAs[Double]("centroid_cosine") === 0.0)
    assert(math.abs(byPair((0, 2)).getAs[Double]("centroid_cosine")
      - 1.0 / math.sqrt(2.0)) < 1e-12)
    assert(math.abs(byPair((1, 2)).getAs[Double]("centroid_cosine")
      - 1.0 / math.sqrt(2.0)) < 1e-12)
  }

  test("pair rows carry both label sizes") {
    assert(byPair((0, 1)).getAs[Long]("n_a") === 2L)
    assert(byPair((0, 1)).getAs[Long]("n_b") === 2L)
  }
}
