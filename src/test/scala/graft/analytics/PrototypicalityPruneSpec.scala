package graft.analytics

import graft.SparkSpec

/** Prototypicality pruning — q165 semantics on a label with a known
  * centroid: three copies of (1,0) and one (0,1) give centroid
  * (0.75, 0.25), so the (0,1) outlier has the LOWEST cosine (1/√10)
  * and is the single kept (hardest) example of the quartile.
  */
class PrototypicalityPruneSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private lazy val emb = Seq(
    (1L, Array(1.0f, 0.0f), 0),
    (2L, Array(1.0f, 0.0f), 0),
    (3L, Array(1.0f, 0.0f), 0),
    (4L, Array(0.0f, 1.0f), 0),
    (5L, Array(1.0f, 0.0f), 1),
    (6L, Array(0.0f, 1.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  private lazy val byLabel =
    CorpusQueries.prototypicalityPrune(emb).collect()
      .map(r => r.getInt(0) -> r).toMap

  test("hardest quartile is kept, border cosine exact") {
    val l0 = byLabel(0)
    assert(l0.getAs[Long]("n") === 4L)
    assert(l0.getAs[Long]("n_kept") === 1L)
    // the outlier (0,1): cos to centroid (0.75, 0.25) = 1/sqrt(10)
    assert(math.abs(l0.getAs[Double]("border_cosine")
      - 1.0 / math.sqrt(10.0)) < 1e-9)
  }

  test("kept fingerprint identifies exactly the pruned-in ids") {
    val l0 = byLabel(0)
    val expected = emb.sparkSession.sql("SELECT md5('4') AS h")
      .collect()(0).getString(0)
    assert(l0.getAs[String]("kept_fingerprint") === expected)
  }

  test("tiny labels keep at least one example") {
    val l1 = byLabel(1)
    assert(l1.getAs[Long]("n") === 2L)
    assert(l1.getAs[Long]("n_kept") === 1L)
  }

  test("output is label-cardinality-sized") {
    assert(CorpusQueries.prototypicalityPrune(emb)
      .filter(col("label").isin(0, 1)).count() === 2L)
  }
}
