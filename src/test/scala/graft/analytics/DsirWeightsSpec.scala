package graft.analytics

import graft.SparkSpec

/** DSIR-shaped importance weighting — q156 semantics on a corpus where the
  * expected fixed-point scores are hand-computable:
  *
  *   target (en) vocabulary counts: alpha 4, beta 4
  *   raw (non-en) counts:           alpha 2, beta 2, gamma 2, delta 2
  *   r(alpha) = r(beta)  = (4+1)*1e6 // (2+1) = 1666666
  *   r(gamma) = r(delta) = (0+1)*1e6 // (2+1) = 333333
  */
class DsirWeightsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "en", "alpha beta alpha beta"),
    (2L, "en", "alpha alpha beta beta"),
    (3L, "fr", "alpha beta alpha beta"),
    (4L, "de", "gamma delta gamma delta")
  ).toDF("doc_id", "lang", "text")

  private lazy val byDoc =
    CorpusQueries.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> r).toMap

  test("fixed-point likelihood-ratio scores are exact integers") {
    // 4 tokens x 1666666 each
    assert(byDoc(3L).getAs[Long]("score") === 4L * 1666666L)
    // 4 tokens x 333333 each
    assert(byDoc(4L).getAs[Long]("score") === 4L * 333333L)
    assert(byDoc(3L).getAs[Double]("importance") === 4.0 * 1666666L / 4e6)
  }

  test("a raw doc drawn from the target vocabulary outranks a disjoint one") {
    assert(byDoc(3L).getAs[Double]("importance") >
      byDoc(4L).getAs[Double]("importance"))
  }

  test("top-quartile gate selects ceil(n/4) docs with deterministic tiebreak") {
    val selected = byDoc.values.filter(_.getAs[Boolean]("selected")).toSeq
    assert(selected.size === 1) // (4+3) DIV 4
    // docs 1/2/3 tie on importance; doc_id breaks the tie
    assert(selected.head.getLong(0) === 1L)
  }
}
