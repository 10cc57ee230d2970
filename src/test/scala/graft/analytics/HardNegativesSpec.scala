package graft.analytics

import graft.SparkSpec

/** Hard-negative mining — q166 semantics with one anchor whose query is
  * its first four tokens: a document sharing three query terms must
  * outrank one sharing a single term, the term-free document never
  * appears, and the anchor is excluded from its own negatives.
  */
class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "apple banana cherry date extra tail"),
    (1L, "apple banana cherry filler filler filler"),
    (2L, "apple zebra yak xylo filler filler"),
    (3L, "zebra yak xylo walrus filler filler")
  ).toDF("doc_id", "text")

  private lazy val negs =
    RetrievalQueries.hardNegatives(docs, nAnchors = 1L, negK = 5)
      .collect().sortBy(_.getAs[Long]("rank"))

  test("negatives rank by shared-term BM25, anchor excluded") {
    assert(negs.map(_.getAs[Long]("neg_id")).toSeq === Seq(1L, 2L))
    assert(negs.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L))
    assert(!negs.exists(_.getAs[Long]("neg_id") == 0L))
    assert(!negs.exists(_.getAs[Long]("neg_id") == 3L),
      "a document sharing no query term is not a candidate")
  }

  test("scores are positive and strictly ordered") {
    val scores = negs.map(_.getAs[Double]("score")).toSeq
    assert(scores.forall(_ > 0.0))
    assert(scores === scores.sorted.reverse)
  }
}
