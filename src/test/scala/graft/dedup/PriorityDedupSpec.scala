package graft.dedup

import graft.SparkSpec

/** Quality-priority dedup — q158 semantics: docs 1/2/3 share a bag of
  * words but differ in length and repetition, so their quality scores
  * differ; the keeper must be the highest-quality member, NOT the
  * smallest id (doc 1 is deliberately the short low-quality one).
  */
class PriorityDedupSpec extends SparkSpec {
  import spark.implicits._

  // same token SET {the, quick, fox}; doc 3 is longest (best length
  // score) and stopword-bearing, doc 1 shortest
  private lazy val docs = Seq(
    (1L, "quick fox the"),
    (2L, "the quick fox the quick fox"),
    (3L, "the quick fox the quick fox the quick fox the quick fox"),
    (4L, "lonely unique document")
  ).toDF("doc_id", "text")

  private lazy val rows = Dedup.priorityDedup(docs).collect()

  test("keeper is the highest-quality member, not the smallest id") {
    val grp = rows.find(_.getAs[Long]("dup_count") == 3L).get
    assert(grp.getAs[Long]("keeper_id") === 3L)
  }

  test("keeper_quality equals the keeper's own quality score") {
    import org.apache.spark.sql.functions._
    val grp = rows.find(_.getAs[Long]("dup_count") == 3L).get
    val q3 = docs.filter(col("doc_id") === 3L)
      .select(graft.text.TextFunctions.qualityScore(col("text")))
      .head().getDouble(0)
    assert(grp.getAs[Double]("keeper_quality") === q3)
  }

  test("singleton groups pass through with dup_count 1") {
    val single = rows.find(_.getAs[Long]("keeper_id") == 4L).get
    assert(single.getAs[Long]("dup_count") === 1L)
  }
}
