package graft.analytics

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Leakage-safe split — q168 semantics: split assignment hashes the
  * duplicate-cluster id, so every member of a near-dup cluster lands in
  * the same split, and singletons reproduce exactly the per-doc q59
  * assignment (cluster_id == doc_id there).
  */
class LeakageSafeSplitSpec extends SparkSpec {
  import spark.implicits._

  // two near-identical docs (one cluster) + two unrelated singletons
  private lazy val docs = Seq(
    (10L, "alpha beta gamma delta epsilon zeta eta theta"),
    (11L, "alpha beta gamma delta epsilon zeta eta iota"),
    (20L, "one two three four five six seven eight"),
    (30L, "red orange yellow green blue indigo violet umber")
  ).toDF("doc_id", "text")

  private lazy val split = CorpusQueries.leakageSafeSplit(
    Dedup.duplicateClusters(docs,
      Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)))
    .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("near-dup cluster members share one split") {
    assert(split(10L).getAs[Long]("cluster_id") === 10L)
    assert(split(11L).getAs[Long]("cluster_id") === 10L)
    assert(split(10L).getAs[String]("split") === split(11L).getAs[String]("split"))
    assert(split(10L).getAs[Long]("bucket") === split(11L).getAs[Long]("bucket"))
  }

  test("singletons reproduce the per-doc hash split exactly") {
    val perDoc = docs.sparkSession.createDataFrame(
      Seq(Tuple1(20L), Tuple1(30L))).toDF("doc_id")
      .select(col("doc_id"),
        (SamplingQueries.md5Bucket32(col("doc_id")) % 1000).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(split(20L).getAs[Long]("bucket") === perDoc(20L))
    assert(split(30L).getAs[Long]("bucket") === perDoc(30L))
  }

  test("every document is assigned exactly once") {
    assert(split.keySet === Set(10L, 11L, 20L, 30L))
    assert(split.values.forall(r =>
      Set("train", "val", "test")(r.getAs[String]("split"))))
  }
}
