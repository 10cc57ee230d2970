package graft.analytics

import graft.SparkSpec

/** Dedup threshold sweep — q160 semantics on a corpus with pairs planted
  * at known exact Jaccard levels over 3-gram shingle sets:
  *   - docs 1/2 identical (J = 1.0: above every threshold),
  *   - docs 3/4 share 4 of their 6+6 distinct shingles
  *     (J = 4/8 = 0.5: counted ONLY at threshold 0.5),
  *   - doc 5 shares nothing.
  */
class ThresholdSweepSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b c d e f g h"),
    (2L, "a b c d e f g h"),
    // 8 tokens -> 6 shingles; the first 6 tokens (4 shingles) shared
    (3L, "p q r s t u x1 x2"),
    (4L, "p q r s t u y1 y2"),
    (5L, "m n o m n o m n o")
  ).toDF("doc_id", "text")

  private lazy val rows =
    CorpusQueries.dedupThresholdSweep(spark, docs).collect()
      .map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("every threshold appears, counts are exact") {
    assert(rows.keySet === Set(0.5, 0.6, 0.7, 0.8, 0.9))
    // at 0.5 both pairs qualify -> 2 pairs over 4 distinct docs
    assert(rows(0.5) === ((2L, 4L)))
    // above 0.5 only the identical pair survives
    Seq(0.6, 0.7, 0.8, 0.9).foreach { t =>
      assert(rows(t) === ((1L, 2L)), s"threshold $t")
    }
  }

  test("counts are monotone non-increasing in the threshold") {
    val sorted = rows.toSeq.sortBy(_._1).map(_._2)
    sorted.sliding(2).foreach {
      case Seq((p1, d1), (p2, d2)) => assert(p2 <= p1 && d2 <= d1)
      case _ =>
    }
  }
}
