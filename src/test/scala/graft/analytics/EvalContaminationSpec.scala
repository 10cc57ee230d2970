package graft.analytics

import graft.SparkSpec

/** Eval-side contamination — q170 semantics on a corpus where one eval
  * doc is verbatim-contained in train (fraction 1, flagged), one shares
  * a single 8-gram window (small fraction, unflagged), and one shares
  * nothing (zero row survives the left join with zeros).
  */
class EvalContaminationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "a b c d e f g h i"),                      // eval: fully inside doc 10
    (1L, "a b c d e f g h z1 z2 z3 z4 z5"),         // eval: shares 1 of 6 grams
    (2L, "p q r s t u v w x"),                      // eval: shares nothing
    (10L, "a b c d e f g h i j k"),                 // train superset of doc 0
    (11L, "m n o m n o m n o")                      // unrelated train
  ).toDF("doc_id", "text")

  private lazy val rows = {
    // route through the same (spark, dir) entry shape via the overloadable
    // internals: write the fixture as a scratch documents dir
    val dir = tmpDir("evalcont")
    docs.withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .write.parquet(s"$dir/documents.parquet")
    SamplingQueries.evalContamination(spark, dir)
      .collect().map(r => r.getAs[Long]("eval_id") -> r).toMap
  }

  test("verbatim-contained eval doc is fully contaminated and flagged") {
    val r = rows(0L)
    assert(r.getAs[Long]("total_ngrams") === 2L)
    assert(r.getAs[Long]("shared_ngrams") === 2L)
    assert(r.getAs[Double]("contamination") === 1.0)
    assert(r.getAs[Boolean]("contaminated"))
  }

  test("partial overlap counts exactly; below the 20% cut stays unflagged") {
    val r = rows(1L)
    assert(r.getAs[Long]("total_ngrams") === 6L)
    assert(r.getAs[Long]("shared_ngrams") === 1L)
    assert(r.getAs[Double]("contamination") === 1.0 / 6.0)
    assert(!r.getAs[Boolean]("contaminated")) // 1*5 < 6
  }

  test("clean eval doc reports zeros, not a missing row") {
    val r = rows(2L)
    assert(r.getAs[Long]("shared_ngrams") === 0L)
    assert(r.getAs[Double]("contamination") === 0.0)
    assert(!r.getAs[Boolean]("contaminated"))
  }
}
