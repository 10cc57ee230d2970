package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-source quality quantile normalization — q171 semantics: within a
  * source, percent_rank spreads 0..1 in quality order; sources rank
  * independently, so the same raw score maps to different percentiles.
  */
class QualityQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = {
    val dir = tmpDir("qquant")
    Seq(
      (1L, "a", "!!! ??? ***"),
      (2L, "a", "the cat and the dog of the house went to the garden"),
      (3L, "a", "some plain words here without any stopwords present"),
      (10L, "b", "!!! ??? ***"),
      (11L, "b", "the cat and the dog of the house went to the garden")
    ).toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text"))
      .write.parquet(s"$dir/documents.parquet")
    CorpusQueries.qualityQuantiles(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("percentiles spread 0..1 within each source in quality order") {
    assert(rows(1L).getAs[Double]("source_pct") === 0.0)
    assert(rows(2L).getAs[Double]("source_pct") === 1.0)
    assert(rows(3L).getAs[Double]("source_pct") === 0.5)
  }

  test("sources rank independently: same raw score, different percentile") {
    assert(rows(10L).getAs[Double]("source_pct") === 0.0)
    assert(rows(11L).getAs[Double]("source_pct") === 1.0)
    assert(rows(1L).getAs[Double]("quality") ===
      rows(10L).getAs[Double]("quality"))
  }
}
