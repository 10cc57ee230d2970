package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.BloomOps

import graft.text.TextFunctions.shingles

/** Streaming decontamination guard — the ingest-time face of the batch
  * decontamination queries (q66/q76): documents arriving on a stream are
  * DROPPED if any of their word n-grams might belong to a benchmark/eval
  * corpus, so contamination never lands in the lake.
  *
  * Scale shape: the eval set folds into bloom-filter BYTES once at stream
  * start (driver action bounded by the eval suite's size — the
  * index-build/read split every fixture here makes); each micro-batch then
  * filters ROW-LOCALLY via the foldable-literal `might_contain` over the
  * row's own grams — no shuffle, no join, no stream state.
  *
  * Guarantee is ONE-SIDED by design: bloom filters have no false
  * negatives, so no truly contaminated document ever passes; false
  * positives (rate set by `bitsPerItem`, ~2% at 8) drop a few clean
  * documents conservatively. That is the correct trade at the ingest
  * gate — the exact batch queries (q66/q76) reconcile drops offline.
  * Works identically on batch frames.
  */
object IngestGuard {

  def decontaminated(stream: DataFrame, evalDocs: DataFrame, n: Int = 8,
      expectedEvalGrams: Long = 100000L, bitsPerItem: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(array_distinct(shingles(col(textCol), n))).as("g"))
      .select(xxhash64(col("g")).as("gh"))
    val filterBytes = BloomOps.buildFilterBytes(evalGrams, col("gh"),
      expectedEvalGrams, expectedEvalGrams * bitsPerItem)
    stream.filter(!exists(
      array_distinct(shingles(col(textCol), n)),
      g => BloomOps.mightContainBytes(filterBytes, xxhash64(g))))
  }
}
