package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.analytics.{CorpusQueries, SamplingQueries}
import graft.dedup.Dedup
import graft.streaming.IngestGuard

/** The full training-data pipeline COMPOSED end to end on a real corpus —
  * quality filter → near-dup clustering → keeper selection →
  * decontamination guard → deterministic split → sequence packing — with
  * the cross-stage invariants a production run is graded on. Each stage is
  * individually oracle- or spec-checked elsewhere; this pins that they
  * compose (schemas line up, semantics survive chaining). */
class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("filter → cluster keepers → guard → split → pack composes with invariants") {
    val docs = Tables.documents(spark, dir)

    // 1. quality filter (per-row, shuffle-free)
    val filtered = CorpusQueries.corpusFilter(spark, dir).select("doc_id")
    val nFiltered = filtered.count()
    assert(nFiltered > 0 && nFiltered < docs.count())

    // 2. near-dup clusters over the surviving docs; keep one per cluster
    val survivors = docs.join(filtered, "doc_id")
    val pairs = Dedup.ngramJaccardPairs(survivors, n = 3, threshold = 0.5)
    val clusters = Dedup.duplicateClusters(survivors, pairs)
    val keepers = clusters.filter(col("doc_id") === col("cluster_id")).select("doc_id")
    // invariant: no near-dup PAIR survives among keepers (one keeper per
    // component, and every pair is intra-component by construction)
    val pairBothKept = pairs
      .join(keepers.withColumnRenamed("doc_id", "a_id"), "a_id")
      .join(keepers.withColumnRenamed("doc_id", "b_id"), "b_id")
    assert(pairBothKept.isEmpty)
    assert(keepers.count() === clusters.select("cluster_id").distinct().count())

    // 3. decontamination guard against an eval slice
    val evalDocs = docs.filter(col("doc_id") < 5)
    val kept = docs.join(keepers, "doc_id").filter(col("doc_id") >= 5)
    val clean = IngestGuard.decontaminated(kept, evalDocs, n = 8)
    // invariant: nothing sharing an 8-gram with the eval slice survives
    // (bloom has no false negatives; cross-check against the exact list)
    val dirty = SamplingQueries.decontaminate(spark, dir, n = 8, evalDocs = 5L)
      .select(col("doc_id"))
    assert(clean.join(dirty, "doc_id").isEmpty)

    // 4. deterministic split over the clean corpus
    val split = SamplingQueries.hashSplit(spark, dir)
      .join(clean.select("doc_id"), "doc_id")
    assert(split.count() === clean.count())
    assert(split.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val", "test")))

    // 5. sequence packing of the train split
    val packed = SamplingQueries.packSequences(spark, dir, budget = 256)
      .join(split.filter(col("split") === "train").select("doc_id"), "doc_id")
    // invariant: bin ids are non-negative and docs keep their token counts
    assert(packed.filter(col("bin_id") < 0).isEmpty)
    assert(packed.count() === split.filter(col("split") === "train").count())
  }
}
