package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFunctions._

/** Dataset-construction operators a training-data pipeline runs after
  * filtering/dedup: deterministic splitting, per-source quota sampling,
  * and token-budget sequence packing. All are expressed so the SAME row
  * lands in the same split/sample/bin on every run and on any cluster
  * size — content-hash arithmetic, never `rand()` (whose per-partition
  * streams reshuffle with the partitioning; at 100 TB a re-run or a
  * repartition would silently move documents between train and test).
  */
object SamplingQueries {

  /** First 32 bits of md5(key) as a long — deterministic, uniform, and
    * computable bit-identically in any engine (the DuckDB oracle parses
    * the same 8 hex chars). Used instead of xxhash64, which other engines
    * don't expose. */
  def md5Bucket32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Train/val/test assignment by hash bucket (90/5/5 over 1000 buckets).
    * Per-row, shuffle-free, stable under re-runs and repartitioning. */
  def hashSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = md5Bucket32(col("doc_id")) % 1000
    Tables.documents(spark, dir).select(
      col("doc_id"),
      bucket.as("bucket"),
      when(bucket < 900, "train").when(bucket < 950, "val")
        .otherwise("test").as("split"))
  }

  /** Per-source quota sample: the k documents with the highest content
    * hash per source — a deterministic "uniform" sample with an exact
    * per-group size cap (class balancing). Phrased as the row_number
    * idiom, which [[org.apache.spark.sql.graftnative.TopKRewrite]]
    * replans as the heap operator: one exchange, no per-group sort. */
  def quotaSample(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(desc("__h"), desc("doc_id"))
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), md5Bucket32(col("doc_id")).as("__h"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("source", "doc_id")
  }

  /** Token-budget sequence packing (next-fit by running total): documents
    * are laid out per source in doc_id order and cut into bins of ~budget
    * tokens — the standard way pretraining batches pack short documents
    * into fixed-length sequences. One window shuffle on the partition key;
    * bin assignment is pure arithmetic over the running sum, so bins are
    * reproducible regardless of cluster layout.
    *
    * Scale note: window parallelism equals the number of distinct partition
    * keys. With few sources (this corpus has 20) a 100 TB run would bottleneck
    * on 20 window partitions — pass `shards > 1` to sub-partition each source
    * by a deterministic doc_id hash. Bins then never span shards (each shard
    * packs independently; at worst `shards` under-filled bins per source),
    * which is the standard parallelism/packing-efficiency trade. */
  def packSequences(spark: SparkSession, dir: String, budget: Int = 512,
      shards: Int = 1): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("token_count"))
    val (keyed, partKeys) =
      if (shards == 1) (base, Seq("source"))
      else (base.withColumn("shard", md5Bucket32(col("doc_id")) % shards),
        Seq("source", "shard"))
    val w = Window.partitionBy(partKeys.map(col): _*).orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed.withColumn("bin_id",
      floor((sum("token_count").over(w) - col("token_count")) / (budget * 1.0))
        .cast("long"))
  }
}
