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
  /** Materialize the packed sequences: concatenate each bin's documents in
    * doc_id order into one training-ready payload. The groupBy is on
    * (source, bin_id) — high cardinality, so it shuffles evenly; in-bin
    * ordering is made deterministic by sorting the collected (doc_id, text)
    * structs rather than trusting collect_list's arrival order (which is
    * partition-dependent — on a cluster that would be a silent
    * nondeterminism bug). */
  def packedPayloads(spark: SparkSession, dir: String, budget: Int = 512): DataFrame = {
    val packed = packSequences(spark, dir, budget)
      .join(Tables.documents(spark, dir).select("doc_id", "text"), "doc_id")
    packed.groupBy("source", "bin_id")
      .agg(
        sum("token_count").as("bin_tokens"),
        count(lit(1)).as("bin_docs"),
        array_join(
          transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
            s => s("text")),
          " ").as("payload"))
  }

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

  /** Weighted source mixing to per-source token budgets — the data-mixture
    * step that turns N per-source corpora into one training distribution
    * (e.g. web×1, curated×4). Each source's budget is weight ×
    * `tokensPerWeight` tokens, filled in content-hash order (a
    * deterministic uniform draw, like [[quotaSample]]); a document is kept
    * if it STARTS inside the budget (next-fit, the same running-sum
    * arithmetic as [[packSequences]], so budgets overshoot by at most one
    * document). Weights here derive from the source name (src<i> → i%4+1)
    * to keep the driver query self-contained; production passes a weight
    * table. One window shuffle on source; stable under re-runs and
    * repartitioning. */
  def sourceMix(spark: SparkSession, dir: String,
      tokensPerWeight: Long = 400L): DataFrame = {
    val w = Window.partitionBy("source").orderBy(desc("__h"), desc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        tokenCount(col("text")).cast("long").as("token_count"),
        md5Bucket32(col("doc_id")).as("__h"),
        (substring(col("source"), 4, 10).cast("int") % 4 + 1).cast("long").as("weight"))
      .withColumn("cum", sum("token_count").over(w))
      .filter(col("cum") - col("token_count") < col("weight") * tokensPerWeight)
      .select("source", "doc_id", "weight", "token_count")
  }

  /** Stratified sampling with per-stratum rates: each source keeps a fixed
    * percentage of its documents (here 10–40%, derived from the source name
    * the same way [[sourceMix]] derives weights — production passes a rate
    * table), selected by content-hash bucket so membership is per-row,
    * shuffle-free, and stable under re-runs, repartitioning, and engine
    * changes. This is the "downsample the over-represented sources"
    * counterpart to [[quotaSample]]'s exact per-group count cap: a rate
    * scales with the stratum, a quota doesn't. At 100 TB it's a pure
    * map-side filter — no shuffle, no state, composable with any scan. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val rate = ((substring(col("source"), 4, 10).cast("int") % 4 + 1) * 10)
      .cast("long")
    val bucket = md5Bucket32(col("doc_id")) % 100
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        bucket.as("bucket"), rate.as("rate_pct"))
      .filter(col("bucket") < col("rate_pct"))
  }

  /** Temperature-based source mixing (the multilingual-corpus α-sampling
    * step, α = 1/2): per source, the token mass and the temperature weight
    * `sqrt(n_i)/sqrt(n_max)` — low-resource sources are boosted relative
    * to their raw share (`boost = temp_weight / (n_i/n_max)` ≥ 1, largest
    * source pinned at 1). α = 1/2 is deliberate: `sqrt` is IEEE
    * correctly-rounded, so every output is a chain of exact BIGINT masses
    * through individually-rounded sqrt/divide steps — bit-identical across
    * engines, with NO float sum over a data-dependent group order (the
    * usual Σ nᵢ^α normalizer is re-expressed against the max). General α
    * would need `pow` (libm, not bit-portable) — production passes its own
    * exponent and normalizes downstream. One small hash-agg + a broadcast
    * one-row max: map-side combinable, no shuffle beyond the group-by. */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.TextFunctions
    // agg feeds both the max scalar and the output projection — staged
    // past the real-bytes gate so the corpus is scanned once (the staged
    // table is sources-sized).
    val agg = graft.dedup.Dedup.stageIfLarge(
      Tables.documents(spark, dir)
        .select(col("source"), TextFunctions.tokenCount(col("text")).as("tc"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("tc")).as("n_tokens")),
      "tempmix-agg")
    val maxTok = agg.agg(max(col("n_tokens")).as("max_tokens"))
    val tempWeight = sqrt(col("n_tokens")) / sqrt(col("max_tokens"))
    agg.crossJoin(broadcast(maxTok))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        tempWeight.as("temp_weight"),
        (tempWeight / (col("n_tokens").cast("double") / col("max_tokens")))
          .as("boost"))
  }

  /** q175: token-budget allocation plan — the step AFTER q121's
    * temperature diagnostic: given a training budget B, split it across
    * sources with √-temperature weights and cap each source at its
    * available supply. Every allocation is exact integer arithmetic so
    * the plan is reproducible cross-engine: the weight is ⌊√A_s⌋ (IEEE
    * sqrt is correctly rounded and A_s < 2⁵³ converts exactly, so the
    * floor is bit-portable), the share is (B·w_s) DIV Σw — truncating
    * BIGINT division — and `epochs` (how many passes over the source the
    * allocation implies) is the one final double division. A source
    * whose fair share exceeds its supply is capped at 1 epoch; the
    * residual budget re-spends in production by re-running the same plan
    * on the uncapped remainder (one more sources-sized pass, not done
    * here — the driver gate wants the single-round plan).
    *
    * Plan shape at 100 TB: one corpus scan → sources-sized hash-agg with
    * map-side combine; everything after is broadcast scalars. */
  def tokenBudgetPlan(spark: SparkSession, dir: String,
      budget: Long = 1000000L): DataFrame = {
    import graft.text.TextFunctions
    // Two consumers (the weight-sum scalar and the final projection) —
    // staged past the real-bytes gate so the corpus is scanned ONCE; the
    // staged table is sources-sized.
    val avail = graft.dedup.Dedup.stageIfLarge(
      Tables.documents(spark, dir)
        .select(col("source"), TextFunctions.tokenCount(col("text")).as("tc"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("tc")).as("available_tokens"))
        .select(col("source"), col("n_docs"), col("available_tokens"),
          floor(sqrt(col("available_tokens").cast("double"))).cast("long")
            .as("weight")),
      "budget-avail")
    val wSum = avail.agg(sum(col("weight")).as("wsum"))
    avail.crossJoin(broadcast(wSum))
      .select(col("source"), col("n_docs"), col("available_tokens"),
        col("weight"),
        least(col("available_tokens"),
          expr(s"(${budget}L * weight) DIV wsum")).as("allocated_tokens"))
      .withColumn("epochs",
        col("allocated_tokens").cast("double") / col("available_tokens"))
  }

  /** Benchmark decontamination: flag training documents sharing any word
    * `n`-gram with an evaluation set — the standard guard against test-set
    * leakage into pretraining data. Shingles are hashed to 8-byte keys
    * before the join (string-free shuffle), candidates come from shingle
    * equality (never all-pairs), and the output is one row per contaminated
    * doc with its overlap count. The eval set here is the corpus slice
    * `doc_id < evalDocs` — in production it's the benchmark suite loaded as
    * its own table; the plan is identical. */
  def decontaminate(spark: SparkSession, dir: String, n: Int = 8,
      evalDocs: Long = 10L): DataFrame = {
    import graft.text.TextFunctions.shingles
    val docs = Tables.documents(spark, dir)
    def grams(df: DataFrame, idAs: String) = df.select(
      col("doc_id").as(idAs),
      explode(array_distinct(shingles(col("text"), n))).as("g"))
      .select(col(idAs), xxhash64(col("g")).as("gh"))
    val evalSet = grams(docs.filter(col("doc_id") < evalDocs), "eval_id")
    val train = grams(docs.filter(col("doc_id") >= evalDocs), "doc_id")
    train.join(evalSet.select("gh").distinct(), "gh")
      .groupBy("doc_id")
      .agg(countDistinct(col("gh")).as("shared_ngrams"))
  }

  /** q170: eval-side contamination report — [[decontaminate]] answers
    * "which TRAIN docs leak eval content"; this answers the question an
    * eval owner asks first: per EVAL document, what fraction of its
    * distinct n-grams already exists anywhere in the training corpus, and
    * is the example compromised (≥ 20%, the GPT-3-style dirtiness cut).
    * A benchmark row at 0.9 can't measure generalization no matter how
    * the training side is scrubbed — this report is what decides whether
    * to drop the EVAL row instead.
    *
    * Exactness: counts are BIGINTs over hashed distinct grams; the flag
    * is an integer cross-multiplication (shared·5 ≥ total — no float
    * threshold), and the fraction is one final double division.
    *
    * Scale shape: mirrors q66 — grams hash to longs before any shuffle,
    * the train side collapses to DISTINCT gram hashes (vocabulary-sized,
    * Heap's-law bounded) and semi-joins against the eval explosion; the
    * output is eval-suite-sized. The bloom prefilter variant (q76's
    * mechanism) applies verbatim when the train side is the 100 TB one. */
  def evalContamination(spark: SparkSession, dir: String, n: Int = 8,
      evalDocs: Long = 10L): DataFrame = {
    import graft.text.TextFunctions.shingles
    val docs = Tables.documents(spark, dir)
    def grams(df: DataFrame, idAs: String) = df.select(
      col("doc_id").as(idAs),
      explode(array_distinct(shingles(col("text"), n))).as("g"))
      .select(col(idAs), xxhash64(col("g")).as("gh"))
    val evalSet = grams(docs.filter(col("doc_id") < evalDocs), "eval_id")
    val trainGrams = grams(docs.filter(col("doc_id") >= evalDocs), "doc_id")
      .select("gh").distinct()
    val shared = evalSet.join(trainGrams, Seq("gh"), "left_semi")
      .groupBy("eval_id").agg(count(lit(1)).as("shared_ngrams"))
    evalSet.groupBy("eval_id").agg(count(lit(1)).as("total_ngrams"))
      .join(shared, Seq("eval_id"), "left")
      .select(col("eval_id"), col("total_ngrams"),
        coalesce(col("shared_ngrams"), lit(0L)).as("shared_ngrams"))
      .withColumn("contamination",
        col("shared_ngrams").cast("double") / col("total_ngrams"))
      .withColumn("contaminated",
        col("shared_ngrams") * lit(5L) >= col("total_ngrams"))
  }

  /** [[decontaminate]] with a bloom prefilter on the train side — IDENTICAL
    * output, different scale shape: the eval set's gram hashes fold into a
    * serialized bloom filter (one tiny aggregate — eval suites are MBs, the
    * training corpus is the 100 TB side), `might_contain` prunes train
    * grams MAP-SIDE before any shuffle, and the exact semi-join over the
    * few survivors removes bloom false positives. Without this, the join
    * shuffles every train gram to find the ~0.01% contaminated ones; with
    * it, the big side's shuffle volume is proportional to the
    * contamination rate (+ fpp). `expectedEvalGrams` sizes the filter
    * (~8 bits/item ≈ 2% fpp). */
  def decontaminateBloom(spark: SparkSession, dir: String, n: Int = 8,
      evalDocs: Long = 10L, expectedEvalGrams: Long = 100000L): DataFrame = {
    import graft.text.TextFunctions.shingles
    import org.apache.spark.sql.graftnative.BloomOps
    val docs = Tables.documents(spark, dir)
    def grams(df: DataFrame, idAs: String) = df.select(
      col("doc_id").as(idAs),
      explode(array_distinct(shingles(col("text"), n))).as("g"))
      .select(col(idAs), xxhash64(col("g")).as("gh"))
    val evalSet = grams(docs.filter(col("doc_id") < evalDocs), "eval_id")
    val train = grams(docs.filter(col("doc_id") >= evalDocs), "doc_id")
    val bf = evalSet.agg(
      BloomOps.bloomFilterAgg(col("gh"), expectedEvalGrams).as("bf"))
    train
      .filter(BloomOps.mightContain(bf, col("gh")))
      .join(evalSet.select("gh").distinct(), "gh")
      .groupBy("doc_id")
      .agg(countDistinct(col("gh")).as("shared_ngrams"))
  }

  /** Deterministic seeded global shuffle + sharding — the LAST stage every
    * training-data pipeline runs: examples must reach the trainer in an
    * order uncorrelated with ingestion (a corpus sorted by source/crawl
    * date trains measurably worse), yet bit-reproducible across re-runs,
    * cluster sizes, and engines. Permutation key = md5 over a seed string
    * and the doc id (content-hash arithmetic like [[hashSplit]] — never
    * `rand()`); shard = the key's first hex nibble; order within a shard =
    * key order. Changing the seed string is a fresh permutation.
    *
    * Scale shape: NO global sort and no global row_number — the shard
    * window partitions by shard, so each of the (at 100 TB: ~100k, here 16)
    * shards sorts independently and is written by its own task; the trainer
    * reads shards in (shard, shard_pos) order. This is exactly how a
    * petabyte corpus is shuffled in practice: hash-bucket then sort within
    * bucket — a permutation delivered as #shards independent sorts. */
  def corpusShuffle(spark: SparkSession, dir: String,
      seed: String = "graft-shuffle-v1:"): DataFrame = {
    val skey = md5(concat(lit(seed), col("doc_id").cast("string")))
    Tables.documents(spark, dir)
      .select(col("doc_id"), skey.as("skey"))
      .withColumn("shard",
        expr("CAST(instr('0123456789abcdef', substring(skey, 1, 1)) - 1 AS INT)"))
      .withColumn("shard_pos",
        row_number().over(Window.partitionBy("shard").orderBy("skey", "doc_id"))
          .cast("long"))
  }
}
