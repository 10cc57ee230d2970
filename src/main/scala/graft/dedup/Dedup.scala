package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Corpus deduplication, structured for 100 TB: every algorithm is
  * "candidate generation by key equality (shuffle on bucket key) → exact
  * verification within candidates" — never an all-pairs comparison. The
  * quadratic step is confined to rows sharing a bucket, which hashing keeps
  * small; skewed buckets (stopword shingles) are capped by document
  * frequency before the join.
  */
object Dedup {

  // ------------------------------------------------------------- exact

  /** Exact dedup by content hash: one hash-aggregate, map-side partial.
    * Output: one row per distinct content, the minimal doc_id as keeper. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(TextFunctions.contentHash(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))

  /** Token-set dedup with a QUALITY-priority keeper policy: within a
    * bag-of-words duplicate group (where members genuinely DIFFER — word
    * order, repetition, length; exact-hash duplicates are byte-identical
    * so a quality policy would be vacuous there) the canonical copy is the
    * highest-[[TextFunctions.qualityScore]] document, doc_id breaking score
    * ties — the production policy when the same content arrives from
    * sources of unequal cleanliness (keep the well-formatted crawl, drop
    * the mangled mirror), where [[tokenSetDedup]]'s min-id keeper keeps
    * whichever id sorted first. Same single hash-aggregate shape — the
    * policy is a `min(struct(-q, id))` winner-pick, no window sort; the
    * quality score is the exact cross-engine formula (fixed literal
    * arithmetic over exact counts), so the keeper choice is
    * bit-deterministic. */
  def priorityDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(TextFunctions.tokenSetFingerprint(col(textCol)).as("fingerprint"),
        col(idCol), TextFunctions.qualityScore(col(textCol)).as("q"))
      .groupBy("fingerprint")
      .agg(min(struct((-col("q")).as("nq"), col(idCol).as("id"))).as("m"),
        count(lit(1)).as("dup_count"))
      .select(col("fingerprint"), col("m.id").as("keeper_id"),
        (-col("m.nq")).as("keeper_quality"), col("dup_count"))

  /** Bag-of-words dedup: groups word-order permutations of the same token
    * set — same single-shuffle shape as [[exactDedup]]. */
  def tokenSetDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(TextFunctions.tokenSetFingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))

  // ----------------------------------------------------------- shingles

  /** Distinct (doc_id, shingle) pairs. Distinctness is per document, so
    * `array_distinct` BEFORE the explode does it row-locally — no shuffle
    * (a cross-row `.distinct()` here cost a full exchange of the exploded
    * rows for nothing). */
  def docShingles(docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(TextFunctions.shingles(col(textCol), n))).as("shingle"))

  /** Distinct (doc_id, xxhash64(shingle)) pairs — the candidate-generation
    * feed. Hashing BEFORE the explode means every downstream shuffle
    * (df-cap, bucket joins, minhash signing) carries 8-byte keys instead of
    * shingle strings. Safe for candidate generation: a collision can only
    * ADD a candidate pair, which exact verification then rejects; the
    * verification side keeps true string sets ([[docShingleSets]]). */
  def docShingleHashes(docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(
        transform(TextFunctions.shingles(col(textCol), n), x => xxhash64(x)))).as("h"))

  /** Materialize a DataFrame to scratch parquet and read it back. The
    * near-dup pipelines reference the shingle set from several subtrees;
    * without staging, Spark recomputes the explode + distinct (a full
    * shuffle) once per reference. At corpus scale this is the standard
    * staging-table step — one columnar write, then every consumer scans
    * cheap parquet.
    *
    * The scratch root lives on the SHARED filesystem (Hadoop FS API, like
    * [[graft.table.CommitLog]]), not a driver-local java.nio temp dir —
    * on a real cluster every executor must reach the staged files. Default
    * is `_graft_scratch/` under the Spark warehouse dir; override with
    * `spark.graft.scratch.dir` (e.g. an s3a:// or hdfs:// URI). Cleanup
    * rides Hadoop's deleteOnExit. */
  private def stage(df: DataFrame, tag: String): DataFrame = {
    val spark = df.sparkSession
    val p = graft.Scratch.dir(spark, tag)
    df.write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  /** [[stage]] only when recomputation would cost real cluster work
    * (`spark.graft.stage.threshold`, default 8 MB of PHYSICAL leaf-scan
    * bytes — see [[stagedBytesEstimate]]). The default is calibrated by
    * two measured points bracketing the crossover: at sf0.1 (~1.2 MB
    * physical) staging is ~2× SLOWER — the duplicated subtree executes
    * concurrently on otherwise-idle cores while staging adds two job
    * barriers and a parquet round-trip — and at the ×10 probe (~12 MB
    * physical, tools/DedupScaleProbe) the staged regime is ~1.5× FASTER
    * (146 → 97 s), because staged parquet carries real stats that turn
    * the df join into a broadcast. (The previous 256 MB threshold was
    * anchored to OPTIMIZER estimates, which overestimate the explode by
    * orders of magnitude; against real bytes it would have kept the ×10
    * corpus unstaged.) At 100 TB every dedup staging table is far past
    * any sane threshold and the materialize-once plan wins by
    * construction. */
  private def stageThreshold(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("spark.graft.stage.threshold")
      .map(_.toLong).getOrElse(8L * 1024 * 1024)

  /** Physical size basis for the staging gates: the REAL bytes of the
    * plan's leaf scans — exact for file relations (the listing's cached
    * file statuses) and actual row bytes for local test frames — times a
    * measured expansion ceiling for the staged shapes
    * ([[graft.tools.ExpansionProbe]]: the staged shingle-hash parquet is
    * ~1.25× the source corpus parquet at sf0.1; 2× is the conservative
    * ceiling used here). Optimizer estimates over an explode are
    * unreliable in BOTH directions — a mid-size corpus estimated just
    * under the gate re-executes the shingle shuffle per consumer, a tiny
    * one estimated huge pays the staging barrier for nothing. Leaf bytes
    * are exact and free. */
  private[graft] def stagedBytesEstimate(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum * 2

  private[graft] def stageIfLarge(df: DataFrame, tag: String): DataFrame =
    if (stagedBytesEstimate(df) < stageThreshold(df.sparkSession)) df
    else stage(df, tag)

  /** Per-document DISTINCT shingle sets as SORTED array rows
    * (doc_id, shset) — computed row-locally, no shuffle. The
    * verification-side companion of [[docShingles]]; sorted (binary string
    * order) so [[verifyJaccard]] can count intersections with one
    * allocation-free merge pass instead of a per-row hash set. */
  def docShingleSets(docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      array_sort(array_distinct(TextFunctions.shingles(col(textCol), n))).as("shset"))

  /** Exact Jaccard over prefix-filtered candidate pairs (AllPairs/PPJoin
    * candidate generation, Bayardo et al. WWW'07 / Xiao et al. WWW'08).
    *
    * Each document's shingles are ordered by global rarity (df asc, hash
    * asc — one total order across all documents) and only the first
    * |x| − ⌈t·|x|⌉ + 1 participate in the equality join: J(A,B) ≥ t forces
    * |A∩B| ≥ ⌈t·|A|⌉, so the earliest common token under the shared order
    * sits at position ≤ |A| − ⌈t·|A|⌉ + 1 in BOTH documents — the filter is
    * LOSSLESS, unlike a document-frequency cap, which bounds recall. The
    * quadratic join runs over rare prefix tokens only; verification then
    * computes TRUE jaccard over the full shingle sets of the candidates.
    *
    * Additional length filter: |B| ≥ ⌈t·|A|⌉ is implied by J ≥ t, so
    * candidate rows whose sizes already violate it are dropped before the
    * pair-dedup shuffle.
    *
    * Positional filter (PPJoin's upgrade over plain AllPairs): each prefix
    * row carries its token's POSITION `rn` under the shared order. A match
    * of token h at positions (i, j) bounds the overlap — common tokens
    * ordered before h sit before h in BOTH documents (one global order),
    * so at most min(i−1, j−1) of them exist, and at most
    * min(|A|−i, |B|−j) follow — giving
    * overlap ≤ least(i, j) + least(|A|−i, |B|−j). J ≥ t needs overlap ≥
    * ⌈t/(1+t)·(|A|+|B|)⌉; rows whose bound can't reach it are dropped
    * BEFORE the pair-dedup shuffle. Lossless: for a qualifying pair, its
    * FIRST matched token has no earlier common token (an earlier common
    * token would itself sit in both prefixes and be matched), so that
    * row's bound is exact-or-above and always survives. */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    // The set size rides from the PRE-explode array (`size` is row-local on
    // the scan), so the prefix stage below needs only the row_number window
    // — the earlier `count(*) over (partition by doc_id)` was a second
    // Window pass (its own sort) over the full corpus-sized gram table just
    // to recompute a number the array already knew. sz is constant per doc
    // (RLE-friendly in the staged parquet); results are unchanged.
    val sh0 = docs
      .select(col("doc_id"),
        array_distinct(transform(
          TextFunctions.shingles(col("text"), n),
          x => xxhash64(x))).as("hs"))
      .select(col("doc_id"), size(col("hs")).as("sz"), explode(col("hs")).as("h"))
    val shLarge = stagedBytesEstimate(sh0) >=
      stageThreshold(docs.sparkSession)
    val sh = if (shLarge) stage(sh0, "jaccard") else sh0
    // In the staged (at-scale) regime the document-frequency table is
    // staged too: its true size is the distinct-shingle vocabulary, which
    // the optimizer cannot estimate (aggregate stats fall back to the
    // exploded child's size — always "huge"), so the planner would
    // shuffle the full staged shingle table into this join no matter how
    // small the vocabulary is. Staged parquet carries REAL stats: a
    // vocabulary under the broadcast threshold turns the join into a
    // broadcast hash join (no shuffle of the corpus-sized side — the
    // common case for natural-language corpora), and a genuinely huge
    // vocabulary costs one vocab-sized write before the same shuffle join
    // it would have run anyway. Below the gate the whole pipeline is one
    // DAG and ReuseExchange already shares the shingle shuffle between
    // the aggregate and the join — staging there was measured ~2× SLOWER
    // (barrier + round-trip, lost reuse).
    val dfreq0 = sh.groupBy("h").agg(count(lit(1)).as("df"))
    val dfreq = if (shLarge) stage(dfreq0, "jacdf") else dfreq0
    // The prefix table is staged (size-gated) because the candidate
    // self-join references it twice — at scale, without staging, each side
    // re-executes the df aggregate, the join and both window passes (the
    // executed plan literally contained the subtree twice; no exchange
    // reuse across the two broadcast sides).
    val prefix = stageIfLarge(sh.join(dfreq, "h")
      .withColumn("rn", row_number().over(w.orderBy("df", "h")))
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select("h", "doc_id", "sz", "rn"), "jacprefix")
    // groupBy instead of distinct: same single shuffle dedups the pairs.
    val cand = prefix.select(col("h"), col("doc_id").as("a_id"),
        col("sz").as("a_sz"), col("rn").as("a_rn"))
      .join(prefix.select(col("h"), col("doc_id").as("b_id"),
        col("sz").as("b_sz"), col("rn").as("b_rn")), Seq("h"))
      .filter(col("a_id") < col("b_id") &&
        col("b_sz") >= ceil(lit(threshold) * col("a_sz")) &&
        col("a_sz") >= ceil(lit(threshold) * col("b_sz")) &&
        least(col("a_rn"), col("b_rn")) +
          least(col("a_sz") - col("a_rn"), col("b_sz") - col("b_rn")) >=
          ceil(lit(threshold / (1.0 + threshold)) * (col("a_sz") + col("b_sz"))))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("__shared_prefix"))
      .select("a_id", "b_id")
    verifyJaccard(cand, docShingleSets(docs, n), threshold)
  }

  /** Exact jaccard of candidate (a_id, b_id) pairs over full shingle sets:
    * two key joins against the per-doc SORTED-array table, then one
    * allocation-free merge-count per row
    * ([[org.apache.spark.sql.graftnative.SortedIntersectCount]]) — linear
    * in candidates. (The earlier exploded-row phrasing joined candidates
    * against every (doc, shingle) row — 58M intermediate rows on the bench
    * corpus; the `array_intersect` phrasing after that built a hash set
    * per candidate row, ~half the verify cost.) */
  private[dedup] def verifyJaccard(cand: DataFrame, shingleSets: DataFrame,
      threshold: Double): DataFrame = {
    cand
      .join(shingleSets.select(col("doc_id").as("a_id"), col("shset").as("a_set")), "a_id")
      .join(shingleSets.select(col("doc_id").as("b_id"), col("shset").as("b_set")), "b_id")
      .withColumn("common", org.apache.spark.sql.graftnative.TextExpressions
        .sortedIntersectCount(col("a_set"), col("b_set")))
      .withColumn("jaccard",
        col("common").cast("double")
          / (size(col("a_set")) + size(col("b_set")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  // ------------------------------------------------------------ minhash

  /** Deterministic universal-hash parameters (seeded, stable across runs).
    * Constrained to 31 bits so `a * x + b` with 31-bit x stays well under
    * 2^63 — ANSI mode (Spark 4 default) raises on long overflow. */
  private[graft] def hashParams(k: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)(((rnd.nextLong() & 0x7FFFFFFFL) | 1L, rnd.nextLong() & 0x7FFFFFFFL))
  }

  private[graft] val Prime31 = 2147483647L // 2^31 - 1

  /** MinHash signatures: shingle → explode → k permuted hashes → min per
    * doc. One shuffle (the groupBy); signature width k columns folded into
    * one array. */
  def minhashSignatures(docs: DataFrame, n: Int = 3, k: Int = 32,
      seed: Long = 42L): DataFrame =
    signaturesFromHashes(docShingleHashes(docs, n), k, seed)

  /** Signatures from an existing (doc_id, shingle) set — lets callers share
    * one shingle scan between signing and verification.
    *
    * The permutation is Carter-Wegman over GF(2^31−1): both the base hash
    * and the modulus live in the SAME 31-bit field, so `a·h` wraps ~a times
    * and the permutations behave independently. (The earlier mod-2^61−1
    * variant wrapped at most once over 31-bit inputs, making every
    * permutation piecewise MONOTONE in h — for a < 2^30 fully monotone, all
    * picking the identical global-min element — which correlated the bands
    * and demonstrably dropped a jaccard-0.93 pair that 16 independent bands
    * would miss with probability ~4e-10.) */
  def signaturesFromShingles(sh: DataFrame, k: Int, seed: Long): DataFrame =
    signaturesFromHashes(
      sh.select(col("doc_id"), xxhash64(col("shingle")).as("h")), k, seed)

  /** Same, from a pre-hashed (doc_id, h = xxhash64(shingle)) feed —
    * identical signature values (same base hash), string-free shuffles. */
  def signaturesFromHashes(sh: DataFrame, k: Int, seed: Long): DataFrame = {
    val params = hashParams(k, seed)
    // 31-bit base hash: (31-bit a) * (31-bit x) + (31-bit b) < 2^63 — safe
    // under ANSI long arithmetic.
    val base = sh.select(col("doc_id"), pmod(col("h"), lit(Prime31)).as("hh"))
    val mins = params.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("hh") * a + b, lit(Prime31))).as(s"m$i")
    }
    base.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"m$i")): _*).as("signature"))
  }

  /** LSH banding: signature (length k) → `bands` buckets of `k/bands` rows
    * each; docs colliding in any band become candidates. Band-bucket join is
    * a plain shuffle on (band, hash-of-slice) — no pairwise work outside
    * buckets. */
  def minhashCandidates(signatures: DataFrame, k: Int, bands: Int): DataFrame = {
    val rowsPerBand = k / bands
    val banded = signatures.select(
        col("doc_id"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            hash(slice(col("signature"), b * rowsPerBand + 1, rowsPerBand)).as("bucket"))): _*))
          .as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("a_id"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("b_id"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** MinHash+LSH near-dup pipeline: shingle → minhash → band → bucket-join
    * → exact-Jaccard verify of candidates only. */
  def minhashNearDups(docs: DataFrame, n: Int = 3, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.8, seed: Long = 42L): DataFrame = {
    val cand = minhashCandidates(
      signaturesFromHashes(docShingleHashes(docs, n), k, seed), k, bands)
    verifyJaccard(cand, docShingleSets(docs, n), threshold)
  }

  // ------------------------------------------------------------ simhash

  /** 64-bit SimHash fingerprints: per distinct token, a 64-bit hash; per
    * bit, sum of ±1 across tokens; sign → bit. One shuffle: the 64 per-bit
    * sums are 64 aggregate columns over the token rows (map-side partial),
    * not a 64× row explosion — at corpus scale that's a plain hash
    * aggregate on doc_id.
    *
    * The token hash is the first 16 hex chars of md5, taken as two 32-bit
    * halves (`conv` of 8 hex chars each — a full 16-char parse would
    * overflow signed long). md5 instead of xxhash64 so the fingerprints
    * are ENGINE-INDEPENDENT: the q26 DuckDB oracle rebuilds them
    * bit-for-bit from the same hex arithmetic. */
  def simhashFingerprints(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("token"))
      .withColumn("hi", conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long"))
      .withColumn("lo", conv(substring(md5(col("token")), 9, 8), 16, 10).cast("long"))
    val bitSums = (0 until 64).map { j =>
      val src = if (j < 32) col("lo") else col("hi")
      sum(when(shiftright(src, j % 32).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j")
    }
    toks.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dups: 4 bands of 16 bits generate candidates; verify by
    * Hamming distance (bit_count of xor) ≤ maxDist. */
  def simhashNearDups(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val fp = simhashFingerprints(docs)
    val banded = fp.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFF).as("chunk"))): _*)).as("bc"))
      .select(col("doc_id"), col("simhash"), col("bc.band"), col("bc.chunk"))
    val a = banded.select(col("band"), col("chunk"),
      col("doc_id").as("a_id"), col("simhash").as("a_fp"))
    val b = banded.select(col("band"), col("chunk"),
      col("doc_id").as("b_id"), col("simhash").as("b_fp"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).as("hamming"))
      // verify BEFORE the pair-dedup shuffle: hamming is a pure function of
      // the pair, so filtering first is equivalent — and most band
      // collisions (≥16 shared bits) are nowhere near maxDist, so the
      // distinct now shuffles only the near-dups instead of every candidate
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  // --------------------------------------------------------- embeddings

  /** Exact dot product of two double-array columns: sequential left-to-right
    * double accumulation — bit-deterministic, codegen'd
    * ([[graft.functions.DotProduct]]; ~10× the interpreted HOF phrasing on
    * all-pairs scans). */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dotProduct(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact all-pairs cosine near-dup — the verification baseline. Quadratic:
    * only for modest partitions / oracle checks; the scale path is
    * [[embeddingNearDupsLsh]]. */
  def embeddingNearDupsExact(emb: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Norms computed once per vector (N of them), not once per pair (N²/2):
    // value-identical to cosine() since sqrt(dot(v,v)) is the same
    // computation either way — the DuckDB oracle is unchanged.
    val withNorm = emb.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
      .withColumn("norm", sqrt(dot(col("vec"), col("vec"))))
    val a = withNorm.select(col("id").as("a_id"), col("vec").as("a_vec"), col("norm").as("a_norm"))
    val b = withNorm.select(col("id").as("b_id"), col("vec").as("b_vec"), col("norm").as("b_norm"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("cosine", dot(col("a_vec"), col("b_vec")) / (col("a_norm") * col("b_norm")))
      .filter(col("cosine") >= threshold)
      .select("a_id", "b_id", "cosine")
  }

  /** Banded multi-probe sign-LSH near-dup — the 100 TB path. Candidate
    * generation: `bands` independent sign-LSH bucket codes per vector
    * ([[graft.sim.Similarity.withLshBands]]); a pair is a candidate when it
    * collides in any band, with the probe side additionally emitting every
    * 1-bit flip of its code (`multiProbe` = 1) so pairs split by a single
    * disagreeing hyperplane still collide. Exact cosine verification of
    * distinct candidates only.
    *
    * Recall for a pair at angle θ (plane-agreement p = 1 − θ/π):
    * per band P = p^r + r(1−p)p^(r−1), overall 1 − (1−P)^b — with the
    * defaults (b=16, r=8) ≈ 97% at cosine 0.5 and ~1 at cosine ≥ 0.8,
    * against the single-code construction's ~p^12 ≈ 1% that motivated this
    * redesign. Cost stays bucket-bounded: per band 2^r buckets, candidate
    * work = Σ bucket² per band, never all-pairs. */
  def embeddingNearDupsLsh(emb: DataFrame, threshold: Double, bands: Int = 16,
      planesPerBand: Int = 8, dim: Int = 64, multiProbe: Int = 1, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // EXACT-duplicate collapse first (lossless): byte-identical vectors all
    // land in the same bucket of EVERY band, so each exact-dup cluster of
    // size k multiplies candidate rows by k² × bands × probes — on a
    // duplicate-heavy corpus (the normal case at ingest) the LSH path
    // measured 5× SLOWER than brute force before this collapse (×10
    // replica probe: 264 s vs 53 s). Banding runs on one representative
    // per distinct vector; pairs are reconstructed exactly afterwards —
    // identical vectors share every cosine, so the expansion computes each
    // value ONCE from the representative with the same expression the
    // direct path uses (bit-identical results, zero-vector NaN semantics
    // included).
    val v0 = emb.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("vec"))
    val groups = v0.groupBy("vec")
      .agg(min("vec_id").as("vec_id"), sort_array(collect_list("vec_id")).as("members"))
    val reps = groups.select("vec_id", "vec")

    val banded = graft.sim.Similarity
      .withLshBands(groups.select(col("vec_id").as(idCol), col("vec").as(vecCol)),
        bands, planesPerBand, dim, seed, idCol, vecCol)
    val probeBuckets: Seq[Column] =
      if (multiProbe >= 1)
        col("bucket") +: (0 until planesPerBand).map(i =>
          col("bucket").bitwiseXOR(lit(1L << i)))
      else Seq(col("bucket"))
    val a = banded.select(col("band"),
      explode(array(probeBuckets: _*)).as("bucket"), col("vec_id").as("a_id"))
    val b = banded.select(col("band"), col("bucket"), col("vec_id").as("b_id"))
    val cand = a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val repPairs = cand
      .join(reps.select(col("vec_id").as("a_id"), col("vec").as("a_vec")), "a_id")
      .join(reps.select(col("vec_id").as("b_id"), col("vec").as("b_vec")), "b_id")
      .withColumn("cosine", cosine(col("a_vec"), col("b_vec")))
      .filter(col("cosine") >= threshold)
      .select(col("a_id").as("a_rep"), col("b_id").as("b_rep"), col("cosine"))

    // Intra-group pairs: every two ids sharing one distinct vector — their
    // cosine is the self-cosine of the representative (1 up to fp, NaN for
    // the zero vector, exactly as the direct expression computes it).
    val intra = groups.filter(size(col("members")) > 1)
      .withColumn("cosine", cosine(col("vec"), col("vec")))
      .filter(col("cosine") >= threshold)
      .select(posexplode(col("members")).as(Seq("i", "a_id")), col("members"), col("cosine"))
      .select(col("a_id"), explode(slice(col("members"), col("i") + 2,
        greatest(size(col("members")) - col("i") - 1, lit(0)))).as("b_id"), col("cosine"))
    // Cross-group pairs: each qualifying rep pair expands to the full
    // member cross product, normalized back to a_id < b_id.
    val cross = repPairs
      .join(groups.select(col("vec_id").as("a_rep"), col("members").as("a_members")), "a_rep")
      .join(groups.select(col("vec_id").as("b_rep"), col("members").as("b_members")), "b_rep")
      .select(explode(col("a_members")).as("a_m"), col("b_members"), col("cosine"))
      .select(col("a_m"), explode(col("b_members")).as("b_m"), col("cosine"))
      .select(least(col("a_m"), col("b_m")).as("a_id"),
        greatest(col("a_m"), col("b_m")).as("b_id"), col("cosine"))
    intra.unionByName(cross).select("a_id", "b_id", "cosine")
  }

  // ------------------------------------------------- duplicate clusters

  /** Connected components over a near-dup pair graph — the dedup endgame:
    * pair lists become duplicate CLUSTERS with one deterministic keeper
    * each. Iterative min-label propagation (the MapReduce-CC family,
    * Rastogi et al., ICDE'13): every round each node adopts the smallest
    * label among itself and its neighbors, then POINTER-JUMPS — adopts
    * its current label's own label (path halving) — so chain depth falls
    * geometrically and convergence needs O(log diameter) rounds, not
    * O(diameter): a 100-link chain converges in ~7 rounds instead of 100.
    * One round = neighbor-min join + hash aggregate + one self-join for
    * the jump. Near-dup components from bucket joins are cliques or short
    * chains (2-3 rounds in practice); `maxIters` caps pathologies. Labels are
    * staged to parquet per round, severing the iterative lineage exactly
    * like the k-means centroid path (the plan would otherwise grow by one
    * join+agg layer per round and re-execute all prior rounds inside each
    * next one).
    *
    * Output: (doc_id, cluster_id, cluster_size) for EVERY input document —
    * singletons cluster with themselves; cluster_id = min doc_id in the
    * component, so `doc_id == cluster_id` selects the keepers. */
  def duplicateClusters(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", maxIters: Int = 20): DataFrame = {
    val edges = stage(
      pairs.select(col("a_id").cast("long").as("src"), col("b_id").cast("long").as("dst"))
        .union(pairs.select(col("b_id").cast("long").as("src"), col("a_id").cast("long").as("dst"))),
      "cc-edges")
    var labels = stage(
      docs.select(col(idCol).cast("long").as("node"), col(idCol).cast("long").as("lbl")),
      "cc-labels")
    var round = 0
    var done = false
    while (!done && round < maxIters) {
      val neighborMin = edges
        .join(labels.select(col("node").as("src"), col("lbl")), "src")
        .select(col("dst").as("node"), col("lbl"))
      val folded = labels.union(neighborMin)
        .groupBy("node").agg(min("lbl").as("lbl"))
      // pointer jump: every label IS a node id, so looking the label up in
      // the same table and adopting ITS label halves remaining chain depth.
      // The change flag rides INSIDE the staged write (one extra join
      // against the prior labels in the same DAG) so convergence below is
      // a single-column scan of the parquet just written — the earlier
      // shape re-joined the two staged label tables as a separate job
      // every round just to ask "did anything change".
      val updated = stage(
        folded.join(
            folded.select(col("node").as("lbl"), col("lbl").as("parent_lbl")),
            Seq("lbl"), "left")
          .select(col("node"), coalesce(col("parent_lbl"), col("lbl")).as("lbl"))
          .join(labels.select(col("node"), col("lbl").as("prev")), "node")
          .select(col("node"), col("lbl"), (col("lbl") =!= col("prev")).as("chg")),
        "cc-labels")
      done = updated.filter(col("chg")).isEmpty
      labels = updated.select("node", "lbl")
      round += 1
    }
    val sizes = labels.groupBy("lbl").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "lbl")
      .select(col("node").as(idCol), col("lbl").as("cluster_id"), col("cluster_size"))
  }

  // -------------------------------------------------- semantic (SemDeDup)

  /** Within-cluster semantic-dedup drop rule (SemDeDup, Abbas et al. 2023):
    * a member is dropped iff a LOWER-ID member of the same cluster has
    * cosine ≥ `tau` — dropped-or-kept status of the lower-id member is
    * irrelevant (the paper's one-pass rule; no iteration, so the output is
    * order-free and deterministic). Input rows: (id, cluster, vec as
    * array<double>); output: the kept (id, cluster) rows.
    *
    * The quadratic comparison is confined to a cluster by the equi-join on
    * the cluster key — the same candidate-generation-by-key-equality shape
    * as every other near-dup path here. At 100 TB the members table is the
    * ANN index's own centroid-partitioned layout, so each partition dedups
    * independently with zero extra shuffle. */
  def semanticDedupKeepers(members: DataFrame, tau: Double,
      idCol: String = "vec_id", clusterCol: String = "centroid_id",
      vecCol: String = "vec"): DataFrame = {
    // EXACT-duplicate collapse first (lossless — the proven q30 pattern,
    // [[embeddingNearDupsExact]]'s LSH sibling): byte-identical vectors
    // multiply the within-cluster quadratic by k² per duplicate group, the
    // normal case at ingest. Cosine depends only on the vectors, so the
    // drop rule evaluates on one REPRESENTATIVE per distinct
    // (cluster, vec) and expands back exactly:
    //   member b of group B is dropped  ⟺  ∃ a in the cluster, a < b,
    //     cos(vec_a, vec_B) ≥ τ
    //   ⟺  bound(B) < b, where bound(B) = min over
    //        { min(A) | group A ≠ B in the cluster, cos(vec_A, vec_B) ≥ τ }
    //        ∪ { min(B) | cos(vec_B, vec_B) ≥ τ }
    //   (∃ a∈A with a < b ⟺ min(A) < b; the self term covers lower-id
    //   members of b's OWN group, with the self-cosine computed by the
    //   same expression as the direct quadratic — including its ANSI
    //   divide-by-zero error on zero vectors. The self term is guarded on
    //   group size > 1 so a SINGLETON group evaluates no cosine at all,
    //   exactly like the direct path, where a lone zero vector in its own
    //   cluster joins into zero pairs).
    val m = members.select(col(clusterCol).as("cl"), col(idCol).as("id"),
      col(vecCol).as("vec"))
    val groups = m.groupBy("cl", "vec")
      .agg(min("id").as("rep_id"), collect_list("id").as("members"))
    val a = groups.select(col("cl"), col("rep_id").as("a_rep"), col("vec").as("a_vec"))
    val b = groups.select(col("cl"), col("rep_id").as("b_rep"), col("vec").as("b_vec"))
    // Renamed output columns (n_*) break the groups→nbrMin lineage tie so
    // the left join below is unambiguous to the self-join detector.
    val nbrMin = a.join(b, "cl")
      .filter(col("a_rep") =!= col("b_rep"))
      .filter(cosine(col("a_vec"), col("b_vec")) >= tau)
      .groupBy(col("cl"), col("b_rep")).agg(min(col("a_rep")).as("nbr_min"))
      .select(col("cl").as("n_cl"), col("b_rep").as("n_rep"), col("nbr_min"))
    groups
      .join(nbrMin,
        col("cl") === col("n_cl") && col("rep_id") === col("n_rep"),
        "left")
      .select(col("cl"), col("members"),
        // least() skips nulls: bound is null iff neither term applies.
        // Nested when: the self-cosine only evaluates for groups of ≥ 2
        // (codegen evaluates a When branch value only under its condition).
        least(when(size(col("members")) > 1,
            when(cosine(col("vec"), col("vec")) >= tau, col("rep_id"))),
          col("nbr_min")).as("bound"))
      .select(col("cl"), explode(col("members")).as("id"), col("bound"))
      .filter(col("bound").isNull || col("id") <= col("bound"))
      .select(col("id").as(idCol), col("cl").as(clusterCol))
  }

  // ------------------------------------- substring-level (positional) dedup

  /** Every token-window SITE `(doc_id, i, window_text)` — positions are
    * 1-based window starts over the whitespace-token sequence, windows in
    * positional order straight from the linear [[TextFunctions.shingles]]
    * sweep. Unlike [[docShingles]] this keeps duplicates *within* a
    * document and the position of each occurrence: substring-level dedup
    * (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", ACL'22) is positional — it finds and removes the duplicated
    * SPANS, not whole near-duplicate documents. */
  private def windowSites(docs: DataFrame, n: Int,
      idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(TextFunctions.shingles(col(textCol), n)).as(Seq("i0", "w")))
      .select(col(idCol), (col("i0") + 1).as("i"), col("w"))

  /** Per-document duplicated-substring profile: of a document's
    * `windowTokens`-token windows, how many occur at MORE THAN ONE site in
    * the whole corpus (any document, including elsewhere in the same one).
    *
    * Plan shape at 100 TB: one hash-aggregate over window text for the
    * global occurrence counts (map-side combinable), one shuffle join back
    * to the sites keyed by the window, one per-document aggregate. Nothing
    * is quadratic — a window repeated a million times contributes one count
    * row, not a million² pairs. At scale the join key would be
    * `xxhash64(w)` (8 bytes instead of the window string; a collision only
    * misclassifies one window of one document, acceptable for a profiling
    * stat) — kept as text here so the DuckDB oracle phrasing is identical. */
  def substringDupStats(docs: DataFrame, windowTokens: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val win = windowSites(docs, windowTokens, idCol, textCol)
    val cnt = win.groupBy("w").agg(count(lit(1)).as("c"))
    val per = win.join(cnt, "w")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("c") >= 2, 1L).otherwise(0L)).as("dup_windows"))
    // left join back so documents too short to form a single window still
    // appear (n_windows = 0) — the profile must cover the whole corpus
    docs.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        when(coalesce(col("n_windows"), lit(0L)) === 0L, lit(0.0))
          .otherwise(col("dup_windows").cast("double") / col("n_windows"))
          .as("dup_frac"))
  }

  /** Remove duplicated SPANS from each document, keeping the globally first
    * occurrence (ExactSubstr of Lee et al. ACL'22, the operator document-
    * level dedup cannot express: boilerplate repeated across millions of
    * otherwise-distinct pages survives MinHash but dies here).
    *
    * Semantics (deterministic): a window site is a duplicate iff its text
    * occurs at ≥ 2 sites corpus-wide and the site is not the first under
    * (doc_id, position) order; a token is removed iff covered by any
    * duplicate site's `[i, i+W−1]` span. Output per document: original and
    * kept token counts and the cleaned text with removed tokens spliced out.
    *
    * Plan shape at 100 TB: the first-site winner is a hash-aggregate
    * `min(struct(doc_id, i))` per window — NOT a `row_number` window
    * function, which would sort every partition globally by window text.
    * Span coverage explodes each duplicate site into W positions before the
    * distinct; spans overlap heavily in boilerplate-dense corpora, so the
    * scale refinement is a per-document interval merge (sessionize the
    * sites, subtract merged intervals) — same output, O(sites) state. The
    * per-document rebuild is a grouped sort of that document's kept tokens
    * only (collect_list bounded by document length, never cross-document). */
  def substringScrub(docs: DataFrame, windowTokens: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val win = windowSites(docs, windowTokens, idCol, textCol)
    val stats = win.groupBy("w").agg(
      count(lit(1)).as("c"),
      min(struct(col(idCol), col("i"))).as("first"))
    val dupSites = win.join(stats, "w")
      .filter(col("c") >= 2 &&
        !(col(idCol) === col(s"first.$idCol") && col("i") === col("first.i")))
      .select(col(idCol), col("i"))
    val cover = dupSites
      .select(col(idCol),
        explode(sequence(col("i"), col("i") + lit(windowTokens - 1))).as("p"))
      .distinct()
    val toks = docs.select(col(idCol), split(trim(col(textCol)), "\\s+").as("t"))
    val tokpos = toks
      .select(col(idCol), posexplode(col("t")).as(Seq("p0", "tok")))
      .select(col(idCol), (col("p0") + 1).as("p"), col("tok"))
    val kept = tokpos.join(cover, Seq(idCol, "p"), "left_anti")
    val rebuilt = kept.groupBy(idCol)
      .agg(count(lit(1)).as("kept_tokens"),
        collect_list(struct(col("p"), col("tok"))).as("pt"))
      .select(col(idCol), col("kept_tokens"),
        concat_ws(" ", expr("transform(array_sort(pt), s -> s.tok)"))
          .as("cleaned_text"))
    toks.select(col(idCol), size(col("t")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /** Interdoc boilerplate removal — the C4/CCNet LINE-frequency cleaning
    * class (Raffel et al. JMLR'20 §2.2 dedup of three-sentence spans;
    * CCNet's per-shard duplicated-paragraph drop): a text unit repeated
    * across ≥ `minDf` DISTINCT documents is boilerplate (nav bars, license
    * headers, cookie banners) and is removed from EVERY document — unlike
    * [[substringScrub]] there is no canonical "first occurrence" worth
    * keeping. The corpus has no newlines, so the unit is a fixed
    * `segTokens`-token NON-overlapping segment (a trailing short segment is
    * a unit too); segmentation is stride-anchored, so a phrase repeated at
    * different token offsets is [[substringScrub]]'s job — the two passes
    * are complementary, which is why production pipelines run both.
    *
    * Plan shape at 100 TB, and why it is the CHEAP pass of the pair:
    * non-overlapping segments mean |units| = n_tokens / segTokens — an
    * 8th of [[substringScrub]]'s sliding-window row count. One hash
    * aggregate (distinct doc per segment, map-side combinable) computes
    * document frequency; the removal is a LEFT ANTI join of the segments
    * against only the `df ≥ minDf` dictionary — boilerplate is a
    * vanishing fraction of distinct segments, so that dictionary
    * broadcasts (AQE picks the broadcast side from its real size) and the
    * scrub costs one scan + one small-side join, no corpus-sized shuffle.
    * The rebuild is a per-document grouped sort bounded by doc length. */
  def boilerplateScrub(docs: DataFrame, segTokens: Int = 8, minDf: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), split(trim(col(textCol)), "\\s+").as("t"))
    val segs = toks.filter(size(col("t")) > 0)
      .select(col(idCol), posexplode(expr(
        s"""transform(sequence(0, CAST((size(t) + ${segTokens - 1}) DIV $segTokens AS INT) - 1),
           |          i -> array_join(slice(t, i * $segTokens + 1, $segTokens), ' '))"""
          .stripMargin)).as(Seq("idx", "seg")))
    val boiler = segs.select(col(idCol), col("seg")).distinct()
      .groupBy("seg").agg(count(lit(1)).as("df"))
      .filter(col("df") >= lit(minDf))
      .select("seg")
    val rebuilt = segs.join(boiler, Seq("seg"), "left_anti")
      .groupBy(idCol)
      .agg(count(lit(1)).as("kept_segments"),
        collect_list(struct(col("idx"), col("seg"))).as("pt"))
      .select(col(idCol), col("kept_segments"),
        concat_ws(" ", expr("transform(array_sort(pt), s -> s.seg)"))
          .as("cleaned_text"))
    toks.select(col(idCol),
        expr(s"CAST((size(t) + ${segTokens - 1}) DIV $segTokens AS BIGINT)")
          .as("n_segments"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_segments"),
        coalesce(col("kept_segments"), lit(0L)).as("kept_segments"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }
}
