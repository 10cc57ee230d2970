package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.GraftTable

/** Incremental near-duplicate detection against a PERSISTED MinHash-LSH
  * index — the shape a continuously-fed 100 TB corpus needs: each arriving
  * batch is deduplicated against everything ingested so far WITHOUT
  * recomputing the corpus's signatures, then admitted into the index as a
  * plain versioned append.
  *
  * The index is two graft tables under one root:
  *   - `signatures/` — (doc_id, signature array<long>) one row per doc
  *   - `buckets/`    — (doc_id, band, bucket) `bands` rows per doc, the
  *                     LSH candidate-generation structure
  * Both inherit the full table layer: atomic appends, time travel (the
  * index AS OF any ingest), VACUUM, OPTIMIZE compaction of bucket files.
  *
  * Scale shape per batch: signatures/bands of the BATCH only (one shuffle
  * over batch shingles); candidate generation is one equality join of the
  * batch's banded rows against `buckets/` — Catalyst broadcasts the batch
  * side, so the corpus-side scan streams with NO shuffle of the index;
  * verification exactly re-shingles ONLY docs named by some candidate pair
  * (semi-join pushdown on both corpus and batch), never the corpus.
  * Duplicate-vs-corpus and duplicate-within-batch pairs surface in one
  * pass. Same estimator/verify contract as [[Dedup.minhashNearDups]]: LSH
  * generates candidates, exact Jaccard on shingle sets decides.
  */
object IncrementalDedup {

  /** MinHash geometry — must stay FIXED for the life of an index (it is
    * stamped into the signatures table's properties and re-checked on
    * open, so a mismatched reader fails loudly instead of silently
    * generating garbage candidates). */
  case class Params(n: Int = 3, k: Int = 32, bands: Int = 8, seed: Long = 42L) {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
  }

  final class MinHashIndex private[IncrementalDedup] (
      val spark: SparkSession, val root: String, val params: Params) {
    def signatures: GraftTable = GraftTable.forPath(spark, s"$root/signatures")
    def buckets: GraftTable = GraftTable.forPath(spark, s"$root/buckets")
    /** Number of indexed documents (footer metadata, no scan). */
    def docCount: Long = signatures.rowCount
  }

  private def paramProps(p: Params): Map[String, String] = Map(
    "graft.dedup.n" -> p.n.toString, "graft.dedup.k" -> p.k.toString,
    "graft.dedup.bands" -> p.bands.toString, "graft.dedup.seed" -> p.seed.toString)

  private def signaturesOf(docs: DataFrame, p: Params): DataFrame =
    Dedup.signaturesFromHashes(Dedup.docShingleHashes(docs, p.n), p.k, p.seed)

  private def bandedOf(sigs: DataFrame, p: Params): DataFrame = {
    val rows = p.k / p.bands
    sigs.select(col("doc_id"), explode(array((0 until p.bands).map(b =>
        struct(lit(b).as("band"),
          hash(slice(col("signature"), b * rows + 1, rows)).as("bucket"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
  }

  /** Build a fresh index from the current corpus (one signature pass; the
    * banded table derives from the WRITTEN signatures, so the expensive
    * shingle scan runs exactly once). */
  def create(spark: SparkSession, root: String, docs: DataFrame,
      p: Params = Params()): MinHashIndex = {
    // Geometry rides IN the create commit — there is no window (crash
    // between two commits) where the signatures table exists unstamped.
    val sigT = GraftTable.createWithProperties(
      spark, s"$root/signatures", signaturesOf(docs, p), paramProps(p))
    GraftTable.create(spark, s"$root/buckets", bandedOf(sigT.read(), p))
    new MinHashIndex(spark, root, p)
  }

  /** Open an existing index; refuses a geometry mismatch — and refuses an
    * UNSTAMPED index outright: every geometry key must be present and
    * equal, so a half-created or foreign table can never be silently
    * opened with whatever Params the caller guessed. */
  def open(spark: SparkSession, root: String,
      p: Params = Params()): MinHashIndex = {
    val stored = GraftTable.forPath(spark, s"$root/signatures").detail()
      .head().getAs[Map[String, String]]("properties")
    val want = paramProps(p)
    val missing = want.keys.filterNot(stored.contains)
    require(missing.isEmpty,
      s"index at $root has no stored MinHash geometry " +
        s"(missing: ${missing.mkString(", ")}) — not a dedup index, or " +
        "created by a pre-stamp writer; rebuild it with create()")
    val clash = want.filter { case (k, v) => stored(k) != v }
    require(clash.isEmpty,
      s"index at $root was built with different MinHash geometry: " +
        clash.keys.map(k => s"$k stored=${stored(k)} asked=${want(k)}").mkString(", "))
    new MinHashIndex(spark, root, p)
  }

  /** Deduplicate `newDocs` against the indexed corpus AND against itself,
    * then admit the batch into the index (two atomic graft appends).
    *
    * Returns exact-verified pairs (a_id, b_id, jaccard) where at least one
    * side is a batch doc; `corpusDocs` supplies the text of indexed docs
    * for verification and is re-shingled ONLY for docs a candidate pair
    * names. Batch doc_ids must be distinct from indexed ones (the caller's
    * id discipline, as with any keyed ingest). */
  def addBatch(index: MinHashIndex, corpusDocs: DataFrame, newDocs: DataFrame,
      threshold: Double = 0.8, admit: Boolean = true,
      txn: Option[(String, Long)] = None): DataFrame = {
    val spark = index.spark
    val p = index.params
    // Stage the batch signatures: referenced by banding, candidate join
    // and the index append — one shingle pass, not three.
    val sigs = Dedup.stageIfLarge(signaturesOf(newDocs, p), "incdedup-sigs")
    val batchBands = bandedOf(sigs, p)

    // vs-corpus candidates: batch bands ⋈ persisted buckets. The batch
    // side is the small one — EXPLICITLY broadcast under a size gate, so
    // the (unboundedly growing) index scan streams partition-local with no
    // exchange regardless of what Catalyst estimates for the corpus side.
    // A batch too big to broadcast falls back to the plain equality join,
    // which shuffle-partitions BOTH sides on (band, bucket) — the correct
    // co-partitioned shape when neither side fits in memory.
    val bandsBytes = batchBands.queryExecution.optimizedPlan.stats.sizeInBytes
    val bcastMax = BigInt(spark.conf.getOption("spark.graft.dedup.broadcastThreshold")
      .map(_.toLong).getOrElse(64L * 1024 * 1024))
    val nb0 = batchBands.alias("nb")
    val nbSide = if (bandsBytes <= bcastMax) broadcast(nb0) else nb0
    val idxBands = index.buckets.read()
    val vsCorpus = nbSide
      .join(idxBands.alias("ob"),
        col("nb.band") === col("ob.band") && col("nb.bucket") === col("ob.bucket"))
      .select(col("ob.doc_id").as("a_id"), col("nb.doc_id").as("b_id"))
      .filter(col("a_id") =!= col("b_id"))
      .distinct()
    // within-batch candidates: standard banded self-join
    val inBatch = Dedup.minhashCandidates(sigs, p.k, p.bands)
    val cand = vsCorpus.unionByName(inBatch).distinct()

    // Exact verification re-shingles only docs a candidate names.
    val candIds = Dedup.stageIfLarge(
      cand.select(col("a_id").as("doc_id"))
        .unionByName(cand.select(col("b_id").as("doc_id"))).distinct(),
      "incdedup-candids")
    val touchedCorpus = corpusDocs.select(col("doc_id"), col("text")).join(
      candIds, Seq("doc_id"), "left_semi")
    val touchedBatch = newDocs.select(col("doc_id"), col("text")).join(
      candIds, Seq("doc_id"), "left_semi")
    // a doc present on BOTH sides (a corpus that already absorbed the
    // batch, as the streaming form's admit-docs-first ordering produces)
    // must contribute ONE shingle set, or verified pairs would duplicate
    val shingleSets = Dedup.docShingleSets(
      touchedCorpus.unionByName(touchedBatch).dropDuplicates("doc_id"), p.n)
    val verified = Dedup.verifyJaccard(cand, shingleSets, threshold)

    if (admit) txn match {
      // Stamped admission (the streaming path): an at-least-once replay
      // of the batch is detected per table and skipped — the index never
      // accumulates duplicate signature/bucket rows across restarts, even
      // after a crash BETWEEN the two appends.
      case Some((app, b)) =>
        index.signatures.appendOnce(sigs, s"$app-sigs", b)
        index.buckets.appendOnce(batchBands, s"$app-buckets", b)
      case None =>
        index.signatures.append(sigs)
        index.buckets.append(batchBands)
    }
    verified
  }

  /** Streaming form: every micro-batch of `docsStream` dedups against the
    * index (which the stream itself grows) and duplicate pairs land in
    * `dupsTable` as an append-only audit feed. `corpusDocs` must serve the
    * text of every indexed doc — typically the graft table the pipeline
    * also appends accepted docs to, read LIVE (by-name function) so each
    * batch sees its predecessors. Checkpoint + at-least-once replays are
    * exactly-once end to end: all four appends (docs, signatures,
    * buckets, dup feed) carry per-table txn stamps, so a replayed batch
    * is detected and skipped per table — including after a crash between
    * any two of them. */
  def startStream(index: MinHashIndex, corpusDocs: () => DataFrame,
      docsStream: DataFrame, dupsTable: GraftTable, threshold: Double = 0.8,
      checkpoint: String, admitDocsTo: Option[GraftTable] = None,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      maintainEvery: Int = 10,
      vacuumRetainHours: Double = 168.0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Admit the docs' TEXT first (exactly-once): later batches verify
        // candidate pairs against this table, so a doc indexed in batch N
        // must be readable by batch N+1 even across a crash between the
        // two appends (replay re-runs the whole batch; each append is
        // individually idempotent via its txn stamp).
        admitDocsTo.foreach(_.appendOnce(batch,
          txnAppId = s"incdedup-docs-${index.root}", txnBatchId = batchId))
        val pairs = addBatch(index, corpusDocs(), batch, threshold,
          txn = Some((s"incdedup-${index.root}", batchId)))
        dupsTable.appendOnce(pairs.withColumn("batch_id", lit(batchId)),
          txnAppId = s"incdedup-${index.root}", txnBatchId = batchId)
        // Index maintenance cadence (the Delta-checkpoint-cadence mirror
        // for DATA): every batch appends one dir per index table, so a
        // month-long stream would otherwise accrete thousands of small
        // files and the candidate join's index-side scan would decay.
        // Every `maintainEvery` batches the small tail folds (OPTIMIZE's
        // compactSmall — mature dirs never rewritten) and superseded dirs
        // past the retention vacuum away; both are best-effort and
        // crash-safe (versioned commits like any other).
        if (maintainEvery > 0 && batchId > 0 && batchId % maintainEvery == 0) {
          Seq(index.signatures, index.buckets, dupsTable).foreach { t =>
            try {
              t.compactSmall()
              t.vacuum(vacuumRetainHours)
            } catch { case scala.util.control.NonFatal(_) => () }
          }
        }
        (): Unit
      }
      .start()
}
