package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFunctions._

/** Sparse-retrieval surface over the `documents` corpus: BM25 ranked
  * retrieval and the inverted index that backs it. Complements the dense
  * (embedding/ANN) retrieval family in [[CorpusQueries]] — a training-data
  * pipeline uses both (e.g. BM25 for quality-by-similarity-to-seed-corpus
  * selection, dense ANN for semantic dedup).
  *
  * Exactness recipe (same as the q69/q70 TF-IDF/LM family): every factor
  * in the score is an integer-derived double and the expression tree is
  * written IDENTICALLY on the Spark and DuckDB sides, so each IEEE-rounded
  * multiply/divide produces the same bits in both engines — no log()
  * (libm-dependent last-ulp), no float SUM over a data-dependent order
  * (the per-term contributions fold in fixed slot order).
  */
object RetrievalQueries {

  /** Okapi defaults; LITERALS must match the oracle SQL digit-for-digit
    * (2.2 = k1+1 is written as a literal for the same reason). */
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** Fixed driver query — three mid-frequency corpus terms. */
  val DefaultQueryTerms: Seq[String] = Seq("join", "vector", "customer")

  /** BM25 top-k document retrieval for a fixed bag-of-words query.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
    * with the log-free idf (N − df + ½)/(df + ½) and dl/avgdl expanded to
    * the integer-ratio form dl·N/total_tokens (avgdl never materializes as
    * a rounded intermediate).
    *
    * Scale shape: tokens are filtered to the query terms BEFORE the tf
    * aggregate (the scan's explode output drops to |q| rows per doc —
    * predicate pushdown on the exploded column), df/N/total ride along as
    * broadcast one-row or |q|-row aggregates, and the only per-doc shuffle
    * keys are doc_id (tf, dl). The final top-k is a TakeOrdered (bounded
    * heap, no global sort). At 100 TB this is one corpus scan + one
    * doc-keyed shuffle — the classic "score and take k" plan.
    *
    * Per-term contributions are summed via fixed slots
    * (coalesce(max(when term=t)), one per query term, folded left in query
    * order) rather than a float SUM whose partial-aggregation order would
    * be partition-dependent. */
  def bm25Retrieval(spark: SparkSession, dir: String,
      queryTerms: Seq[String] = DefaultQueryTerms, k: Int = 20): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val totals = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(toks.agg(count(lit(1)).as("total_tokens")))

    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val norm = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) *
        (lit(0.25) + ((lit(0.75) * col("dl")) * col("n_docs")) / col("total_tokens")))
    val scored = tf
      .join(broadcast(dfT), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(totals))
      .withColumn("s", idf * norm)
    val score = queryTerms
      .map(t => coalesce(max(when(col("term") === t, col("s"))), lit(0.0)))
      .reduceLeft(_ + _)
    scored.groupBy("doc_id", "dl")
      .agg(score.as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** Reciprocal-rank-fusion constant (Cormack et al. 2009's k=60). A
    * LITERAL on both engine sides for the usual bit-identity reason. */
  val RrfK = 60

  /** Hybrid retrieval: reciprocal-rank fusion of the sparse (BM25, q114)
    * and dense (exact cosine vs query vector 0, q28) rankings over the same
    * corpus — rrf(d) = Σ_lists 1/(60 + rank_l(d)), the standard way a
    * training-data pipeline combines "similar to seed corpus by words" with
    * "similar by embedding" for data selection.
    *
    * Determinism: both input rankings are already bit-exact against their
    * own oracles (q114/q28); ranks are INTEGERS (row_number with a doc_id
    * tiebreak), so each RRF term is 1/(60+r) — one IEEE divide of integer
    * operands — and the fuse is a fixed-order two-term sum. No float
    * ordering anywhere.
    *
    * Scale shape: each leg is its own top-N (bounded-heap TakeOrdered —
    * the corpus-sized work stays in the legs, which are the already-scale-
    * shaped q114/q28 plans); ranking then runs over N=50-row frames
    * (single-partition window over a k-sized set — constant work), and the
    * fuse is a 50×50 outer join. At 100 TB the legs are index lookups
    * (inverted index / ANN) feeding the same constant-size fuse. */
  def hybridRetrieval(spark: SparkSession, dir: String,
      queryTerms: Seq[String] = DefaultQueryTerms, queryVecId: Long = 0L,
      n: Int = 50, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byRank = Window.orderBy(desc("score"), asc("doc_id"))
    val sparse = bm25Retrieval(spark, dir, queryTerms, n)
      .select(col("doc_id"), col("score"))
      .withColumn("sparse_rank", row_number().over(byRank))
      .drop("score")
    val dense = graft.sim.Similarity
      .bruteForceTopK(Tables.embeddings(spark, dir), queryVecId, n)
      .select(col("vec_id").as("doc_id"), col("score"))
      .withColumn("dense_rank", row_number().over(byRank))
      .drop("score")
    val rrfTerm = (r: org.apache.spark.sql.Column) =>
      coalesce(lit(1.0) / (lit(RrfK) + r.cast("double")), lit(0.0))
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf_score", rrfTerm(col("sparse_rank")) + rrfTerm(col("dense_rank")))
      .select(col("doc_id"), col("sparse_rank").cast("int").as("sparse_rank"),
        col("dense_rank").cast("int").as("dense_rank"), col("rrf_score"))
      .orderBy(desc("rrf_score"), asc("doc_id"))
      .limit(k)
  }

  /** MMR trade-off weight (Carbonell & Goldstein 1998's λ). LITERAL on
    * both engine sides: 0.7·rel − 0.3·maxSim is one multiply each plus one
    * subtract, bit-identical. */
  val MmrLambda = 0.7
  /** Written as its own literal, NOT computed as 1.0 − λ: IEEE 1.0 − 0.7 =
    * 0.30000000000000004, a different double than the 0.3 the oracle
    * spells. */
  val MmrPenaltyWeight = 0.3

  /** Maximal-marginal-relevance rerank of the dense top-`n`: greedily pick
    * `k` documents maximizing λ·relevance − (1−λ)·max-cosine-to-already-
    * selected — the standard diversified-retrieval pass that keeps a
    * training-data selection from spending its budget on one dense cluster.
    *
    * Scale shape: the corpus-sized work is the top-`n` leg (the q28
    * bounded-heap plan; an ANN lookup at 100 TB). The greedy loop runs on
    * the driver over the COLLECTED candidate set — O(k·n) with n=50, a
    * constant like the BPE merge table or a PQ codebook, independent of
    * corpus size.
    *
    * Determinism: relevance comes from the already-bit-exact q28 leg;
    * penalty cosines are sequential-fold dots over the same double-cast
    * vectors (the identical IEEE op sequence as `list_inner_product`);
    * `max` over ≤k−1 sims is order-free; λ-combine is two multiplies and a
    * subtract of literal-weighted doubles; argmax ties break on doc_id.
    * The DuckDB oracle replays the same greedy via WITH RECURSIVE. */
  def mmrRerank(spark: SparkSession, dir: String, queryVecId: Long = 0L,
      n: Int = 50, k: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").cast("array<double>").as("q_vec"))
    val cands = emb.filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      .crossJoin(broadcast(q))
      .withColumn("rel", graft.dedup.Dedup.cosine(col("vec"), col("q_vec")))
      .orderBy(desc("rel"), col("vec_id"))
      .limit(n)
      .select("vec_id", "rel", "vec")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray))

    def dotSeq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dotSeq(a, b) / (math.sqrt(dotSeq(a, a)) * math.sqrt(dotSeq(b, b)))

    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val remaining = scala.collection.mutable.LinkedHashMap(
      cands.map(c => c._1 -> c): _*)
    while (selected.length < k && remaining.nonEmpty) {
      // score every remaining candidate; argmax with doc_id tiebreak
      val scoredBest = remaining.values.map { case (id, rel, vec) =>
        val score = if (chosen.isEmpty) rel
          else MmrLambda * rel - MmrPenaltyWeight * chosen.map(cos(_, vec)).max
        (id, rel, vec, score)
      }.reduceLeft { (a, b) =>
        if (b._4 > a._4 || (b._4 == a._4 && b._1 < a._1)) b else a
      }
      selected += ((selected.length + 1, scoredBest._1, scoredBest._2, scoredBest._4))
      chosen += scoredBest._3
      remaining.remove(scoredBest._1)
    }
    import spark.implicits._
    selected.toSeq.toDF("mmr_rank", "doc_id", "rel", "mmr_score")
  }

  /** Inverted-index build: per term, document frequency, collection
    * frequency, the posting-list span, and the sorted posting list itself
    * (rendered as a comma-joined string so the artifact is
    * engine-portable). Postings are sorted NUMERICALLY before rendering —
    * collect_set's arrival order is partition-dependent and must never
    * leak into output.
    *
    * Scale shape: one explode + one term-keyed hash aggregate (map-side
    * combinable). At 100 TB a single term's posting list outgrows a row —
    * production shards the index by (term, doc_id range): add
    * `md5Bucket32(doc_id) % nShards` to the group key (exactly
    * [[SamplingQueries.md5Bucket32]]) and each shard stays row-sized while
    * the union of shards is this same table. The driver corpus vocabulary
    * is Heap's-law bounded, so the unsharded form is the honest query. */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val terms = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    terms.groupBy("term").agg(
      countDistinct(col("doc_id")).as("df"),
      count(lit(1)).as("cf"),
      min(col("doc_id")).as("first_doc"),
      max(col("doc_id")).as("last_doc"),
      array_join(
        transform(array_sort(collect_set(col("doc_id"))), _.cast("string")),
        ",").as("postings"))
  }

  /** q203: exact-phrase search through a POSITIONAL inverted index — the
    * retrieval shape q115's doc-level index cannot answer: "hash join"
    * must match only ADJACENT occurrences. Postings carry (doc_id,
    * position); the phrase plan is the classic positional-index join —
    * postings('hash') ⋈ postings('join') ON same doc AND consecutive
    * positions (each leg pre-shifted so the join key is the phrase START)
    * — so work is bounded by the queried terms' posting sizes, never the
    * corpus (the isin filter reaches the scan). Output per matching doc:
    * adjacent-occurrence count and first (1-based) position, all
    * integers. At 100 TB positional postings shard exactly like q115's
    * (term, doc-range) note. */
  def phraseSearch(spark: SparkSession, dir: String,
      phrase: Seq[String] = Seq("hash", "join")): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val postings = docs.select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "term")))
      .filter(col("term").isin(phrase: _*))
    val legs = phrase.zipWithIndex.map { case (t, i) =>
      postings.filter(col("term") === t)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }
    legs.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"),
        (min(col("start")) + 1).cast("long").as("first_pos"))
  }

  /** q166: hard-negative mining for retrieval training (the DPR/Contriever
    * data-prep step): for each anchor document, the query is its first 4
    * tokens, and the negatives are the top BM25-ranked OTHER documents —
    * lexically close enough to fool a sparse retriever, which is exactly
    * what makes them effective contrastive negatives. Output is one row
    * per (anchor, rank): the negative's id and its BM25 score.
    *
    * Exactness: q114's BM25 formula verbatim per (anchor, doc, term), but
    * the per-term contributions quantize to 1e9 fixed point BEFORE the
    * cross-term sum (`floor(s·1e9)` longs) — floor of a bit-identical
    * double is exact, so the BIGINT score mass is partial-aggregation-
    * order-independent and the rank (score_fp desc, doc_id) is a pure
    * integer sort. Scores stay ≤ ~6e4·1e9 ≈ 6e13 per term < 2^53, so the
    * final cast back to double is exact too.
    *
    * Scale shape: anchors and their query terms are a constant-size
    * broadcast; tf touches only matching terms (inverted-index lookup
    * shape at 100 TB); the heavy stage is one hash aggregate over
    * (anchor, doc) pairs bounded by anchors × docs-sharing-a-query-term,
    * and the final top-k per anchor is a bounded heap per partition. */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame =
    hardNegatives(Tables.documents(spark, dir))

  def hardNegatives(docs: DataFrame, nAnchors: Long = 8L,
      negK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val anchors = docs.filter(col("doc_id") < nAnchors)
      .select(col("doc_id").as("anchor_id"),
        explode(slice(tokens(col("text")), 1, 4)).as("term"))
      .distinct()
    val tf = toks.join(broadcast(anchors.select("term").distinct()), Seq("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val totals = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(toks.agg(count(lit(1)).as("total_tokens")))
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val norm = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) *
        (lit(0.25) + ((lit(0.75) * col("dl")) * col("n_docs")) / col("total_tokens")))
    val contrib = tf
      .join(broadcast(anchors), Seq("term"))
      .join(broadcast(dfT), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(totals))
      .select(col("anchor_id"), col("doc_id"),
        floor(idf * norm * lit(1e9)).cast("long").as("sfp"))
    val w = Window.partitionBy("anchor_id")
      .orderBy(col("score_fp").desc, col("doc_id").asc)
    contrib.groupBy("anchor_id", "doc_id")
      .agg(sum(col("sfp")).as("score_fp"))
      .filter(col("anchor_id") =!= col("doc_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= negK)
      .select(col("anchor_id"), col("rank").cast("long").as("rank"),
        col("doc_id").as("neg_id"),
        (col("score_fp").cast("double") / lit(1e9)).as("score"))
  }
}
