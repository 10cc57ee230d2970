package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // Small corpus with known duplicate structure: 1↔2 exact dup, 3≈4 near
  // dup (one word changed), 5 a permutation of 1, 6 unrelated.
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"),
    (3L, "a completely different sentence about spark query engines and big data processing"),
    (4L, "a completely different sentence about flink query engines and big data processing"),
    (5L, "today again and again dog lazy the over jumps fox brown quick the"),
    (6L, "unrelated text with nothing shared at all whatsoever in any way")
  ).toDF("doc_id", "text")

  private def bruteJaccard(n: Int): Map[(Long, Long), Double] = {
    val sets = docs.collect().map { r =>
      val toks = r.getString(1).split("\\s+").toSeq
      r.getLong(0) -> toks.sliding(n).map(_.mkString(" ")).toSet
    }.toMap
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size.toDouble
      uni = (sets(a) | sets(b)).size.toDouble
    } yield (a, b) -> inter / uni).toMap
  }

  test("exactDedup groups identical texts, keeps min id") {
    val out = Dedup.exactDedup(docs).collect()
    assert(out.length === 5) // 1&2 collapse
    val dupGroup = out.find(_.getAs[Long]("dup_count") === 2L).get
    assert(dupGroup.getAs[Long]("keeper_id") === 1L)
  }

  test("tokenSetDedup groups word-order permutations") {
    val out = Dedup.tokenSetDedup(docs).collect()
    // 1, 2 and 5 share a token set
    val g = out.find(_.getAs[Long]("dup_count") === 3L)
    assert(g.isDefined)
    assert(g.get.getAs[Long]("keeper_id") === 1L)
  }

  test("ngramJaccardPairs matches brute-force jaccard") {
    val expected = bruteJaccard(3).filter(_._2 >= 0.3).keySet
    val got = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.3)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(got === expected)
    // and the jaccard values themselves are exact
    val gotVals = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.3)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("jaccard")).toMap
    gotVals.foreach { case (k, v) => assert(math.abs(v - bruteJaccard(3)(k)) < 1e-12) }
  }

  test("ngramJaccardPairs plans exactly one Window pass (prefix stage)") {
    // Optimization-round-12 shape pin: the per-doc set size rides from the
    // pre-explode array, so the prefix stage needs only the row_number
    // window — a regression to the count(*)-over-doc_id phrasing doubles
    // the Window/Sort passes over the corpus-sized gram table. Below the
    // staging gate the whole pipeline is one plan, so the window count is
    // directly countable on the executed plan.
    // Below the staging gate the candidate self-join carries the prefix
    // subtree once per side (documented trade), so count DISTINCT window
    // computations, not occurrences: one row_number pass — the old shape
    // carried a second count(*)-over-doc_id Window (two distinct specs).
    val plan = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.3)
      .queryExecution.optimizedPlan
    val windows = plan.collectWithSubqueries {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    val distinctSpecs = windows
      .map(w => (w.windowExpressions.map(_.sql), w.orderSpec.map(_.sql)))
      .distinct
    assert(windows.nonEmpty && distinctSpecs.size === 1,
      s"expected one distinct Window pass in the PPJoin plan, got " +
        s"${distinctSpecs.size} distinct of ${windows.size} total")
  }

  test("minhashNearDups finds the exact and near duplicates") {
    val got = Dedup.minhashNearDups(docs, n = 3, k = 32, bands = 8, threshold = 0.3)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    // Exact dup pair must always survive (identical signatures);
    // verification step makes every reported pair truly >= threshold.
    assert(got.contains((1L, 2L)))
    val truth = bruteJaccard(3).filter(_._2 >= 0.3).keySet
    assert(got.subsetOf(truth)) // no false positives after verify
  }

  test("simhash: identical docs share fingerprints; near dups are close") {
    val fps = Dedup.simhashFingerprints(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) === fps(5L)) // simhash over distinct tokens: permutation-invariant
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(3L), fps(4L)) < ham(fps(3L), fps(6L)))
    val pairs = Dedup.simhashNearDups(docs, maxDist = 3)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("embedding near-dup: LSH pairs are a subset of exact pairs") {
    val rnd = new scala.util.Random(7)
    def vec(): Seq[Float] = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val base = vec()
    val nearDup = base.zipWithIndex.map { case (v, i) => if (i == 0) v + 0.01f else v }
    val emb = (Seq(100L -> base, 101L -> nearDup) ++
      (1L to 40L).map(i => i -> vec())).toDF("vec_id", "embedding")

    val exact = Dedup.embeddingNearDupsExact(emb, 0.9).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(exact.contains((100L, 101L)))
    val lsh = Dedup.embeddingNearDupsLsh(emb, 0.9, bands = 8, planesPerBand = 6, dim = 16)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.contains((100L, 101L))) // ~identical vectors share every sign bit
  }

  test("banded LSH recovers every exact pair on the driver corpus") {
    // The round-1 single-code construction (12 planes, one bucket) missed
    // the only cosine>=0.5 pair at sf0.01 — this pins the redesigned banded
    // multi-probe recall against the real driver corpus.
    val path = "/root/testdata/sf0.01/embeddings.parquet"
    assume(new java.io.File(path).exists())
    val emb = spark.read.parquet(path)
    val exact = Dedup.embeddingNearDupsExact(emb, 0.5).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(exact.nonEmpty)
    val lsh = Dedup.embeddingNearDupsLsh(emb, 0.5).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(lsh === exact)
  }

  test("duplicateClusters: components, keepers, singletons, chain diameter") {
    val nodes = (1L to 7L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // 1-2-3 a chain (diameter 2 — needs >1 propagation round), 5-6 a pair,
    // 4 and 7 singletons.
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a_id", "b_id")
    val out = Dedup.duplicateClusters(nodes, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size")))).toMap
    assert(out === Map(
      1L -> ((1L, 3L)), 2L -> ((1L, 3L)), 3L -> ((1L, 3L)),
      4L -> ((4L, 1L)), 5L -> ((5L, 2L)), 6L -> ((5L, 2L)), 7L -> ((7L, 1L))))
  }

  test("duplicateClusters: pointer jumping converges a 40-link chain in 8 rounds") {
    // plain min-label propagation would need 39 rounds; path halving gets
    // there in ~log2(39)+1 — maxIters=8 fails without the jump step
    val nodes = (1L to 40L).map(i => (i, s"n$i")).toDF("doc_id", "text")
    val pairs = (1L to 39L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val out = Dedup.duplicateClusters(nodes, pairs, maxIters = 8).collect()
    assert(out.length === 40)
    assert(out.forall(_.getAs[Long]("cluster_id") === 1L))
    assert(out.forall(_.getAs[Long]("cluster_size") === 40L))
  }

  test("duplicateClusters over jaccard pairs groups dups, leaves singletons") {
    val out = Dedup.duplicateClusters(docs,
        Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.3)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(out(1L) === 1L && out(2L) === 1L)
    assert(out(3L) === out(4L)) // near-dup pair shares a cluster
    assert(out(6L) === 6L)      // unrelated doc stays a singleton
  }
}
