package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BM25 retrieval, inverted index, LM quality filter, stratified sample:
  * determinism, score/selection invariants, and cross-operator agreement
  * (the driver's DuckDB oracles check engine-exactness; these specs check
  * the semantics are the intended ones). */
class RetrievalQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bm25Retrieval: k results, descending scores, only matching docs") {
    val top = RetrievalQueries.bm25Retrieval(spark, sf, k = 20).collect()
    assert(top.length === 20)
    val scores = top.map(_.getDouble(2))
    assert(scores.sorted(Ordering[Double].reverse).sameElements(scores))
    assert(scores.forall(_ > 0.0))
    // every returned doc contains at least one query term
    val ids = top.map(_.getLong(0)).toSet
    val texts = graft.Tables.documents(spark, sf)
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(ids.forall(id => RetrievalQueries.DefaultQueryTerms
      .exists(t => texts(id).split("\\s+").contains(t))))
    // deterministic re-run
    val again = RetrievalQueries.bm25Retrieval(spark, sf, k = 20).collect()
    assert(top.map(r => (r.getLong(0), r.getDouble(2))).toSeq ===
      again.map(r => (r.getLong(0), r.getDouble(2))).toSeq)
  }

  test("bm25Retrieval: higher tf of a rare term outranks lower, all else equal") {
    // single-term query: score is monotone in tf for fixed dl; verify the
    // top doc maximizes the (tf, -dl) trade-off direction at least weakly
    val one = RetrievalQueries.bm25Retrieval(spark, sf, Seq("vector"), k = 5).collect()
    assert(one.length === 5)
    assert(one.map(_.getDouble(2)).distinct.length >= 2,
      "scores should discriminate, not tie everywhere")
  }

  test("hybridRetrieval: RRF fuses the two legs' ranks exactly") {
    val fused = RetrievalQueries.hybridRetrieval(spark, sf).collect()
    assert(fused.length === 20)
    // recompute leg ranks independently
    def ranksOf(rows: Array[(Long, Double)]): Map[Long, Int] =
      rows.sortBy { case (id, s) => (-s, id) }.zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val sparse = ranksOf(RetrievalQueries.bm25Retrieval(spark, sf, k = 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)))
    val dense = ranksOf(graft.sim.Similarity
      .bruteForceTopK(graft.Tables.embeddings(spark, sf), 0L, 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)))
    val expected = (sparse.keySet ++ dense.keySet).toSeq.map { id =>
      val s = sparse.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      val d = dense.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, s + d)
    }.sortBy { case (id, s) => (-s, id) }.take(20)
    assert(fused.map(_.getLong(0)).toSeq === expected.map(_._1))
    fused.foreach { r =>
      val id = r.getLong(0)
      assert(Option(r.get(1)).map(_.asInstanceOf[Int]) === sparse.get(id))
      assert(Option(r.get(2)).map(_.asInstanceOf[Int]) === dense.get(id))
      assert(r.getDouble(3) === expected.find(_._1 == id).get._2)
    }
    // rrf is monotone-decreasing down the output
    val scores = fused.map(_.getDouble(3))
    assert(scores.sorted(Ordering[Double].reverse).sameElements(scores))
    // deterministic re-run
    val again = RetrievalQueries.hybridRetrieval(spark, sf).collect()
    assert(fused.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("mmrRerank: greedy-optimal at every step, diversity strictly binds") {
    val out = RetrievalQueries.mmrRerank(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length === 10)
    assert(out.map(_._1).toSeq === (1 to 10))
    assert(out.map(_._2).distinct.length === 10)

    // independent candidate set + cosine
    val cands = graft.sim.Similarity
      .bruteForceTopK(graft.Tables.embeddings(spark, sf), 0L, 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def cos(a: Array[Double], b: Array[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    // step 1 = pure argmax relevance
    assert(out.head._2 === cands.toSeq.sortBy { case (id, s) => (-s, id) }.head._1)
    assert(out.head._4 === cands(out.head._2))
    // every later pick beats (or doc_id-ties under) all rejected candidates
    // under the MMR objective against the selected-so-far set
    for (step <- 2 to 10) {
      val chosen = out.take(step - 1).map(x => vecs(x._2))
      def mmr(id: Long) =
        0.7 * cands(id) - 0.3 * chosen.map(c => cos(c, vecs(id))).max
      val picked = out(step - 1)
      assert(picked._4 === mmr(picked._2), s"step $step score")
      (cands.keySet -- out.take(step - 1).map(_._2) - picked._2).foreach { other =>
        val o = mmr(other)
        assert(o < picked._4 || (o == picked._4 && other > picked._2),
          s"step $step: candidate $other beats pick ${picked._2}")
      }
    }
    // diversity actually re-ordered: MMR order differs from pure relevance
    val pureTop10 = cands.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(10).map(_._1)
    assert(out.map(_._2).toSeq !== pureTop10,
      "MMR should diverge from the pure-relevance ranking on this corpus")
  }

  test("invertedIndex: df matches posting length, span matches endpoints") {
    val idx = RetrievalQueries.invertedIndex(spark, sf).collect()
    assert(idx.nonEmpty)
    idx.foreach { r =>
      val postings = r.getAs[String]("postings").split(",").map(_.toLong)
      assert(postings.length.toLong === r.getAs[Long]("df"), r.getAs[String]("term"))
      assert(postings.sorted.sameElements(postings), "postings must be sorted")
      assert(postings.head === r.getAs[Long]("first_doc"))
      assert(postings.last === r.getAs[Long]("last_doc"))
      assert(r.getAs[Long]("cf") >= r.getAs[Long]("df"))
    }
    // df agrees with the independent per-term distinct count
    val viaDocs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(graft.text.TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("term").agg(countDistinct("doc_id").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    idx.foreach(r => assert(r.getAs[Long]("df") === viaDocs(r.getAs[String]("term"))))
  }

  test("lmQualityFilter: selects a strict, threshold-true subset of unigramLm") {
    val all = CorpusQueries.unigramLm(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    val kept = CorpusQueries.lmQualityFilter(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(kept.nonEmpty && kept.size < all.size, s"${kept.size} of ${all.size}")
    kept.foreach { case (id, (avg, min)) =>
      assert(avg >= 0.03325 && min >= 0.030, s"doc $id")
      assert(all(id) === ((avg, min)))
    }
    // exactly the docs passing the thresholds — nothing dropped spuriously
    val expect = all.filter { case (_, (a, m)) => a >= 0.03325 && m >= 0.030 }
    assert(kept.keySet === expect.keySet)
  }

  test("stratifiedSample: per-stratum rates honored, deterministic, map-only") {
    val s = SamplingQueries.stratifiedSample(spark, sf)
    val rows = s.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("bucket") < r.getAs[Long]("rate_pct"))
      val w = (r.getAs[String]("source").drop(3).toInt % 4 + 1) * 10
      assert(r.getAs[Long]("rate_pct") === w.toLong)
    }
    // sampled fraction tracks the stratum rate (±25 pct points — strata
    // hold only ~25 docs at sf0.001, so the binomial sd alone is ~10 pts)
    val total = graft.Tables.documents(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (src, xs) =>
      val frac = xs.length.toDouble / total(src)
      val rate = xs.head.getAs[Long]("rate_pct") / 100.0
      assert(math.abs(frac - rate) < 0.25, s"$src frac=$frac rate=$rate")
    }
    assert(s.collect().map(_.getLong(1)).toSet === rows.map(_.getLong(1)).toSet)
    // shuffle-free: no Exchange in the plan
    assert(!s.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
