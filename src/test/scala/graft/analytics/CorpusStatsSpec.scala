package graft.analytics

import graft.SparkSpec

/** Brute-force oracles for the corpus-statistics trio (q149–q151): each is
  * recomputed in plain Scala over the collected sf0.001 tables with the SAME
  * fixed-point arithmetic the distributed plans use, so equality is exact
  * (every integer sum stays below 2^53 — int→double conversion is lossless,
  * and the double expression trees are replicated operation-for-operation).
  */
class CorpusStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("embeddingCov matches the fixed-point brute force exactly") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("cast(embedding as array<double>) as v")
      .collect().map(_.getSeq[Double](0).toArray)
    val d = vecs.head.length
    val n = vecs.length.toLong

    // first moments: sx[i] = Σ floor(x_i · 1e9), exact longs
    val sx = Array.ofDim[Long](d)
    vecs.foreach { v =>
      var i = 0
      while (i < d) { sx(i) += math.floor(v(i) * 1e9).toLong; i += 1 }
    }
    def mean(i: Int): Double = sx(i).toDouble / n / 1e9

    // cross moments: sxy[i][j] = Σ floor(x_i · x_j · 1e12), exact longs
    val sxy = Array.ofDim[Long](d, d)
    vecs.foreach { v =>
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { sxy(i)(j) += math.floor(v(i) * v(j) * 1e12).toLong; j += 1 }
        i += 1
      }
    }

    val got = CorpusQueries.embeddingCov(spark, sf).collect()
    assert(got.length === d * d)
    got.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      assert(r.getLong(2) === n)
      val want = sxy(i)(j).toDouble / 1e12 / n - mean(i) * mean(j)
      assert(r.getDouble(3) === want, s"cov($i,$j)")
    }
    // covariance of an exact-integer-summed symmetric kernel is symmetric
    val m = got.map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    for (i <- 0 until d; j <- 0 until i)
      assert(m((i, j)) === m((j, i)), s"symmetry ($i,$j)")
  }

  test("softDedupWeights matches per-doc 1/cluster_size reweighting") {
    val size = CorpusQueries.dupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val docs = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id", "source", "text").collect().map { r =>
        val tc = r.getString(2).trim.split("\\s+").count(_.nonEmpty).toLong
        val w = size.get(r.getLong(0))
          .map(s => math.floor(1e9 / s).toLong).getOrElse(1000000000L)
        (r.getString(1), tc, w)
      }
    val expected = docs.groupBy(_._1).map { case (src, xs) =>
      src -> (xs.length.toLong, xs.map(_._2).sum,
        xs.map(_._3).sum.toDouble / 1e9,
        xs.map(x => x._3 * x._2).sum.toDouble / 1e9)
    }

    val got = CorpusQueries.softDedupWeights(spark, sf).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
    }.toMap
    assert(got === expected)
    // dedup never inflates a budget: effective ≤ raw, and a corpus with
    // any multi-doc cluster is strictly smaller in aggregate
    got.foreach { case (src, (nd, nt, ed, et)) =>
      assert(ed <= nd.toDouble + 1e-9, src)
      assert(et <= nt.toDouble + 1e-9, src)
    }
    if (size.values.exists(_ > 1))
      assert(got.values.map(_._3).sum < got.values.map(_._1).sum.toDouble)
  }

  test("vocabCoverage matches the brute-force top-k curve") {
    val counts = graft.Tables.documents(spark, sf)
      .selectExpr("text").collect()
      .flatMap(r => r.getString(0).trim.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val total = counts.values.sum
    val k = 10
    val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
    val cums = top.scanLeft(0L)(_ + _._2).tail

    val got = CorpusQueries.vocabCoverage(spark, sf, k).collect()
    assert(got.length === math.min(k, counts.size))
    got.zipWithIndex.foreach { case (r, idx) =>
      assert(r.getInt(0) === idx + 1)
      assert(r.getString(1) === top(idx)._1)
      assert(r.getLong(2) === top(idx)._2)
      assert(r.getDouble(3) === cums(idx).toDouble / total)
    }
    // the curve is a CDF prefix: strictly increasing, ending ≤ 1
    val fr = got.map(_.getDouble(3))
    fr.sliding(2).foreach { case Array(a, b) => assert(a < b); case _ => }
    assert(fr.last <= 1.0)
  }

  test("vocabCoverage plans the top-k as TakeOrderedAndProject, not a global sort") {
    val plan = CorpusQueries.vocabCoverage(spark, sf, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
