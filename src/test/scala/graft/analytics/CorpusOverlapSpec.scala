package graft.analytics

import graft.SparkSpec

/** Brute-force oracles for the corpus-global overlap/novelty ops: both are
  * recomputed in plain Scala over the collected sf0.001 corpus and compared
  * row-for-row, so the distributed plans (distinct → self-join / min-struct
  * winner) are held to the naive definition. */
class CorpusOverlapSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val corpus: Array[(Long, String, Set[String])] =
    graft.Tables.documents(spark, sf)
      .selectExpr("doc_id", "source", "text").collect().map { r =>
        val toks = r.getString(2).trim.split("\\s+").toSeq
        val grams = if (toks.size < 3) Set.empty[String]
          else toks.sliding(3).map(_.mkString(" ")).toSet
        (r.getLong(0), r.getString(1), grams)
      }

  private def md5Bucket32(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("sourceOverlap matches the brute-force pairwise gram sets") {
    val bySource = corpus.groupBy(_._2).map { case (s, xs) =>
      s -> xs.iterator.flatMap(_._3).toSet
    }
    val expected = (for {
      a <- bySource.keys; b <- bySource.keys if a < b
      shared = (bySource(a) & bySource(b)).size.toLong if shared > 0
    } yield (a, b) -> (bySource(a).size.toLong, bySource(b).size.toLong, shared)).toMap

    val got = CorpusQueries.sourceOverlap(spark, sf).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))
    }.toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, (szA, szB, shared, jac, cont)) =>
      val (eA, eB, eS) = expected(k)
      assert((szA, szB, shared) === (eA, eB, eS), s"counts of $k")
      assert(jac === eS.toDouble / (eA + eB - eS), s"jaccard of $k")
      assert(cont === eS.toDouble / math.min(eA, eB), s"containment of $k")
      assert(jac >= 0.0 && jac <= 1.0 && cont >= jac && cont <= 1.0)
    }
  }

  test("ngramNovelty: min-struct winner equals the hash-order first carrier") {
    // brute force: per gram, the carrier minimizing (md5Bucket32(id), id)
    val firstCarrier = corpus.iterator
      .flatMap { case (id, _, grams) => grams.iterator.map(g => g -> id) }
      .toSeq.groupBy(_._1).map { case (_, xs) =>
        xs.map(_._2).minBy(id => (md5Bucket32(id), id))
      }
    val expectedNovel = firstCarrier.groupBy(identity).map { case (id, xs) => id -> xs.size.toLong }
    val expectedSz = corpus.collect { case (id, _, g) if g.nonEmpty => id -> g.size.toLong }.toMap

    val got = CorpusQueries.ngramNovelty(spark, sf).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))
    }.toMap
    assert(got.keySet === expectedSz.keySet)
    got.foreach { case (id, (novel, sz, ratio)) =>
      assert(novel === expectedNovel.getOrElse(id, 0L), s"novel of $id")
      assert(sz === expectedSz(id), s"distinct_shingles of $id")
      assert(ratio === novel.toDouble / sz)
    }
    // conservation: every distinct corpus gram is introduced exactly once
    val totalGrams = corpus.iterator.flatMap(_._3).toSet.size.toLong
    assert(got.values.map(_._1).sum === totalGrams)
  }

  private def md5Half32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("sourceOverlapSketch matches the brute-force KMV estimate; plan is sketch-sized") {
    val k = 256
    val bySource = corpus.groupBy(_._2).map { case (s, xs) =>
      s -> xs.iterator.flatMap(_._3).toSet
    }
    val sketches: Map[String, Set[Long]] = bySource.map { case (s, grams) =>
      s -> grams.map(md5Half32).toSeq.distinct.sorted.take(k).toSet
    }
    val expected = (for {
      a <- bySource.keys; b <- bySource.keys if a < b
    } yield {
      val unionK = (sketches(a) | sketches(b)).toSeq.sorted.take(k)
      val est = unionK.count(v => sketches(a)(v) && sketches(b)(v))
        .toDouble / unionK.size
      val shared = (bySource(a) & bySource(b)).size.toLong
      val exact = if (shared == 0) 0.0
        else shared.toDouble /
          (bySource(a).size + bySource(b).size - shared)
      (a, b) -> ((est, exact))
    }).toMap

    val df = CorpusQueries.sourceOverlapSketch(spark, sf)
    val got = df.collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    }.toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (key, (est, exact, err)) =>
      val (eEst, eExact) = expected(key)
      assert(est === eEst, s"estimate of $key")
      assert(exact === eExact, s"exact of $key")
      assert(err === math.abs(est - exact), s"abs_err of $key")
    }

    // Plan shape: the ONLY non-equi join is the DISTINCT-SOURCE pair
    // cross (cardinality = source count, a constant at any corpus size);
    // every per-value step joins on h or (src_a, src_b).
    val plan = df.queryExecution.executedPlan.toString
    val crosses = "CartesianProduct|BroadcastNestedLoopJoin".r
      .findAllIn(plan).size
    assert(crosses <= 1, s"expected at most the source-pair cross:\n$plan")
  }
}
