package graft.sim

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    val dot = ad.zip(bd).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
    val na = math.sqrt(ad.map(x => x * x).foldLeft(0.0)(_ + _))
    val nb = math.sqrt(bd.map(x => x * x).foldLeft(0.0)(_ + _))
    dot / (na * nb)
  }

  private lazy val rnd = new scala.util.Random(11)
  private lazy val vecs: Map[Long, Seq[Float]] =
    (0L to 60L).map(i => i -> Seq.fill(32)(rnd.nextGaussian().toFloat)).toMap
  private lazy val emb = vecs.toSeq.toDF("vec_id", "embedding")

  test("bruteForceTopK matches driver-side exact ranking, bit-for-bit") {
    val got = Similarity.bruteForceTopK(emb, queryId = 0L, k = 5)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
    val expected = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cosine(v, vecs(0L))) }
      .sortBy { case (id, s) => (-s, id) }
      .take(5)
    assert(got.map(_._1).toSeq === expected.map(_._1))
    got.zip(expected).foreach { case ((_, g), (_, e)) => assert(g === e) }
  }

  test("lshTopK results are drawn from the exact ranking with exact scores") {
    val exact = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => id -> cosine(v, vecs(0L)) }.toMap
    val got = Similarity.lshTopK(emb, queryId = 0L, k = 5,
      bands = 12, planesPerBand = 8, maxHamming = 2, dim = 32)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
    assert(got.nonEmpty)
    got.foreach { case (id, s) => assert(s === exact(id)) }
    // banded probing at hamming<=2 over 12 bands recovers most of top-5
    val top5 = exact.toSeq.sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
    assert(got.map(_._1).count(top5.contains) >= 3)
  }

  test("trainCentroids recovers planted clusters; ivfTopK has high recall") {
    val rnd = new scala.util.Random(5)
    val anchors = Seq.fill(3)(Seq.fill(16)(rnd.nextGaussian().toFloat * 3f))
    val clustered: Map[Long, Seq[Float]] = (0L until 90L).map { i =>
      val a = anchors((i % 3).toInt)
      i -> a.map(x => x + rnd.nextGaussian().toFloat * 0.1f)
    }.toMap
    val emb = clustered.toSeq.toDF("vec_id", "embedding")

    val centroids = Similarity.trainCentroids(emb, k = 3, iters = 5)
    assert(centroids.count() === 3)
    // vectors from the same generative cluster land on the same centroid
    val assigned = Similarity.assignToCentroids(emb, centroids)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("centroid_id")).toMap
    (0 until 3).foreach { g =>
      val members = (0L until 90L).filter(_ % 3 == g).map(assigned)
      assert(members.distinct.length === 1, s"cluster $g split: $members")
    }

    // IVF with nprobe=1 on well-separated clusters: exact top-5 recovered
    val ivf = Similarity.ivfTopK(emb, centroids, queryId = 0L, k = 5, nprobe = 1)
      .collect().map(_.getLong(0)).toSet
    val brute = Similarity.bruteForceTopK(emb, queryId = 0L, k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(ivf === brute)
  }

  test("IVF recall bound holds on the unclustered driver corpus") {
    // Gaussian noise is IVF's worst case (no cluster structure to exploit);
    // the q44 config (k=8, iters=3, nprobe=6) must still recover >= 8 of
    // the exact top-10. On clustered data the planted-cluster test above
    // shows the same operator exact at nprobe=1.
    val path = "/root/testdata/sf0.01/embeddings.parquet"
    assume(new java.io.File(path).exists())
    val corpus = spark.read.parquet(path)
    val brute = Similarity.bruteForceTopK(corpus, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val cents = Similarity.trainCentroids(corpus, k = 8, iters = 3)
    val ivf = Similarity.ivfTopK(corpus, cents, 0L, 10, nprobe = 6)
      .collect().map(_.getLong(0)).toSet
    assert((ivf & brute).size >= 8, s"recall ${(ivf & brute).size}/10")
  }

  test("lshParams clears the recall target and tracks corpus size") {
    // driver-corpus shape: threshold 0.5, 95% target, ~500 vectors
    val (bands, r) = Similarity.lshParams(0.5, 0.95, corpusSize = 500)
    assert(r >= 4)
    assert(Similarity.bandedRecall(0.5, bands, r) >= 0.95)
    // recall improves with similarity (sanity of the closed form)
    assert(Similarity.bandedRecall(0.8, bands, r) >
      Similarity.bandedRecall(0.5, bands, r))
    // a 1000x corpus needs finer buckets (larger r), and the chosen bands
    // still clear the target
    val (bands2, r2) = Similarity.lshParams(0.5, 0.95, corpusSize = 500000)
    assert(r2 > r)
    assert(Similarity.bandedRecall(0.5, bands2, r2) >= 0.95)
  }

  test("lshParamsForTable sizes geometry from footer row counts, no scan") {
    val root = tmpDir("lsh-params-table")
    val t = graft.table.GraftTable.create(spark, root,
      (0L until 64L).map(i => (i, s"d$i")).toDF("id", "v"))
    assert(t.rowCount === 64L)
    t.append((64L until 128L).map(i => (i, s"d$i")).toDF("id", "v"))
    assert(t.rowCount === 128L) // appends accumulate in the metadata count
    val (bands, r) = Similarity.lshParamsForTable(t, 0.5, 0.95)
    assert(Similarity.bandedRecall(0.5, bands, r) >= 0.95)
    assert((bands, r) === Similarity.lshParams(0.5, 0.95, corpusSize = 128))
  }

  test("assignToCentroids picks the nearest centroid for every vector") {
    val centroids = Seq(
      (0L, Seq.fill(32)(1.0f)),
      (1L, Seq.fill(32)(-1.0f))).toDF("centroid_id", "centroid")
    val out = Similarity.assignToCentroids(emb, centroids).collect()
    assert(out.length === vecs.size)
    out.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val c = r.getAs[Long]("centroid_id")
      val c0 = cosine(vecs(id), Seq.fill(32)(1.0f))
      val c1 = cosine(vecs(id), Seq.fill(32)(-1.0f))
      val best = if (c0 >= c1) 0L else 1L
      assert(c === best, s"vec $id assigned $c, expected $best")
    }
  }
}
