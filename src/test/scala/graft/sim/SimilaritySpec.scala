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
      numPlanes = 8, dim = 32, maxHamming = 4)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
    assert(got.nonEmpty)
    got.foreach { case (id, s) => assert(s === exact(id)) }
    // multi-probe at hamming<=4 over 8 planes should recover most of top-5
    val top5 = exact.toSeq.sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
    assert(got.map(_._1).count(top5.contains) >= 3)
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
