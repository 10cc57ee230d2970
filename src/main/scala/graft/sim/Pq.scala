package graft.sim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.VectorExpressions

import graft.dedup.Dedup.{cosine, dot}

/** Product quantization for billion-scale ANN (ROADMAP: PQ-style
  * sub-quantization). A dim-D vector becomes `m` small integer codes — one
  * per D/m-dim subspace, indexing that subspace's k-centroid codebook — so
  * the shortlist scan reads ~16× less than raw doubles; candidates are then
  * re-ranked EXACTLY against the raw vectors (the standard ADC + rerank
  * pipeline, which is what bounds the accuracy loss).
  *
  * Scale shape: training is k-means over ALL m subspaces in one DataFrame
  * pipeline per iteration (subspace is just another grouping key);
  * codebooks are m×k×(D/m) doubles — driver-resident metadata, collected
  * per iteration exactly like [[Similarity.trainCentroids]]. Encode and ADC
  * scoring are single codegen'd expressions
  * ([[org.apache.spark.sql.graftnative.PqEncode]] /
  * [[org.apache.spark.sql.graftnative.PqAdcScore]]); the query's lookup
  * table is m×k doubles built driver-side from the (collected, bounded)
  * query vector.
  */
object Pq {

  /** Codebooks flattened subspace-major: centroid (s, c) occupies
    * `[(s*k + c)*subDim, …+subDim)`. */
  final case class Model(m: Int, k: Int, dim: Int, codebooks: IndexedSeq[Double]) {
    val subDim: Int = dim / m
  }

  /** Train per-subspace codebooks: seeded init (k rows per subspace by
    * murmur order), then `iters` rounds of assign + per-(subspace,
    * centroid, position) means — all subspaces in each single pass.
    *
    * Sample-based past `trainCap` vectors, like
    * [[Similarity.trainCentroids]]: per-iteration cost is
    * n·m·k fit evaluations, so at corpus scale the codebooks train on the
    * `trainCap` smallest-murmur vec_ids (deterministic, uniform, a
    * superset of the murmur-seeded init) — ~256 training sub-vectors per
    * code at the default geometry, comfortably past the k-means rule of
    * thumb — while ENCODING still covers every vector, once. Corpora at
    * or under the cap train on everything, exactly as before. */
  def train(emb: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 3, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainCap: Int = 65536): Model = {
    val spark = emb.sparkSession
    val subDim = dim / m
    require(m * subDim == dim, s"dim $dim must divide into $m subspaces")
    val vec = col(vecCol).cast("array<double>")
    val sample = emb.select(col(idCol), col(vecCol))
      .withColumn("__h", hash(col(idCol)))
      .orderBy(col("__h"), col(idCol)).limit(trainCap)
      .drop("__h")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // init: codebook (s, c) = sub-vector s of the c-th lowest-murmur
    // training vector — k×dim doubles, collected once (bounded metadata,
    // like the centroid tables).
    val initVecs = sample
      .withColumn("__h", hash(col(idCol)))
      .orderBy(col("__h"), col(idCol)).limit(k)
      .select(vec.as("v")).collect().map(_.getSeq[Double](0))
    require(initVecs.nonEmpty, "PQ training needs at least one vector")
    // Mutable flat codebook; ABSENT centroids (lost all members during an
    // iteration) hold +Inf sentinels: their distance to any sub-vector is
    // +Inf, so the encoder can never assign to them — exactly the
    // candidate set of a join against only the live centroid rows.
    val cb = Array.fill(m * k * subDim)(Double.PositiveInfinity)
    initVecs.zipWithIndex.foreach { case (v, c) =>
      var s = 0
      while (s < m) {
        var j = 0
        while (j < subDim) {
          cb((s * k + c) * subDim + j) = v(s * subDim + j); j += 1
        }
        s += 1
      }
    }

    // Each iteration: ONE codegen'd encode pass over the sample (the same
    // [[org.apache.spark.sql.graftnative.PqEncode]] kernel the index's
    // encode step uses — identical L2 argmin and lowest-cid tie rule as
    // the previous join formulation, without materializing the
    // n·m·k assign join), then per-(subspace, centroid, position) means.
    val subArr = array((0 until m).map(s => slice(vec, s * subDim + 1, subDim)): _*)
    (0 until iters).foreach { _ =>
      val enc = sample.select(
        VectorExpressions.pqEncode(vec, cb.toIndexedSeq, m, k).as("codes"),
        subArr.as("subs"))
      val updated = enc
        .select(posexplode(arrays_zip(col("codes"), col("subs"))).as(Seq("sub", "z")))
        .select(col("sub"), col("z.codes").cast("long").as("cid"), col("z.subs").as("sv"))
        .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("sub", "cid", "pos").agg(avg("x").as("mean"))
        .groupBy("sub", "cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("mean")))).as("pm"))
        .select(col("sub"), col("cid"), expr("transform(pm, p -> p.mean)").as("cv"))
      // k×dim doubles collected per iteration — severs lineage, same
      // pattern as trainCentroids
      java.util.Arrays.fill(cb, Double.PositiveInfinity)
      updated.collect().foreach { r =>
        val s = r.getAs[Int]("sub"); val c = r.getAs[Long]("cid").toInt
        val v = r.getSeq[Double](2)
        var j = 0
        while (j < subDim) { cb((s * k + c) * subDim + j) = v(j); j += 1 }
      }
    }

    // Final model: dead slots back-fill from any surviving centroid of the
    // same subspace (the sentinel must not leak into the shipped model).
    val flat = (0 until m).flatMap { s =>
      val live = (0 until k).find(c => !cb((s * k + c) * subDim).isPosInfinity)
        .getOrElse(throw new IllegalStateException(s"PQ subspace $s trained no centroid"))
      (0 until k).flatMap { c =>
        val off = (s * k + c) * subDim
        val src = if (cb(off).isPosInfinity) (s * k + live) * subDim else off
        (0 until subDim).map(j => cb(src + j))
      }
    }
    Model(m, k, dim, flat.toIndexedSeq)
    } finally sample.unpersist()
  }

  /** Codes + exact norm per vector — the compact index table one would
    * persist (and partition) at scale. */
  def encode(emb: DataFrame, model: Model,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val vec = col(vecCol).cast("array<double>")
    emb.select(col(idCol).as("vec_id"),
      VectorExpressions.pqEncode(vec, model.codebooks, model.m, model.k).as("codes"),
      sqrt(dot(vec, vec)).as("norm"))
  }

  /** Approximate cosine top-k with exact rerank: ADC-score the coded table
    * against the query's lookup table, take a `shortlist` (TakeOrdered —
    * no full sort), then re-rank those ids exactly against the raw
    * vectors. Collecting the single query vector (dim doubles) is bounded
    * metadata, like the centroid tables. */
  def topK(emb: DataFrame, codes: DataFrame, model: Model, queryId: Long, k: Int,
      shortlist: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      query: Option[(Seq[Double], Double)] = None): DataFrame = {
    val (q, qNorm) = query.getOrElse(queryVector(emb, queryId, idCol, vecCol))
    shortlistAndRerank(emb, codes.filter(col("vec_id") =!= queryId),
      model, q, qNorm, k, shortlist, idCol, vecCol)
  }

  /** Fused IVF+PQ probe (ROADMAP round-3 #4): the coarse quantizer narrows
    * the scan to the `nprobe` clusters nearest the query, ADC narrows those
    * to a shortlist over byte codes, and the exact rerank touches only the
    * shortlist's raw vectors. At scale, with the code table partitioned by
    * centroid_id, a query reads nprobe/k of the codes (each ~16× smaller
    * than raw) plus `shortlist` raw vectors — the full production ANN read
    * path. `assigned` is the (vec_id, centroid_id) table from
    * [[Similarity.assignToCentroids]], persisted alongside the codes. */
  def ivfPqTopK(emb: DataFrame, centroids: DataFrame, assigned: DataFrame,
      codes: DataFrame, model: Model, queryId: Long, k: Int,
      nprobe: Int = 2, shortlist: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      query: Option[(Seq[Double], Double)] = None): DataFrame = {
    val (q, qNorm) = query.getOrElse(queryVector(emb, queryId, idCol, vecCol))
    val probed = centroids
      .withColumn("score", cosine(col("centroid").cast("array<double>"), typedLit(q)))
      .orderBy(desc("score"), col("centroid_id"))
      .limit(nprobe)
      .select("centroid_id")
    val probedCodes = codes
      .join(assigned.select(col("vec_id"), col("centroid_id")), "vec_id")
      .join(broadcast(probed), "centroid_id")
      .filter(col("vec_id") =!= queryId)
    shortlistAndRerank(emb, probedCodes, model, q, qNorm, k, shortlist, idCol, vecCol)
  }

  /** The (bounded) query-side metadata: raw vector + norm. In production
    * the query vector ARRIVES with the request; looking it up by id here
    * is a one-row convenience job, so fixture-known queries pass `query`
    * explicitly to keep driver actions out of the timed read path. */
  def queryVector(emb: DataFrame, queryId: Long,
      idCol: String = "vec_id", vecCol: String = "embedding"): (Seq[Double], Double) = {
    val vec = col(vecCol).cast("array<double>")
    val qRow: Row = emb.filter(col(idCol) === queryId).select(vec.as("q")).head()
    val q: Seq[Double] = qRow.getSeq[Double](0).toSeq
    (q, math.sqrt(q.map(x => x * x).sum))
  }

  /** lut[s*k + c] = dot(q_s, codebook[s][c]) — m×k doubles, driver-built. */
  private def lutFor(q: Seq[Double], model: Model): IndexedSeq[Double] =
    (0 until model.m).flatMap { s =>
      (0 until model.k).map { c =>
        val off = (s * model.k + c) * model.subDim
        var acc = 0.0
        var j = 0
        while (j < model.subDim) {
          acc += q(s * model.subDim + j) * model.codebooks(off + j)
          j += 1
        }
        acc
      }
    }.toIndexedSeq

  /** ADC-score `codes` against the query LUT, keep a shortlist (TakeOrdered
    * — no full sort), re-rank those ids exactly against the raw vectors. */
  private[sim] def shortlistAndRerank(emb: DataFrame, codes: DataFrame, model: Model,
      q: Seq[Double], qNorm: Double, k: Int, shortlist: Int,
      idCol: String, vecCol: String): DataFrame = {
    val lut = lutFor(q, model)
    val short = codes
      .select(col("vec_id"),
        (VectorExpressions.pqAdcScore(col("codes"), lut, model.k)
          / (col("norm") * qNorm)).as("adc"))
      .orderBy(desc("adc"), col("vec_id"))
      .limit(shortlist)
    val v = emb.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("vec"))
    short.join(v, "vec_id")
      .withColumn("score", cosine(col("vec"), typedLit(q)))
      .select("vec_id", "score")
      .orderBy(desc("score"), col("vec_id"))
      .limit(k)
  }
}
