package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup.{cosine, dot}

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Beyond-reference surface (builder prompt): ANN retrieval a training-data
  * pipeline needs — brute-force cosine top-k as the exact baseline, and a
  * sign-LSH bucketed variant as the scale path (probe only buckets near the
  * query instead of scanning all 100 TB of vectors).
  *
  * All arithmetic is `zip_with` product + sequential `aggregate` sum over
  * doubles — bit-deterministic, codegen-friendly, no UDFs.
  */
object Similarity {

  /** Exact top-k by cosine against the vector of `queryId`. The query row
    * is a broadcast nested-loop join of a 1-row side — no collect, no
    * driver round-trip; the scan side streams once. Tie-break on id keeps
    * the selected set engine-independent. */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>").as("q_vec"))
    emb.filter(col(idCol) =!= queryId)
      .select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("vec"))
      .crossJoin(broadcast(q))
      .withColumn("score", cosine(col("vec"), col("q_vec")))
      .select("vec_id", "score")
      .orderBy(desc("score"), col("vec_id"))
      .limit(k)
  }

  /** Banded multi-probe sign-LSH top-k: candidates are vectors whose bucket
    * code, in ANY of the `bands` independent bands, lies within `maxHamming`
    * bits of the query's code for that band; exact-rank the candidates.
    * Recall compounds across bands (1−(1−P)^b with P the per-band probe hit
    * rate), so even weakly-similar true neighbors survive — the single-code
    * construction this replaces probed one 12-bit ball and missed the whole
    * exact top-10 on the driver corpus. At scale the per-band bucket columns
    * are precomputed and partitioned on, and the probe set is an explicit
    * bucket-id list (band, code±maxHamming flips) — a query touches a few
    * partitions per band instead of the full corpus. */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int, bands: Int = 16,
      planesPerBand: Int = 8, maxHamming: Int = 2, dim: Int = 64, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val banded = withLshBands(emb, bands, planesPerBand, dim, seed, idCol, vecCol)
    val q = banded.filter(col("vec_id") === queryId)
      .select(col("band").as("q_band"), col("bucket").as("q_bucket"))
    val candIds = banded.filter(col("vec_id") =!= queryId)
      .join(broadcast(q),
        col("band") === col("q_band") &&
          bit_count(col("bucket").bitwiseXOR(col("q_bucket"))) <= maxHamming,
        "left_semi")
      .select("vec_id").distinct()
    val v = emb.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("vec"))
    val qv = v.filter(col("vec_id") === queryId).select(col("vec").as("q_vec"))
    candIds.join(v, "vec_id")
      .crossJoin(broadcast(qv))
      .withColumn("score", cosine(col("vec"), col("q_vec")))
      .select("vec_id", "score")
      .orderBy(desc("score"), col("vec_id"))
      .limit(k)
  }

  /** Deterministic Rademacher hyperplanes (seeded; stable across runs). */
  private def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** Probability that one hyperplane puts a pair at cosine `c` on the same
    * side: 1 − θ/π. */
  def planeAgreement(cosine: Double): Double =
    1.0 - math.acos(math.max(-1.0, math.min(1.0, cosine))) / math.Pi

  /** Recall of the banded construction for a pair at cosine `c`:
    * per band P = Σ_{h≤multiProbe} C(r,h)·(1−p)^h·p^(r−h), overall
    * 1 − (1−P)^bands. */
  def bandedRecall(cosine: Double, bands: Int, planesPerBand: Int,
      multiProbe: Int = 1): Double = {
    val p = planeAgreement(cosine)
    def choose(n: Int, h: Int): Double =
      (0 until h).map(i => (n - i).toDouble / (i + 1)).product
    val perBand = (0 to multiProbe).map(h =>
      choose(planesPerBand, h) * math.pow(1 - p, h) * math.pow(p, planesPerBand - h)).sum
    1.0 - math.pow(1.0 - perBand, bands)
  }

  /** Choose (bands, planesPerBand) for a target recall at a similarity
    * threshold, sized to the corpus (ROADMAP: adaptive LSH parameters).
    * planesPerBand sets bucket granularity — 2^r buckets per band should
    * keep expected bucket occupancy near `targetBucketSize` so per-bucket
    * quadratic work stays bounded as N grows; bands then grows until the
    * recall formula clears the target. (The driver queries pin 16×8 — a
    * little finer-bucketed than this returns for the tiny test corpus,
    * same recall class; at 10^9 vectors this returns r ≈ 26, which is the
    * point: parameters must track N.) */
  def lshParams(cosineThreshold: Double, targetRecall: Double, corpusSize: Long,
      multiProbe: Int = 1, targetBucketSize: Int = 16, maxBands: Int = 1024): (Int, Int) = {
    require(targetRecall > 0 && targetRecall < 1, "targetRecall must be in (0,1)")
    val r = math.max(4, math.ceil(
      math.log(math.max(2.0, corpusSize.toDouble / targetBucketSize)) / math.log(2)).toInt)
    var bands = 1
    while (bands < maxBands &&
      bandedRecall(cosineThreshold, bands, r, multiProbe) < targetRecall) bands += 1
    (bands, r)
  }

  /** [[lshParams]] fed from table statistics (ROADMAP round-3 #2): the
    * corpus size comes from the versioned table's parquet-footer row count
    * — driver-side metadata, no scan — so LSH geometry tracks the table as
    * it grows without anyone re-tuning constants. */
  def lshParamsForTable(table: graft.table.GraftTable, cosineThreshold: Double,
      targetRecall: Double, multiProbe: Int = 1): (Int, Int) =
    lshParams(cosineThreshold, targetRecall, math.max(1L, table.rowCount), multiProbe)

  /** Banded sign-LSH: `bands` independent groups of `planesPerBand`
    * hyperplanes, one `planesPerBand`-bit bucket id per band — the MinHash
    * banding construction transplanted to cosine space. A pair is a
    * candidate if it collides in ANY band, so recall compounds across bands
    * (1-(1-p^r)^b) instead of decaying with a single wide code; bucket
    * granularity within each band stays 2^planesPerBand, which is what
    * bounds per-bucket candidate blowup at corpus scale. Output: one row
    * per (vector, band) — (vec_id, band, bucket).
    *
    * All bands are computed by ONE native expression
    * ([[org.apache.spark.sql.graftnative.SignProjectionBuckets]]) over a
    * constant plane matrix — per-plane `DotProduct(typedLit)` nodes at
    * 128 planes overwhelmed codegen and cost seconds per scan. */
  def withLshBands(emb: DataFrame, bands: Int, planesPerBand: Int, dim: Int,
      seed: Long, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Independent planes per band: distinct derived seeds, flattened
    // band-major into one matrix.
    val planesFlat: IndexedSeq[Double] = (0 until bands).flatMap { band =>
      hyperplanes(planesPerBand, dim, seed + 7919L * (band + 1)).flatten
    }.toIndexedSeq
    val vec = col(vecCol).cast("array<double>")
    emb.select(col(idCol).as("vec_id"),
      posexplode(org.apache.spark.sql.graftnative.VectorExpressions
        .signProjectionBuckets(vec, planesFlat, bands, planesPerBand))
        .as(Seq("band", "bucket")))
  }

  /** Deterministic k-means training of IVF centroids: seeded initialization
    * from existing vectors, then `iters` rounds of assign (broadcast
    * centroids) + element-wise mean per cluster. Each iteration is one
    * shuffle of (vec, centroid) plus a tiny aggregate — linear in data,
    * independent of k beyond the broadcast.
    *
    * The k×dim centroid table is COLLECTED to the driver after every
    * iteration and re-emitted as a local relation: that severs the
    * iterative lineage (the earlier plan-growing formulation re-executed
    * iterations 0..i-1 inside iteration i — exponential at scale) and makes
    * the next assign's broadcast a no-op-cheap local table. k×dim doubles
    * is kilobytes; this is the one collect in the ANN path and it is
    * size-bounded by construction.
    *
    * Training is SAMPLE-BASED past `trainCap` vectors (the standard
    * coarse-quantizer practice: k-means needs a few hundred points per
    * centroid, not the corpus — at 100 TB nobody iterates k-means over
    * every vector). The sample is the `trainCap` smallest-murmur vec_ids:
    * deterministic, uniform over the id space, and a SUPERSET of the
    * seeded init (the k smallest), cached for the iteration loop. Corpora
    * at or under the cap train on everything, exactly as before; the
    * full-corpus ASSIGNMENT (the one per-row pass) happens at the caller,
    * once, against the final centroids. */
  def trainCentroids(emb: DataFrame, k: Int, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainCap: Int = 65536): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val v0 = emb.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("vec"))
    val v = v0.withColumn("__h", hash(col("vec_id")))
      .orderBy(col("__h"), col("vec_id")).limit(trainCap)
      .drop("__h")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // Seeded init: the k vectors with smallest murmur(vec_id) — spread
    // pseudo-randomly but reproducibly, no driver-side randomness.
    var centroids = v
      .withColumn("__h", hash(col("vec_id")))
      .orderBy("__h").limit(k)
      .withColumn("centroid_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("__h")).cast("long") - 1)
      .select(col("centroid_id"), col("vec").as("centroid"))
    (0 until iters).foreach { _ =>
      val assigned = assignToCentroids(v, centroids,
        vecCol = "vec", centroidIdCol = "centroid_id", centroidVecCol = "centroid")
        .join(v, "vec_id")
      // element-wise mean: explode positions, average, rebuild ordered array
      val updated = assigned
        .select(col("centroid_id"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy("centroid_id", "pos").agg(avg("x").as("m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("centroid_id"),
          expr("transform(pm, p -> p.m)").as("centroid"))
      val local = updated.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
        .toSeq
      centroids = local.toDF("centroid_id", "centroid")
    }
    centroids
    } finally v.unpersist()
  }

  /** IVF top-k: probe only the `nprobe` clusters nearest the query vector,
    * exact-rank within them. With the corpus partitioned by centroid_id on
    * disk, a query touches nprobe partitions instead of everything — the
    * inverted-file ANN scale path. Pass `assigned` (the persisted
    * (vec_id, centroid_id) table from [[assignToCentroids]]) to reuse a
    * prebuilt index instead of re-deriving the assignment per query —
    * that's what a real inverted file is. */
  def ivfTopK(emb: DataFrame, centroids: DataFrame, queryId: Long, k: Int,
      nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      assigned: Option[DataFrame] = None): DataFrame = {
    val assignment = assigned.getOrElse(assignToCentroids(emb, centroids,
      idCol = idCol, vecCol = vecCol,
      centroidIdCol = "centroid_id", centroidVecCol = "centroid"))
    val withVec = assignment.select("vec_id", "centroid_id")
      .join(emb.select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("vec")), "vec_id")
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>").as("q_vec"))
    val probed = centroids.crossJoin(broadcast(q))
      .withColumn("score", cosine(col("centroid").cast("array<double>"), col("q_vec")))
      .orderBy(desc("score"), col("centroid_id"))
      .limit(nprobe)
      .select("centroid_id")
    withVec.join(broadcast(probed), "centroid_id")
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("score", cosine(col("vec"), col("q_vec")))
      .select("vec_id", "score")
      .orderBy(desc("score"), col("vec_id"))
      .limit(k)
  }

  /** Pairwise centroid assignment (IVF-style coarse quantizer): assign each
    * vector to the nearest of `centroids` (broadcast small side); at scale
    * this is the partitioning key that turns ANN into per-partition search. */
  def assignToCentroids(emb: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroidIdCol: String = "centroid_id", centroidVecCol: String = "centroid"): DataFrame = {
    val v = emb.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("vec"))
    val c = centroids.select(col(centroidIdCol).as("centroid_id"),
      col(centroidVecCol).cast("array<double>").as("c_vec"))
    // argmax as a hash aggregate (max_by over a lexicographic tie-break
    // struct) — no per-partition sort, unlike the window phrasing.
    v.crossJoin(broadcast(c))
      .withColumn("score", cosine(col("vec"), col("c_vec")))
      .groupBy("vec_id")
      .agg(max_by(
        struct(col("centroid_id"), col("score")),
        struct(col("score"), (-col("centroid_id")).as("tie"))).as("best"))
      .select(col("vec_id"), col("best.centroid_id").as("centroid_id"),
        col("best.score").as("centroid_score"))
  }

  /** kNN label purity — the standard embedding-space quality eval: each
    * vector votes its k nearest neighbors' labels (cosine, self excluded);
    * the majority label is the prediction, and per-label accuracy says how
    * well the space separates the classes BEFORE any model is trained on
    * it. Deterministic everywhere: neighbor rank breaks cosine ties on
    * vec_id, the vote breaks count ties on the smaller label
    * (`min(struct(-count, label))` hash-agg, the same winner-pick shape as
    * the scrub/novelty family — no second window sort).
    *
    * Exactness: norms are computed once per vector; dot, sqrt, multiply,
    * divide are the identical IEEE sequence as the DuckDB oracle's
    * `list_inner_product` phrasing (q28/q29's proven contract), so ranks
    * and votes agree bit-for-bit.
    *
    * Scale shape: the eval contract is exact kNN, quadratic by definition —
    * at 100 TB it runs on a stratified eval SAMPLE (q117's sampler), while
    * the same vote over [[ivfTopK]] candidates gives the approximate
    * full-corpus variant; the per-a_id top-k is a bounded heap either way.
    * The output is label-cardinality-sized, never corpus-sized. */
  def knnLabelPurity(emb: DataFrame, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = emb.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("vec"))
      .withColumn("norm", sqrt(dot(col("vec"), col("vec"))))
    val a = v.select(col("vec_id").as("a_id"), col("label").as("a_label"),
      col("vec").as("a_vec"), col("norm").as("a_norm"))
    val b = v.select(col("vec_id").as("b_id"), col("label").as("b_label"),
      col("vec").as("b_vec"), col("norm").as("b_norm"))
    val pairs = a.crossJoin(b).filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("a_label"), col("b_id"), col("b_label"),
        (dot(col("a_vec"), col("b_vec")) / (col("a_norm") * col("b_norm")))
          .as("cosine"))
    val w = Window.partitionBy("a_id").orderBy(col("cosine").desc, col("b_id"))
    val votes = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy("a_id", "a_label", "b_label").agg(count(lit(1)).as("c"))
    val pred = votes.groupBy("a_id", "a_label")
      .agg(min(struct((-col("c")).as("nc"), col("b_label").as("lbl"))).as("m"))
      .select(col("a_id"), col("a_label"), col("m.lbl").as("pred"))
    pred.groupBy(col("a_label").as("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred") === col("a_label"), 1L).otherwise(0L)).as("correct"))
      .select(col("label"), col("n"), col("correct"),
        (col("correct").cast("double") / col("n")).as("accuracy"))
  }

  /** Per-dimension MEAN-CENTERED sign pivots for the banded sign-LSH
    * family (q214/q215). Raw axis-aligned signs (`x_d >= 0`) degenerate
    * on non-centered embeddings: encoder families that emit all-positive
    * coordinates put EVERY vector in bucket 2^bits−1 of every band, and
    * the "bounded fan-out" equi-join silently becomes the full quadratic
    * pair space. Centering by the per-dimension corpus mean restores
    * ~50/50 bit balance for any coordinate distribution.
    *
    * Exactness contract: the pivot test must reproduce bit-for-bit in
    * the DuckDB oracle, and a floating-point mean does not (summation
    * order). So the test is pure integer arithmetic in the repo's
    * fixed-point idiom: with q_d(x) = floor(x_d·1e6) as BIGINT,
    * s_d = Σ_corpus q_d and n = |corpus|,
    *
    *   bit_d(x) = q_d(x) · n >= s_d      (⇔ q_d(x) >= mean(q_d))
    *
    * — order-independent, overflow-safe (|q_d| ≤ ~2²⁴ for unit-scale
    * embeddings, so q_d·n stays in BIGINT to n ~ 10¹¹ rows), and
    * identical on both engines. The (s_d, n) row is one tiny aggregate
    * (≤ maxDim+1 longs — codebook-class) collected and inlined as
    * literals so the candidate joins stay pure equi-joins: a 1-row
    * crossJoin would plan a BroadcastNestedLoopJoin, which the q214 spec
    * forbids in this plan. */
  private def signPivots(v: DataFrame, maxDim: Int): (Array[Long], Long) = {
    val aggs = (0 until maxDim).map(d =>
      sum(floor(col("vec").getItem(d) * lit(1000000.0d))).as(s"s$d")) :+
      count(lit(1)).as("n")
    val row = v.agg(aggs.head, aggs.tail: _*).collect().head
    (Array.tabulate(maxDim)(d => row.getLong(d)), row.getLong(maxDim))
  }

  /** One band's centered sign signature over `bits` consecutive dims. */
  private def centeredSig(j: Int, bits: Int, piv: Array[Long], n: Long): Column =
    (0 until bits).map { i =>
      val d = j * bits + i
      when(floor(col("vec").getItem(d) * lit(1000000.0d)) * lit(n) >= lit(piv(d)),
        lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** [[knnLabelPurity]]'s 100 TB shape, EXECUTABLE (not just documented):
    * the same majority vote, but (a) queries are a deterministic 1-in-
    * `sampleMod` eval sample (`vec_id % sampleMod == 0` — the production
    * pipeline swaps in q117's hash-stratified sampler, identical shape),
    * and (b) neighbor candidates come from a banded sign-LSH EQUI-JOIN,
    * never a cross join: each of `bands` bands hashes `bits` consecutive
    * embedding dimensions to their MEAN-CENTERED sign pattern (see
    * [[signPivots]] — raw signs degenerate on all-positive embeddings),
    * candidates are pairs sharing ANY band's pattern, deduped, then
    * exact-ranked by cosine. Every join is a hash/sort-merge join on the
    * band signature or on vec_id — the plan contains NO CartesianProduct
    * and NO BroadcastNestedLoopJoin (spec-asserted), so the shape
    * survives a corpus that no longer fits a quadratic pair space:
    * per-band bucket sizes bound the candidate fan-out exactly as in the
    * minhash-LSH dedup family.
    *
    * Deterministic end-to-end — the sample rule, the integer sign
    * signatures (fixed-point pivots, integer compare), cosine (q28/q29's
    * IEEE contract), the rank tie-break (cosine desc, b_id) and the vote
    * tie-break (smaller label) all reproduce bit-for-bit in the DuckDB
    * oracle. The reported purity is the purity *within the LSH candidate
    * set*: the eval contract a production ANN-backed eval actually
    * runs. */
  def knnLabelPuritySampled(emb: DataFrame, k: Int = 10,
      sampleMod: Long = 4, bands: Int = 4, bits: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = emb.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("vec"))
      .withColumn("norm", sqrt(dot(col("vec"), col("vec"))))
    val (piv, n) = signPivots(v, bands * bits)
    def sig(j: Int): Column = centeredSig(j, bits, piv, n)
    val signed = v.select(Seq(col("vec_id"), col("label"), col("vec"),
      col("norm")) ++ (0 until bands).map(j => sig(j).as(s"sig$j")): _*)
    val a = signed.filter(col("vec_id") % sampleMod === 0).select(
      Seq(col("vec_id").as("a_id"), col("label").as("a_label"),
        col("vec").as("a_vec"), col("norm").as("a_norm")) ++
        (0 until bands).map(j => col(s"sig$j").as(s"a_sig$j")): _*)
    val b = signed.select(
      Seq(col("vec_id").as("b_id"), col("label").as("b_label"),
        col("vec").as("b_vec"), col("norm").as("b_norm")) ++
        (0 until bands).map(j => col(s"sig$j").as(s"b_sig$j")): _*)
    // Candidate pairs: both sides explode to (id, band, sig) rows and ONE
    // composite-key equi-join + pair distinct replaces the per-band
    // join/union/dedup chain (the q215 collapse, optimization round 12) —
    // the shuffle key domain (bands × 2^bits values) is the union of the
    // per-band domains, so per-key fan-out stays bounded exactly as
    // before and the plan still contains no CartesianProduct.
    def bandRows(df: DataFrame, idFrom: String, idAs: String): DataFrame =
      df.select(col(idFrom).as(idAs), explode(array((0 until bands).map(j =>
        struct(lit(j).as("band"), col(s"${idFrom.take(1)}_sig$j").as("sg"))): _*))
        .as("x"))
        .select(col(idAs), col("x.band").as("band"), col("x.sg").as("sg"))
    val cand = bandRows(a, "a_id", "a_id")
      .join(bandRows(b, "b_id", "b_id"), Seq("band", "sg"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val pairs = cand
      .join(a.select(col("a_id"), col("a_label"), col("a_vec"),
        col("a_norm")), Seq("a_id"))
      .join(b.select(col("b_id"), col("b_label"), col("b_vec"),
        col("b_norm")), Seq("b_id"))
      .select(col("a_id"), col("a_label"), col("b_id"), col("b_label"),
        (dot(col("a_vec"), col("b_vec")) / (col("a_norm") * col("b_norm")))
          .as("cosine"))
    val w = Window.partitionBy("a_id").orderBy(col("cosine").desc, col("b_id"))
    val votes = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy("a_id", "a_label", "b_label").agg(count(lit(1)).as("c"))
    val pred = votes.groupBy("a_id", "a_label")
      .agg(min(struct((-col("c")).as("nc"), col("b_label").as("lbl"))).as("m"))
      .select(col("a_id"), col("a_label"), col("m.lbl").as("pred"))
    pred.groupBy(col("a_label").as("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred") === col("a_label"), 1L).otherwise(0L)).as("correct"))
      .select(col("label"), col("n"), col("correct"),
        (col("correct").cast("double") / col("n")).as("accuracy"))
  }

  /** Candidate recall of [[knnLabelPuritySampled]]'s banded sign-LSH vs
    * the EXACT neighbor ranks — the measurement that makes the q214 eval
    * harness honest (q202 set the precedent for IVF): an ANN-backed eval
    * whose approximation error is unquantified can silently mislead.
    * For the same deterministic 1-in-`sampleMod` query sample, the exact
    * top-`k` neighbor pairs (cosine desc, b_id tiebreak — the q157
    * arithmetic) are computed ONCE, then each (bands, bits) config's
    * candidate set marks which exact pairs it would have surfaced;
    * recall@k = covered / exact pairs, per config.
    *
    * Plan shape: ONE exact ranking pass (sample × corpus — the bounded
    * eval-contract baseline, the quadratic side shrunk by the sample),
    * then one flag join per bits-FAMILY on the (a_id, b_id) pair key:
    * configs sharing a bits width nest (band j is the same signature for
    * every band count), so each family runs its band joins ONCE at the
    * family's largest band count, aggregates each pair's smallest
    * matching band index, and every member config's hit flag is just
    * `min_band < its band count` — the exact branch evaluates once,
    * never per config, and the per-query tally frame it collapses to
    * (one row per sampled query) carries its min/p10 derivations as
    * in-plan window ranks, so the whole report is ONE aggregate job plus
    * the fan-out pass. Executor→driver payload stays a handful of
    * scalars per config. Every figure is integer counts plus one final
    * IEEE divide, so the DuckDB oracle agrees bit-for-bit.
    *
    * Three columns exist purely for honesty-at-scale:
    *  - `candidates` — the total band-join fan-out (pre-dedup pair count,
    *    self-matches excluded), computed from per-bucket counts WITHOUT
    *    materializing pairs (Σ_bands Σ_buckets qc·(ac−1)). A degenerate
    *    signature (every vector in one bucket) is invisible in recall —
    *    recall reads 1.0 — but explodes this number to ~sample×corpus.
    *  - `min_recall` / `p10_recall` — per-query recall floor and 10th
    *    percentile (rank ⌈n_q/10⌉ of the ascending per-query recalls):
    *    pooled recall hides tail starvation, a handful of queries with
    *    zero candidates in every band vanish into the average. */
  /** q215's candidate stage: per-family smallest-matching-band-index per
    * candidate pair (`mbs`), plus the exploded (id, bits, band, sg)
    * signature frame the fan-out pass reuses (`allE`).
    *
    * Configs sharing a bits width NEST: band j of (2,4) is band j of
    * (8,4) (centeredSig depends only on (j, bits)), so candidates(b,4)
    * = {pairs whose smallest matching band index < b}. And the families
    * themselves collapse further (optimization round 12, second step):
    * every (bits, band) leg is the SAME equi-join modulo its key, so
    * both sides explode their signatures to (id, bits, band, sg) rows
    * and ONE composite-key join replaces the per-leg joins — for the
    * default sweep that is 1 join + 1 pair aggregate + 1 flag join
    * where the family phrasing ran 16 band joins + 2 pair aggregates +
    * 2 flag joins (4.93 → 2.22 s at sf0.1 fresh-JVM min-of-5; the
    * per-config phrasing before it ran 22 joins + 4 distincts + 4 flag
    * joins). Per-family min-band falls out of the one aggregate as
    * conditional mins; the key domain (Σ 2^bits per band: 2,176 keys
    * for the default sweep) is a superset union of the per-leg domains,
    * so the fan-out per key only shrinks. Exposed package-private so
    * PlanProbe/specs can pin the one-join plan shape (the outer q215
    * frame is a collected local result). */
  private[graft] def lshCandidateStage(v: DataFrame, sampleMod: Long,
      configs: Seq[(Int, Int)]): (DataFrame, DataFrame) = {
    val maxDim = configs.map { case (bands, bits) => bands * bits }.max
    val (piv, n) = signPivots(v, maxDim)
    def sig(j: Int, bits: Int): Column = centeredSig(j, bits, piv, n)
    val families: Seq[(Int, Int)] = configs.groupBy(_._2).toSeq
      .map { case (bits, cfgs) => (bits, cfgs.map(_._1).max) }
      .sortBy(_._1)
    // Size-gated staging (the shared dedup gate): both join sides and
    // the fan-out pass read this projection — 3 legs, each its own scan
    // of the embedding table plus a sign-projection recompute. Below the
    // gate (bench scale) the legs are cheap column-pruned scans of a
    // small parquet and one DAG; at corpus scale ONE staged pass feeds
    // all three.
    val wide = graft.dedup.Dedup.stageIfLarge(
      v.select(col("vec_id") +: families.flatMap { case (bits, maxBands) =>
        (0 until maxBands).map(j => sig(j, bits).as(s"s_${bits}_$j"))
      }: _*), "lsh-signed")
    def explodedSigs(df: DataFrame, idAs: String): DataFrame =
      df.select(col("vec_id").as(idAs), explode(array(families.flatMap {
        case (bits, maxBands) => (0 until maxBands).map(j =>
          struct(lit(bits).as("bits"), lit(j).as("band"),
            col(s"s_${bits}_$j").as("sg")))
      }: _*)).as("x"))
        .select(col(idAs), col("x.bits").as("bits"), col("x.band").as("band"),
          col("x.sg").as("sg"))
    val allE = explodedSigs(wide, "b_id")
    val mbAggs = families.map { case (bits, _) =>
      min(when(col("bits") === bits, col("band"))).as(s"mb$bits") }
    val mbs = explodedSigs(wide.filter(col("vec_id") % sampleMod === 0), "a_id")
      .join(allE, Seq("bits", "band", "sg"))
      .filter(col("a_id") =!= col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(mbAggs.head, mbAggs.tail: _*)
    (mbs, allE)
  }

  /** q215's candidate stage at the production configs over the given data
    * dir — the PlanProbe surface for committing plan evidence. */
  private[graft] def lshCandidateStageFor(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    lshCandidateStage(
      graft.Tables.embeddings(spark, dir).select(col("vec_id"),
        col("embedding").cast("array<double>").as("vec")),
      4, Seq((2, 4), (4, 4), (8, 4), (8, 8)))._1

  def lshRecallSweep(emb: DataFrame, k: Int = 10, sampleMod: Long = 4,
      configs: Seq[(Int, Int)] = Seq((2, 4), (4, 4), (8, 4), (8, 8)))
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = emb.sparkSession
    val v = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("vec"))
      .withColumn("norm", sqrt(dot(col("vec"), col("vec"))))
    val a = v.filter(col("vec_id") % sampleMod === 0)
      .select(col("vec_id").as("a_id"), col("vec").as("a_vec"),
        col("norm").as("a_norm"))
    val b = v.select(col("vec_id").as("b_id"), col("vec").as("b_vec"),
      col("norm").as("b_norm"))
    val w = Window.partitionBy("a_id").orderBy(col("cosine").desc, col("b_id"))
    val exact = a.crossJoin(b).filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        (dot(col("a_vec"), col("b_vec")) / (col("a_norm") * col("b_norm")))
          .as("cosine"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("a_id"), col("b_id"))

    val (mbs, allE) = lshCandidateStage(v, sampleMod, configs)
    val flagged = exact.join(mbs, Seq("a_id", "b_id"), "left")
    // Per-query tallies (one row per sampled query), then EVERYTHING —
    // pooled counts, per-config min, and the ⌈n_q/10⌉-th smallest
    // per-query recall — in ONE job: per-config ascending ranks and the
    // sample size ride in-plan windows, the final aggregate picks the
    // rank-matching value. The rank windows are global (single
    // partition), bounded by the same eval contract that makes the
    // exact baseline feasible: the tally frame is one narrow row per
    // sampled query. (An earlier shape ran one TakeOrdered job per
    // config plus a separate min aggregate — 5 extra job launches whose
    // scheduling+codegen overhead tripled the query's wall at bench
    // scale for zero added information.)
    // A config's hit flag = "smallest matching band index < its band
    // count" (null mb → no band matched → otherwise(0)).
    val pqAggs = count(lit(1)).as("ex_a") +:
      configs.zipWithIndex.map { case ((bands, bits), i) =>
        sum(when(col(s"mb$bits") < bands, 1L).otherwise(0L)).as(s"h$i") }
    val perQ = flagged.groupBy("a_id").agg(pqAggs.head, pqAggs.tail: _*)
    val wAll = Window.partitionBy()
    val ranked = perQ.select(
      Seq(col("ex_a"), count(lit(1)).over(wAll).as("nq")) ++
        configs.indices.flatMap { i =>
          val r = col(s"h$i").cast("double") / col("ex_a")
          Seq(col(s"h$i"), r.as(s"r$i"),
            row_number().over(Window.orderBy(r.asc_nulls_last)).as(s"rn$i"))
        }: _*)
    val topAggs = Seq(count(lit(1)).as("n_queries"),
      sum(col("ex_a")).as("exact_pairs")) ++
      configs.indices.flatMap(i => Seq(
        sum(col(s"h$i")).as(s"hits$i"),
        min(col(s"r$i")).as(s"min$i"),
        max(when(col(s"rn$i") === expr("(nq + 9) div 10"), col(s"r$i")))
          .as(s"p10$i")))
    val row = ranked.agg(topAggs.head, topAggs.tail: _*).collect().head
    val nQ = row.getLong(0)
    val nExact = row.getLong(1)
    // Candidate fan-out per config from bucket counts alone — one corpus
    // pass for ALL configs, sharing bands the family way: the SAME
    // exploded (id, bits, band, sg) frame the candidate join consumes —
    // 16 structs for the default sweep, not 22 — grouped on the bounded
    // (bits, band, sig) domain, and each config's fan-out is the
    // driver-side sum of its own bands' per-band totals (a dozen longs;
    // identical value to the per-config grouping, since the config sum
    // distributes over its bands).
    val fanBands = allE
      .groupBy(col("bits"), col("band"), col("sg"))
      .agg(sum(when(col("b_id") % sampleMod === 0, 1L).otherwise(0L)).as("qc"),
        count(lit(1)).as("ac"))
      .groupBy("bits", "band")
      .agg(sum(col("qc") * (col("ac") - lit(1L))).as("cands"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val fan = configs.zipWithIndex.map { case ((bands, bits), i) =>
      i -> (0 until bands).map(j => fanBands.getOrElse((bits, j), 0L)).sum
    }.toMap
    import spark.implicits._
    configs.zipWithIndex.map { case ((bands, bits), i) =>
      val hits = row.getLong(2 + 3 * i)
      val minR = row.getDouble(3 + 3 * i)
      val p10R = row.getDouble(4 + 3 * i)
      (bands, bits, nQ, nExact, hits, fan.getOrElse(i, 0L),
        hits.toDouble / nExact, minR, p10R)
    }.toDF("bands", "bits", "n_queries", "exact_pairs", "hits",
      "candidates", "recall_at_k", "min_recall", "p10_recall")
      .orderBy(col("bands"), col("bits"))
  }
}
